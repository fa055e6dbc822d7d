import sys, time
sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])
import numpy as np, jax, jax.numpy as jnp
import tpu_huffman as th
from tpu_huffman import oracle
from tpu_huffman.ops import selfsync as ss
from tpu_huffman.ops.bitpack import words_from_bytes_np
from tpu_huffman.ops.pallas_decode import decode_dispatch
from functools import partial

table = th.load_static_test_table()
rng = np.random.default_rng(2024)
N = 8 * 1024 * 1024
data = rng.integers(0, 256, size=N, dtype=np.uint8).tobytes()
enc = oracle.OracleEncoder(oracle.OracleTable(table)).encode(data)
total_bits = len(enc) * 8
S, G, Bp, seg_bits, need_words = ss._plan_segments(total_bits, ss.SEG_WORDS)
words_np, _ = words_from_bytes_np(enc)
padded = np.zeros(need_words, np.uint32)
padded[: min(words_np.size, need_words)] = words_np[:need_words]
jw = jnp.asarray(padded)
intervals, aux = decode_dispatch(table)
min_len = max(int(table.min_len), 1)
max_syms = -(-((seg_bits + table.max_len) // min_len + 1) // 4) * 4
S_dl = min(Bp, max(16, 1 << (S - 1).bit_length()))
lengths = jnp.asarray(table.lengths.astype(np.int32))

def fold(x):
    if x.dtype == jnp.bool_: x = x.astype(jnp.uint32)
    return x.astype(jnp.uint32).sum(dtype=jnp.uint32) if x.ndim else x.astype(jnp.uint32)

@jax.jit
def kernels_only(jw):
    raw = ss._segments_pipeline_fast(jw, jnp.int32(0), jnp.int32(0),
        need_words=need_words, S=S, G=G, seg_words=ss.SEG_WORDS, S_dl=S_dl,
        max_syms=max_syms, intervals=intervals, aux=aux, interpret=False)
    return sum(fold(r) for r in raw)

@jax.jit
def dense_all(jw):
    body_pad, small, raw = ss._segments_pipeline_dense(jw, jnp.int32(0), jnp.int32(0), lengths,
        need_words=need_words, S=S, G=G, seg_words=ss.SEG_WORDS, S_dl=S_dl,
        max_syms=max_syms, intervals=intervals, aux=aux, interpret=False)
    return fold(body_pad) + sum(fold(s) for s in small)

for nm, fn in (("kernels", kernels_only), ("dense", dense_all)):
    def body(i, carry, fn=fn):
        return carry ^ fn(jw ^ (carry & 1))
    @partial(jax.jit, static_argnames=("k",))
    def run(seed, k, body=body):
        return jax.lax.fori_loop(0, k, body, seed)
    for k in (2, 6):
        t0=time.perf_counter(); int(run(jnp.uint32(1), k)); print(f"warm {nm}@{k}: {time.perf_counter()-t0:.1f}s", flush=True)
    ts=[]
    for _ in range(5):
        t0 = time.perf_counter(); int(run(jnp.uint32(1), 6)); h = time.perf_counter() - t0
        t0 = time.perf_counter(); int(run(jnp.uint32(1), 2)); l = time.perf_counter() - t0
        ts.append((h-l)/4)
    print(f"{nm}: {min(ts)*1e3:.1f} ms", flush=True)
