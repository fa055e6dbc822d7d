"""Interleaved dual Kh=128 vs Kh=256."""
import sys, time
from functools import partial
sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])
import numpy as np, jax, jax.numpy as jnp
from tpu_huffman.ops import pallas_decode as pd
import tpu_huffman as th

WINDOW = float(sys.argv[1]) if len(sys.argv) > 1 else 60.0
table = th.load_static_test_table()
N = 8 * 1024 * 1024
rng = np.random.default_rng(2024)
data_np = rng.integers(0, 256, size=N, dtype=np.uint8)
intervals, aux = pd.decode_dispatch(table)
lens64 = table.lengths[data_np].astype(np.int64)
ends = np.cumsum(lens64)
total_words = int(ends[-1] + 31) // 32 + 2
words_np = rng.integers(0, 1 << 32, size=total_words, dtype=np.uint64).astype(np.uint32)
jw = jnp.asarray(words_np)
interp = pd._use_interpret()

def make_run(Kh):
    nb = -(-N // Kh)
    starts_idx = np.arange(nb) * Kh
    offsets = np.zeros(nb, dtype=np.int64)
    offsets[1:] = ends[starts_idx[1:] - 1]
    P = nb // 2
    G = -(-P // pd.LANES); Bp = G * pd.LANES
    base = np.zeros(Bp, np.int32); rel = np.zeros(Bp, np.int32)
    relm = np.zeros(Bp, np.int32); nsym = np.zeros(Bp, np.int32)
    op = offsets[0:2*P:2]; om = offsets[1:2*P:2]
    base[:P] = op >> 5; rel[:P] = op & 31
    relm[:P] = om - ((op >> 5) << 5); nsym[:P] = 2 * Kh
    spans_h = np.diff(offsets, append=np.int64(ends[-1]))
    ends_p = np.concatenate([offsets[1:], [np.int64(ends[-1])]])
    pair_span_max = int((ends_p[1:2*P:2] - offsets[0:2*P:2]).max())
    Wb = min((2*Kh*table.max_len+31)//32+2, -(-((pair_span_max+94)//32+2)//8)*8)
    Wbh = min((Kh*table.max_len+31)//32+2, -(-((int(spans_h.max())+94)//32+2)//8)*8)
    jb, jr, jm, jn = map(jnp.asarray, (base, rel, relm, nsym))
    def body(i, carry):
        w = jw ^ carry
        out, end, _bad = pd._decode_pipeline_dual(w, jb, jr, jm, jn, Kh, Wb, Wbh, G, intervals, aux, interp)
        return carry ^ out.sum(dtype=jnp.uint32) ^ end.sum(dtype=jnp.int32).astype(jnp.uint32)
    @partial(jax.jit, static_argnames=("k",))
    def run(seed, k):
        return jax.lax.fori_loop(0, k, body, seed)
    return run

runs = [("Kh128", make_run(128)), ("Kh256", make_run(256))]
K_LO, K_HI = 9, 49
for nm, run in runs:
    for k in (K_LO, K_HI):
        for attempt in range(4):
            try:
                t0 = time.perf_counter(); int(run(jnp.uint32(1), k))
                print(f"warm {nm}@{k}: {time.perf_counter()-t0:.1f}s", flush=True)
                break
            except Exception as e:
                print(f"retry {type(e).__name__}", flush=True); time.sleep(10)
tl = [float("inf")]*2; thv = [float("inf")]*2
t_end = time.perf_counter() + WINDOW
while time.perf_counter() < t_end:
    for i, (nm, run) in enumerate(runs):
        t0 = time.perf_counter(); int(run(jnp.uint32(1), K_HI)); h = time.perf_counter() - t0
        t0 = time.perf_counter(); int(run(jnp.uint32(1), K_LO)); l = time.perf_counter() - t0
        thv[i] = min(thv[i], h); tl[i] = min(tl[i], l)
for (nm, _), h, l in zip(runs, thv, tl):
    us = (h - l) / (K_HI - K_LO) * 1e6
    print(f"{nm}: {us:.0f} us ({N/(us/1e6)/1e9:.2f} GB/s)", flush=True)
