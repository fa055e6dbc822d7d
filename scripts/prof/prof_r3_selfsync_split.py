"""Interleaved A/B: (a) pass0-only, (b) pass0+offs, (c) full fast pipeline."""
import sys, time
from functools import partial
sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])
import numpy as np, jax, jax.numpy as jnp
import tpu_huffman as th
import tpu_huffman.ops.selfsync as ss
from tpu_huffman import oracle
from tpu_huffman.ops.bitpack import words_from_bytes_np
from tpu_huffman.ops.pallas_decode import decode_dispatch, LANES

WINDOW = float(sys.argv[1]) if len(sys.argv) > 1 else 45.0
table = th.load_static_test_table()
rng = np.random.default_rng(7)
N = 1 << 20
data = rng.integers(0, 256, size=N, dtype=np.uint8).tobytes()
enc = oracle.OracleEncoder(oracle.OracleTable(table)).encode(data)
total_bits = len(enc) * 8
S, G, Bp, seg_bits, need_words = ss._plan_segments(total_bits, ss.SEG_WORDS)
words_np, _ = words_from_bytes_np(enc)
padded = np.zeros(need_words, np.uint32)
padded[: min(words_np.size, need_words)] = words_np[:need_words]
intervals, aux = decode_dispatch(table)
interp = ss._use_interpret()
max_syms = (seg_bits + table.max_len) // max(int(table.min_len), 1) + 1
max_syms = -(-max_syms // 4) * 4
K4 = -(-max_syms // 4)
S_dl = min(Bp, max(16, 1 << (S - 1).bit_length()))
jw = jnp.asarray(padded)
print(f"S={S} G={G} K4={K4}", flush=True)

@partial(jax.jit, static_argnames=("mode",))
def pipe(buf, mode):
    jwords = buf
    jwin = ss._stage_windows_dev(jwords, Bp, ss.SEG_WORDS)
    eo = mode != "pass0"
    call = ss._make_selfsync_call(intervals, aux, max_syms, G, interp, ss.SEG_WORDS, emit_offs=eo)
    seg_idx = jnp.arange(Bp, dtype=jnp.int32)
    entries0 = jnp.where(seg_idx == 0, 0, 0)
    outs = call(jwin, entries0.reshape(G, 8, 128))
    if mode == "full":
        out0, exits0, bad0, offs0, blast0 = outs
        exits0 = exits0.reshape(-1)
        entries1 = jnp.concatenate([jnp.zeros(1, jnp.int32), exits0[:-1] - ss.SEG_WORDS * 32])
        callA = ss._make_selfsync_call(intervals, aux, ss.PATCH_SYMS, G, interp, ss.SEG_WORDS)
        outA, exitsA, badA = callA(jwin, entries1.reshape(G, 8, 128))
        def rows(out, k4):
            return out.reshape(G, k4, 8, 128).transpose(0, 2, 3, 1).reshape(Bp, k4)
        return (rows(out0, K4)[:S_dl], rows(outA, ss.PATCH_SYMS // 4)[:S_dl],
                rows(offs0, 2 * K4)[:S_dl], exits0[:S_dl], exitsA.reshape(-1)[:S_dl],
                blast0.reshape(-1)[:S_dl], badA.reshape(-1)[:S_dl])
    return tuple(o for o in outs)

def mkbody(mode):
    def body(i, carry):
        outs = pipe(jw ^ carry, mode)
        acc = carry
        for o in outs:
            acc = acc ^ o.astype(jnp.uint32).sum(dtype=jnp.uint32)
        return acc
    return body

modes = ("pass0", "offs", "full")
runs = []
for m in modes:
    @partial(jax.jit, static_argnames=("k",))
    def run(seed, k, body=mkbody(m)):
        return jax.lax.fori_loop(0, k, body, seed)
    runs.append(run)
K_LO, K_HI = 9, 49
for m, run in zip(modes, runs):
    for k in (K_LO, K_HI):
        for attempt in range(4):
            try:
                t0 = time.perf_counter(); int(run(jnp.uint32(1), k))
                print(f"warm {m}@{k}: {time.perf_counter()-t0:.1f}s", flush=True)
                break
            except Exception as e:
                print(f"warm {m}@{k} attempt {attempt}: {type(e).__name__}", flush=True)
                time.sleep(10)
        else:
            raise SystemExit(f"compile failed {m}@{k}")
tl = [float("inf")] * 3; thv = [float("inf")] * 3
t_end = time.perf_counter() + WINDOW
while time.perf_counter() < t_end:
    for i, run in enumerate(runs):
        t0 = time.perf_counter(); int(run(jnp.uint32(1), K_HI)); h = time.perf_counter() - t0
        t0 = time.perf_counter(); int(run(jnp.uint32(1), K_LO)); l = time.perf_counter() - t0
        thv[i] = min(thv[i], h); tl[i] = min(tl[i], l)
for m, h, l in zip(modes, thv, tl):
    us = (h - l) / (K_HI - K_LO) * 1e6
    print(f"{m}: {us:.0f} us/1MiB-plain", flush=True)
