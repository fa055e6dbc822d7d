import sys, time
from functools import partial
sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])
import numpy as np, jax, jax.numpy as jnp
from tpu_huffman.ops import pallas_encode as pe
import tpu_huffman as th
import bench_suite as bs

WINDOW = float(sys.argv[1]) if len(sys.argv) > 1 else 120.0
table = th.make_canonical(bs.mixed_lengths_5_30(), name="mixed_5_30")
N = 8 * 1024 * 1024
rng = np.random.default_rng(11)
p = 2.0 ** -table.lengths[table.lengths > 0].astype(np.float64)
syms = np.nonzero(table.lengths > 0)[0]
p /= p.sum()
corpus = rng.choice(syms, size=N, p=p).astype(np.uint8).tobytes()
data_np = np.frombuffer(corpus, np.uint8)
symbols = jnp.asarray(data_np)
from tpu_huffman import oracle
from tpu_huffman.ops.bitpack import bytes_from_words_np
want = oracle.OracleEncoder(oracle.OracleTable(table)).encode(corpus)

orig_sub = pe._sub_block
VAR = []
for K in (512, 1024):
    for S in (16, 32):
        VAR.append((f"K{K}/S{S}", K, S))

fns = []
for nm, K, S in VAR:
    pe._sub_block = lambda k, mn, mx, S=S: S if k > 64 else k
    wb = pe.plan_wb_encode(table, data_np, K=K)
    dm = pe.plan_dmin_encode(table, data_np, K=K)
    try:
        enc, fin = pe.encode_step(table, N, 512, K=K, wb_hint=wb, dmin_hint=dm)
        w, tb, pb = fin(symbols)
        got = bytes_from_words_np(np.asarray(w), int(pb)//8)
        assert got == want, f"{nm} mismatch"
        gd, jm = pe.gather_tail_plan(K, 5, 30, min(wb, -(-(K*30)//32)), dm)
        print(f"{nm}: exact; wb={wb} dmin={dm} gather_dmin={gd} jmax={jm}", flush=True)
        fns.append((nm, enc))
    except Exception as e:
        print(f"{nm}: FAILED {type(e).__name__}: {e}", flush=True)
    finally:
        pe._sub_block = orig_sub

runs = []
for nm, fn in fns:
    def body(i, carry, fn=fn):
        words, tbx, _p = fn(symbols ^ carry.astype(jnp.uint8))
        return carry ^ words.sum(dtype=jnp.uint32) ^ tbx.astype(jnp.uint32)
    @partial(jax.jit, static_argnames=("k",))
    def run(seed, k, body=body):
        return jax.lax.fori_loop(0, k, body, seed)
    runs.append(run)
K_LO, K_HI = 9, 49
for (nm, _), run in zip(fns, runs):
    for k in (K_LO, K_HI):
        t0 = time.perf_counter(); int(run(jnp.uint32(1), k))
        print(f"warm {nm}@{k}: {time.perf_counter()-t0:.1f}s", flush=True)
tl = [float("inf")] * len(runs); thv = [float("inf")] * len(runs)
t_end = time.perf_counter() + WINDOW
while time.perf_counter() < t_end:
    for i, run in enumerate(runs):
        t0 = time.perf_counter(); int(run(jnp.uint32(1), K_HI)); h = time.perf_counter() - t0
        t0 = time.perf_counter(); int(run(jnp.uint32(1), K_LO)); l = time.perf_counter() - t0
        thv[i] = min(thv[i], h); tl[i] = min(tl[i], l)
for (nm, _), h, l in zip(fns, thv, tl):
    us = (h - l) / (K_HI - K_LO) * 1e6
    print(f"{nm}: {us:.0f} us ({N/(us/1e6)/1e9:.2f} GB/s)", flush=True)
