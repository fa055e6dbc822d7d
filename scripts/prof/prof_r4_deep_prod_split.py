"""Deep-table (5-30 bit) PRODUCTION encode split: pack kernel vs full.

prof_r4_deep_split.py profiles the old K=512 unhinted plan (14.1 GB/s —
the round-3 shape). The shipped path (best_encode_step with a sample)
plans K=pack_k_fast=1024 with span-adaptive wb/dmin/out hints and the
gather stitch tail; this script splits THAT plan so the residual tail
above the ~300 us lookup-bound kernel is visible.

Usage: python scripts/prof/prof_r4_deep_prod_split.py [window_s]
"""
import sys
import time
from functools import partial

sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tpu_huffman.ops import pallas_encode as pe  # noqa: E402
from tpu_huffman.ops.pallas_encode import LANES, STITCH_SW  # noqa: E402
from tpu_huffman.ops.encode import best_encode_step  # noqa: E402
import tpu_huffman as th  # noqa: E402
import bench_suite as bs  # noqa: E402

WINDOW = float(sys.argv[1]) if len(sys.argv) > 1 else 120.0
table = th.make_canonical(bs.mixed_lengths_5_30(), name="mixed_5_30")
N = 8 * 1024 * 1024
rng = np.random.default_rng(11)
p = 2.0 ** -table.lengths[table.lengths > 0].astype(np.float64)
syms = np.nonzero(table.lengths > 0)[0]
p /= p.sum()
data_np = rng.choice(syms, size=N, p=p).astype(np.uint8)

# Reproduce best_encode_step's sample-driven plan exactly.
sample = data_np
K = None
kf = pe.pack_k_fast(table)
if kf != pe.pack_k(table):
    wb_f = pe.plan_wb_encode(table, sample, K=kf)
    if wb_f <= 512:
        K = kf
K = K or pe.pack_k(table)
wb_hint = pe.plan_wb_encode(table, sample, K=K)
dmin_hint = pe.plan_dmin_encode(table, sample, K=K)
out_hint = pe.plan_out_encode(table, sample, N)
p32t, lent, min_len, max_len, Wb, G, num_out = pe._plan(
    table, N, K, wb_cap=wb_hint, exact_out=True, out_cap_bits=out_hint
)
gdmin, jm = pe.gather_tail_plan(K, min_len, max_len, Wb, dmin_hint)
S = pe._sub_block(K, min_len, max_len)
fuse_sw = STITCH_SW if (128 * K * max_len <= 1 << 24) else 0
print(
    f"K={K} Wb={Wb} G={G} S={S} gdmin={gdmin} jmax={jm} "
    f"num_out={num_out} ({num_out * 4 / 1e6:.1f} MB)",
    flush=True,
)
B = G * LANES
nsym_np = np.zeros(B, np.int32)
nsym_np[: N // K] = K
nsym = jnp.asarray(nsym_np)
symbols = jnp.asarray(data_np)
pad_to = B * K
interp = pe._use_interpret()
# Mirror _encode_pipeline's guard: the gather tail exists only under the
# fused stitch (fuse_sw > 0); otherwise the production plan drops both.
if gdmin and fuse_sw:
    nrows_f = -(-(Wb + fuse_sw) // fuse_sw)
    merge_jmax = (nrows_f - 1) // gdmin
else:
    gdmin = 0
    merge_jmax = 0
call = pe._make_pack_call(
    p32t, lent, K, Wb, G, min_len, max_len, interp, S, fuse_sw,
    merge_jmax=merge_jmax, dmin_rows=gdmin,
)

enc_full, _fin = best_encode_step(table, N, 512, sample=sample)


def stage(sym):
    padded = jnp.pad(sym, (0, pad_to - N))
    syms_u32 = jax.lax.bitcast_convert_type(
        padded.reshape(-1, 4), jnp.uint32
    ).reshape(-1)
    staged = syms_u32.reshape(G, 8, 128, K // 4).transpose(0, 3, 1, 2)
    return call(staged, nsym.reshape(G, 8, 128))


def fold(*xs):
    return sum(x.astype(jnp.uint32).sum(dtype=jnp.uint32) for x in xs)


VAR = [
    ("kernel", lambda s: fold(*stage(s))),
    (
        "full",
        lambda s: (lambda w, tb, pb: fold(w) ^ tb.astype(jnp.uint32))(
            *enc_full(s)
        ),
    ),
]
runs = []
for nm, fn in VAR:
    def body(i, carry, fn=fn):
        return carry ^ fn(symbols ^ carry.astype(jnp.uint8))

    @partial(jax.jit, static_argnames=("k",))
    def run(seed, k, body=body):
        return jax.lax.fori_loop(0, k, body, seed)

    runs.append(run)
K_LO, K_HI = 9, 49
for (nm, _), run in zip(VAR, runs):
    for k in (K_LO, K_HI):
        t0 = time.perf_counter()
        int(run(jnp.uint32(1), k))
        print(f"warm {nm}@{k}: {time.perf_counter() - t0:.1f}s", flush=True)
tl = [float("inf")] * len(runs)
thv = [float("inf")] * len(runs)
t_end = time.perf_counter() + WINDOW
while time.perf_counter() < t_end:
    for i, run in enumerate(runs):
        t0 = time.perf_counter()
        int(run(jnp.uint32(1), K_HI))
        h = time.perf_counter() - t0
        t0 = time.perf_counter()
        int(run(jnp.uint32(1), K_LO))
        l = time.perf_counter() - t0
        thv[i] = min(thv[i], h)
        tl[i] = min(tl[i], l)
for (nm, _), h, l in zip(VAR, thv, tl):
    us = (h - l) / (K_HI - K_LO) * 1e6
    print(f"{nm}: {us:.0f} us ({N / (us / 1e6) / 1e9:.2f} GB/s)", flush=True)
