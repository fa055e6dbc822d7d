"""Round-3 decode stage split under the paired-slope loop protocol.

Measures, at production parameters (K=512, STAGE_RW=128, plan_wb window),
the cumulative cost of: row-take only | take+transpose (full staging) |
full pipeline. Interleaved reps per MEASURING.md §1 rule 4.

Usage: python prof_r3_decode_stages.py [window_seconds]
"""
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

import tpu_huffman as th
from tpu_huffman.ops import pallas_decode as pd
from tpu_huffman.ops.bitpack import words_from_bytes_np
from tpu_huffman.ops.decode import BlockIndex

WINDOW_S = float(sys.argv[1]) if len(sys.argv) > 1 else 60.0
table = th.load_static_test_table()
N = 8 * 1024 * 1024
K = 512
rng = np.random.default_rng(2024)
data_np = rng.integers(0, 256, size=N, dtype=np.uint8)

struct = pd.structure_for(table)
p32_flat = tuple(x for row in struct.p32 for x in row)
lens64 = table.lengths[data_np].astype(np.int64)
ends = np.cumsum(lens64)

n_blocks = -(-N // K)
starts_idx = np.arange(n_blocks) * K
offsets = np.zeros(n_blocks, dtype=np.int64)
offsets[1:] = ends[starts_idx[1:] - 1]
total_words = int(ends[-1] + 31) // 32 + 2
words_np = rng.integers(0, 1 << 32, size=total_words, dtype=np.uint64).astype(np.uint32)
B = n_blocks
G = -(-B // pd.LANES)
Bp = G * pd.LANES
n_sym = np.full(B, K, dtype=np.int32)
n_sym[-1] = N - (B - 1) * K
index = BlockIndex(K, offsets, n_sym, N, int(ends[-1]))
Wb = pd.plan_wb(index, table)
NR = pd._rows_for(Wb)
RW = pd.STAGE_RW
print(f"K={K} Wb={Wb} NR={NR} RW={RW} staged/block={NR*RW} words "
      f"(block span ~{(offsets[1]-offsets[0])//32} words), G={G}")

base = np.zeros(Bp, np.int32)
rel = np.zeros(Bp, np.int32)
nsym = np.zeros(Bp, np.int32)
base[:B] = offsets >> 5
rel[:B] = offsets & 31
nsym[:B] = n_sym
jw = jnp.asarray(words_np)
jb, jr, jn = map(jnp.asarray, (base, rel, nsym))
interp = pd._use_interpret()


def staging(w, upto):
    S = -(-w.shape[0] // RW) + NR
    spans = jnp.pad(w, (0, S * RW - w.shape[0])).reshape(S, RW)
    r = jb // RW
    win = jnp.concatenate(
        [spans.at[r + t].get(mode="clip", indices_are_sorted=True) for t in range(NR)],
        axis=1,
    )
    if upto == "take":
        return win
    return win.reshape(G, 8, 128, NR * RW).transpose(0, 3, 1, 2)


def make_body(stage):
    def body(i, carry):
        w = jw ^ carry
        if stage in ("take", "transpose"):
            return carry ^ staging(w, stage).sum(dtype=jnp.uint32)
        out, end, _bad = pd._decode_pipeline(
            w, jb, jr, jn, K, Wb, G, struct.intervals, p32_flat, interp
        )
        return carry ^ out.sum(dtype=jnp.uint32) ^ end.sum(dtype=jnp.int32).astype(jnp.uint32)
    return body


names = ["take", "transpose", "full"]
bodies = [make_body(s) for s in names]
runs = []
for bd in bodies:
    @partial(jax.jit, static_argnames=("k",))
    def run(seed, k, bd=bd):
        return jax.lax.fori_loop(0, k, bd, seed)
    runs.append(run)

K_LO, K_HI = 9, 129
for nm, run in zip(names, runs):
    for k in (K_LO, K_HI):
        t0 = time.perf_counter()
        int(run(jnp.uint32(1), k))
        print(f"warm {nm}@{k}: {time.perf_counter()-t0:.1f}s", flush=True)

t_lo = [float("inf")] * 3
t_hi = [float("inf")] * 3
start = time.perf_counter()
while time.perf_counter() - start < WINDOW_S:
    for i, run in enumerate(runs):
        t0 = time.perf_counter(); int(run(jnp.uint32(1), K_HI)); h = time.perf_counter() - t0
        t0 = time.perf_counter(); int(run(jnp.uint32(1), K_LO)); l = time.perf_counter() - t0
        t_hi[i] = min(t_hi[i], h)
        t_lo[i] = min(t_lo[i], l)

for nm, h, l in zip(names, t_hi, t_lo):
    us = (h - l) / (K_HI - K_LO) * 1e6
    print(f"{nm:10s}: {us:8.1f} us  ({N/ (us/1e6) /1e9:6.2f} GB/s)")
