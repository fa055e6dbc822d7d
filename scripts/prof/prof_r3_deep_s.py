"""Deep-table (5-30 bit) indexed decode: anchor-interval S sweep with the
pair-fetch multi-symbol kernel. One S per process (argv)."""
import sys, time
from functools import partial
sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])
import numpy as np, jax, jax.numpy as jnp

S_FORCE = int(sys.argv[1])
WINDOW = float(sys.argv[2]) if len(sys.argv) > 2 else 45.0

from tpu_huffman.ops import pallas_decode as pd
if S_FORCE:
    pd._anchor_interval = lambda K, mn, mx, _s=S_FORCE: _s

import tpu_huffman as th

def mixed_lengths_5_30():
    lens = {}
    sym = 0
    budget = 1.0
    for L in range(5, 30):
        lens[sym] = L
        budget -= 2.0 ** -L
        sym += 1
    remaining = 256 - sym - 1
    L = 5
    while remaining > 0:
        while L < 30 and 2.0 ** -L > budget - remaining * 2.0 ** -30 + 1e-18:
            L += 1
        lens[sym] = L
        budget -= 2.0 ** -L
        sym += 1
        remaining -= 1
    lens[sym] = 30
    return lens

table = th.make_canonical(mixed_lengths_5_30(), name="mixed_5_30")
N = 8 * 1024 * 1024
K = 512
rng = np.random.default_rng(3)
lens = table.lengths.astype(np.float64)
w = np.where(lens > 0, 2.0 ** -lens, 0.0)
w /= w.sum()
data_np = rng.choice(256, size=N, p=w).astype(np.uint8)
struct_pair = pd.decode_dispatch(table)
intervals, p32_flat = struct_pair
lens64 = table.lengths[data_np].astype(np.int64)
ends = np.cumsum(lens64)
n_blocks = -(-N // K)
starts_idx = np.arange(n_blocks) * K
offsets = np.zeros(n_blocks, dtype=np.int64)
offsets[1:] = ends[starts_idx[1:] - 1]
total_words = int(ends[-1] + 31) // 32 + 2
words_np = rng.integers(0, 1 << 32, size=total_words, dtype=np.uint64).astype(np.uint32)
B = n_blocks; G = -(-B // pd.LANES); Bp = G * pd.LANES
n_sym = np.full(B, K, dtype=np.int32); n_sym[-1] = N - (B - 1) * K
from tpu_huffman.ops.decode import BlockIndex
index = BlockIndex(K, offsets, n_sym, N, int(ends[-1]))
Wb = pd.plan_wb(index, table)
print(f"S={S_FORCE or 'def'} Wb={Wb} NR={pd._rows_for(Wb)} G={G}", flush=True)
base = np.zeros(Bp, np.int32); rel = np.zeros(Bp, np.int32); nsym = np.zeros(Bp, np.int32)
base[:B] = offsets >> 5; rel[:B] = offsets & 31; nsym[:B] = n_sym
jw = jnp.asarray(words_np)
jb, jr, jn = map(jnp.asarray, (base, rel, nsym))
interp = pd._use_interpret()

def body(i, carry):
    wv = jw ^ carry
    out, end, _bad = pd._decode_pipeline(wv, jb, jr, jn, K, Wb, G, intervals, p32_flat, interp)
    return carry ^ out.sum(dtype=jnp.uint32) ^ end.sum(dtype=jnp.int32).astype(jnp.uint32)

@partial(jax.jit, static_argnames=("k",))
def run(seed, k):
    return jax.lax.fori_loop(0, k, body, seed)

K_LO, K_HI = 9, 49
for k in (K_LO, K_HI):
    for attempt in range(4):
        try:
            t0 = time.perf_counter(); int(run(jnp.uint32(1), k))
            print(f"warm@{k}: {time.perf_counter()-t0:.1f}s", flush=True)
            break
        except Exception as e:
            print(f"warm@{k} retry: {type(e).__name__}", flush=True)
            time.sleep(10)
tlo = thi = float("inf")
t_end = time.perf_counter() + WINDOW
while time.perf_counter() < t_end:
    t0 = time.perf_counter(); int(run(jnp.uint32(1), K_HI)); h = time.perf_counter() - t0
    t0 = time.perf_counter(); int(run(jnp.uint32(1), K_LO)); l = time.perf_counter() - t0
    thi = min(thi, h); tlo = min(tlo, l)
us = (thi - tlo) / (K_HI - K_LO) * 1e6
print(f"RESULT S={S_FORCE}: {us:.0f} us ({N/(us/1e6)/1e9:.2f} GB/s)", flush=True)
