"""Chain test for the Pallas indexed decode pipeline: true device time.

Hazards controlled:
- real data dependency (output sum XORed into next input, not maskable to 0)
- also a small-output bench-style variant (scalar return) for comparison
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

import tpu_huffman as th
from tpu_huffman.ops.bitpack import words_from_bytes_np
from tpu_huffman.ops.pallas_decode import (
    LANES, _decode_pipeline, _use_interpret, structure_for,
)
from tpu_huffman import oracle

table = th.load_static_test_table()
struct = structure_for(table)
p32_flat = tuple(x for row in struct.p32 for x in row)
K = 128
N = 8 * 1024 * 1024
rng = np.random.default_rng(2024)
data_np = rng.integers(0, 256, size=N, dtype=np.uint8)

lens64 = table.lengths[data_np].astype(np.int64)
ends = np.cumsum(lens64)
n_blocks = -(-N // K)
starts_idx = np.arange(n_blocks) * K
offsets = np.zeros(n_blocks, dtype=np.int64)
offsets[1:] = ends[starts_idx[1:] - 1]
n_sym = np.full(n_blocks, K, dtype=np.int32)

ot = oracle.OracleTable(table)
encoded = oracle.OracleEncoder(ot).encode(data_np.tobytes())
words_np, _ = words_from_bytes_np(encoded)
words_np = np.concatenate([words_np, np.zeros(2, np.uint32)])

B = n_blocks
G = -(-B // LANES)
Bp = G * LANES
Wb = (K * table.max_len + 31) // 32 + 2
base = np.zeros(Bp, np.int32); rel = np.zeros(Bp, np.int32); nsym = np.zeros(Bp, np.int32)
base[:B] = offsets >> 5; rel[:B] = offsets & 31; nsym[:B] = n_sym
jw, jb, jr, jn = map(jnp.asarray, (words_np, base, rel, nsym))
interp = _use_interpret()

# a) bench-style, big outputs (historical protocol)
def run_decode(w):
    return _decode_pipeline(w, jb, jr, jn, K, Wb, G, struct.intervals, p32_flat, interp)

out = run_decode(jw)
jax.block_until_ready(out)
best = float("inf")
for _ in range(10):
    t0 = time.perf_counter()
    out = run_decode(jw)
    jax.block_until_ready(out)
    best = min(best, time.perf_counter() - t0)
print(f"big-output bench-style min: {best*1e3:.3f} ms ({N/best/1e9:.1f} GB/s)", flush=True)

# b) small-output bench-style: scalar sum forces completion if small
#    results are returned inline/eagerly
@jax.jit
def decode_sum(w):
    out, end, _bad = _decode_pipeline(w, jb, jr, jn, K, Wb, G, struct.intervals, p32_flat, interp)
    return out.sum(dtype=jnp.uint32) + end.sum(dtype=jnp.int32).astype(jnp.uint32)

s = decode_sum(jw)
jax.block_until_ready(s)
best = float("inf")
for _ in range(10):
    t0 = time.perf_counter()
    s = decode_sum(jw)
    jax.block_until_ready(s)
    best = min(best, time.perf_counter() - t0)
print(f"small-output bench-style min: {best*1e3:.3f} ms ({N/best/1e9:.1f} GB/s)", flush=True)

# c) chain with undroppable dependency
@jax.jit
def chain_step(w):
    out, end, _bad = _decode_pipeline(w, jb, jr, jn, K, Wb, G, struct.intervals, p32_flat, interp)
    s = out.sum(dtype=jnp.uint32) + end.sum(dtype=jnp.int32).astype(jnp.uint32)
    return w ^ s  # garbage next input; decode runtime is data-independent

w = jw
w = chain_step(w)
jax.block_until_ready(w)
REPS = 10
w = jw
t0 = time.perf_counter()
for _ in range(REPS):
    w = chain_step(w)
jax.block_until_ready(w)
wall = time.perf_counter() - t0
print(f"chain: {wall/REPS*1e3:.3f} ms/call ({N/(wall/REPS)/1e9:.1f} GB/s)", flush=True)
