"""Split decode pipeline cost: XLA window staging vs Pallas kernel.

Chain protocol per MEASURING.md §1.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

import tpu_huffman as th
from tpu_huffman.ops.bitpack import words_from_bytes_np
from tpu_huffman.ops.pallas_decode import (
    LANES, _make_pallas_call, _use_interpret, structure_for,
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

ot = oracle.OracleTable(table)
encoded = oracle.OracleEncoder(ot).encode(data_np.tobytes())
words_np, _ = words_from_bytes_np(encoded)
words_np = np.concatenate([words_np, np.zeros(2, np.uint32)])

B = n_blocks
G = -(-B // LANES)
Bp = G * LANES
Wb = (K * table.max_len + 31) // 32 + 2
base = np.zeros(Bp, np.int32); rel = np.zeros(Bp, np.int32); nsym = np.zeros(Bp, np.int32)
base[:B] = offsets >> 5; rel[:B] = offsets & 31; nsym[:B] = np.full(B, K, np.int32)
jw = jnp.asarray(words_np)
jb = jnp.asarray(base)
jrel = jnp.asarray(rel.reshape(G, 8, 128))
jns = jnp.asarray(nsym.reshape(G, 8, 128))
interp = _use_interpret()
call = _make_pallas_call(struct.intervals, p32_flat, K, Wb, G, interp)

def chain(step, x0, reps=8):
    x = step(x0)
    jax.block_until_ready(x)
    best = float("inf")
    for _ in range(2):
        x = x0
        t0 = time.perf_counter()
        for _ in range(reps):
            x = step(x)
        jax.block_until_ready(x)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best

# A) staging only: row gather + reshape/transpose, fed back via xor of a sum
@jax.jit
def stage_step(w):
    jj = jax.lax.broadcasted_iota(jnp.int32, (1, Wb), 1)
    win = w[jb[:, None] + jj]
    win = win.reshape(G, 8, 128, Wb).transpose(0, 3, 1, 2)
    s = win.sum(dtype=jnp.uint32)
    return w ^ s

t = chain(stage_step, jw)
print(f"staging (row gather+transpose): {t*1e3:.3f} ms ({N/t/1e9:.2f} GB/s)", flush=True)

# B) kernel only: pre-staged window, fed back via xor
jj = jax.lax.broadcasted_iota(jnp.int32, (1, Wb), 1)
win0 = jnp.asarray(np.asarray(jw)[base[:, None] + np.arange(Wb)[None, :]]
                   .reshape(G, 8, 128, Wb).transpose(0, 3, 1, 2))

@jax.jit
def kernel_step(win):
    out, end, _bad = call(win, jrel, jns)
    s = out.sum(dtype=jnp.uint32) + end.sum(dtype=jnp.int32).astype(jnp.uint32)
    return win ^ s

t = chain(kernel_step, win0)
print(f"pallas kernel only: {t*1e3:.3f} ms ({N/t/1e9:.2f} GB/s)", flush=True)

# C) output untangle only (transpose+reshape of out-sized array)
out0 = jnp.zeros((G * (K // 4), 8, 128), jnp.uint32) + jnp.uint32(1)

@jax.jit
def untangle_step(o):
    r = o.reshape(G, K // 4, 8, 128).transpose(0, 2, 3, 1).reshape(G * LANES, K // 4)
    s = r.sum(dtype=jnp.uint32)
    return o ^ s

t = chain(untangle_step, out0)
print(f"output untangle: {t*1e3:.3f} ms ({N/t/1e9:.2f} GB/s)", flush=True)
