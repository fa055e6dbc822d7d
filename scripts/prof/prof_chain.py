"""Is block_until_ready trustworthy here? Chain test vs bench protocol.

a) bench-style: min over reps of [dispatch; block_until_ready(out)]
b) chain: y_{i+1} depends on y_i through the kernel; block once at the end.
   wall/N is the true per-call device time regardless of async tricks.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

import tpu_huffman as th
from tpu_huffman.ops.encode import DeviceTable, encode_block_kernel_indexed

table = th.load_static_test_table()
dt = DeviceTable.for_table(table)
N = 8 * 1024 * 1024
rng = np.random.default_rng(2024)
data_np = rng.integers(0, 256, size=N, dtype=np.uint8)
symbols = jnp.asarray(data_np)
K = 128


def run_encode(sym):
    return encode_block_kernel_indexed(
        sym, jnp.int32(N), dt.patterns, dt.lengths,
        jnp.uint32(0xFF), jnp.int32(0),
        num_out_words=N + 2, block_symbols=K,
    )

out = run_encode(symbols)
jax.block_until_ready(out)

# a) bench protocol
best = float("inf")
for _ in range(15):
    t0 = time.perf_counter()
    out = run_encode(symbols)
    jax.block_until_ready(out)
    best = min(best, time.perf_counter() - t0)
print(f"bench-style min: {best*1e3:.3f} ms  ({N/best/1e9:.1f} GB/s)", flush=True)

# b) dependency chain: feed a byte-view of the words back in as symbols
@jax.jit
def chain_step(sym):
    words, total_bits, padded, bad, bi, off = encode_block_kernel_indexed(
        sym, jnp.int32(N), dt.patterns, dt.lengths,
        jnp.uint32(0xFF), jnp.int32(0),
        num_out_words=N + 2, block_symbols=K,
    )
    nxt = (words[:N // 4].view(jnp.uint8))[:N]
    return nxt, total_bits

sym = symbols
nxt, tb = chain_step(sym)
jax.block_until_ready((nxt, tb))
REPS = 10
t0 = time.perf_counter()
s = sym
for _ in range(REPS):
    s, tb = chain_step(s)
jax.block_until_ready((s, tb))
wall = time.perf_counter() - t0
print(f"chain: {wall/REPS*1e3:.3f} ms/call  ({N/(wall/REPS)/1e9:.1f} GB/s)", flush=True)
