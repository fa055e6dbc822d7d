"""Chain-time the full Pallas encode pipeline (pack + stitch) at 8 MiB.

Used to validate stitch variants (flat elementwise scatter vs barrel +
fat-row scatter). MEASURING.md protocol: scalar-carried chain, no D2H.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

import tpu_huffman as th
from tpu_huffman.ops import pallas_encode as pe

table = th.load_static_test_table()
N = 8 * 1024 * 1024
rng = np.random.default_rng(2024)
data_np = rng.integers(0, 256, size=N, dtype=np.uint8)
symbols = jnp.asarray(data_np)

encode_fn, _ = pe.encode_step(table, N)


@jax.jit
def chain_step(seed):
    words, total_bits, padded = encode_fn(
        (symbols + seed.astype(jnp.uint8)) - seed.astype(jnp.uint8)
    )
    return seed ^ words.sum(dtype=jnp.uint32) ^ total_bits.astype(jnp.uint32)


s = chain_step(jnp.uint32(1))
jax.block_until_ready(s)
best = float("inf")
for _ in range(3):
    s = jnp.uint32(1)
    t0 = time.perf_counter()
    REPS = 8
    for _ in range(REPS):
        s = chain_step(s)
    jax.block_until_ready(s)
    best = min(best, (time.perf_counter() - t0) / REPS)
print(f"pallas encode pipeline: {best*1e3:.3f} ms  ({N/best/1e9:.3f} GB/s)",
      flush=True)
