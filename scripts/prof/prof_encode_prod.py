"""Chain-time the PRODUCTION encode step (ops/pallas_encode.encode_step)
at 8 MiB, plus the same pipeline with the pair-merge disabled (env
TPU_HUFFMAN_NO_MERGE=1 toggles, for A/B). MEASURING.md protocol."""
import os
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

for K in (64, 128, 256):
    invp32, enc_intervals, min_len, max_len, Wb, G, now = pe._plan(table, N, K)
    print(f"K={K}: Wb={Wb} G={G} B={G*pe.LANES} num_out_words={now}")

    enc_fn, _fin = pe.encode_step(table, N, K=K)

    @jax.jit
    def step(seed):
        # XOR, not (x+s)-s: the latter folds to x in u8, severing the chain
        # and letting the device pipeline steps (undercounts, MEASURING.md).
        syms = symbols ^ seed.astype(jnp.uint8)
        words, total_bits, padded_bits = enc_fn(syms)
        return (
            seed
            ^ words.sum(dtype=jnp.uint32)
            ^ total_bits.astype(jnp.uint32)
        )

    s = step(jnp.uint32(1))
    jax.block_until_ready(s)
    best = float("inf")
    for _ in range(3):
        s = jnp.uint32(1)
        t0 = time.perf_counter()
        for _ in range(8):
            s = step(s)
        jax.block_until_ready(s)
        best = min(best, (time.perf_counter() - t0) / 8)
    print(f"encode prod K={K}: {best*1e3:8.3f} ms  ({N/best/1e9:.3f} GB/s)", flush=True)

