"""Stage split of the production encode pipeline at the adaptive K
(pack_k(table)): pack kernel alone vs +cumsum vs full pipeline.
Chain protocol; XOR seeding (unfoldable)."""
import time
import numpy as np
import jax
import jax.numpy as jnp

import tpu_huffman as th
from tpu_huffman.ops import pallas_encode as pe

table = th.load_static_test_table()
N = 8 * 1024 * 1024
K = pe.pack_k(table)
rng = np.random.default_rng(2024)
symbols = jnp.asarray(rng.integers(0, 256, size=N, dtype=np.uint8))

invp32, enc_intervals, min_len, max_len, Wb, G, num_out_words = pe._plan(
    table, N, K
)
B = G * pe.LANES
print(f"K={K} Wb={Wb} B={B} G={G}")
nsym = jnp.asarray(np.full(B, K, np.int32))
pad_to = B * K
interpret = pe._use_interpret()


def run_stage(stage):
    @jax.jit
    def fn(seed):
        syms = symbols ^ seed.astype(jnp.uint8)
        padded = jnp.pad(syms, (0, pad_to - N))
        syms_u32 = jax.lax.bitcast_convert_type(
            padded.reshape(-1, 4), jnp.uint32
        ).reshape(-1)
        staged = syms_u32.reshape(G, 8, 128, K // 4).transpose(0, 3, 1, 2)
        rows, bits, bad = pe._make_pack_call(
            invp32, enc_intervals, K, Wb, G, min_len, max_len, interpret
        )(staged, nsym.reshape(G, 8, 128))
        if stage == "pack":
            return seed ^ rows.sum(dtype=jnp.uint32) ^ bits.sum().astype(jnp.uint32)
        rows2 = rows.reshape(G, Wb, 8, 128).transpose(0, 2, 3, 1).reshape(B, Wb)
        if stage == "pack_t":
            return seed ^ rows2.sum(dtype=jnp.uint32)
        bits_flat = bits.reshape(B)
        offs, total_bits = pe._exclusive_cumsum_blocks(bits_flat)
        if stage == "cumsum":
            return seed ^ rows2.sum(dtype=jnp.uint32) ^ offs.sum().astype(jnp.uint32)
        words, tb, pb, bad_any, _ = pe._encode_pipeline(
            syms_u32, nsym, jnp.uint32(0xFF), K, G, Wb, num_out_words,
            invp32, enc_intervals, min_len, max_len, interpret,
        )
        return seed ^ words.sum(dtype=jnp.uint32) ^ tb.astype(jnp.uint32)

    return fn


for stage in ("pack", "pack_t", "cumsum", "full"):
    step = run_stage(stage)
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
    print(f"{stage:7s}: {best*1e3:8.3f} ms  ({N/best/1e9:.3f} GB/s)", flush=True)
