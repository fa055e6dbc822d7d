"""Chain-time the Pallas encode pipeline stage by stage at 8 MiB.

Stages (cumulative): pack kernel -> +cumsum -> +funnel -> +barrel ->
+row scatters (= full pipeline). Each stage folds its full output into a
u32 scalar carried through the chain (DCE-proof, MEASURING.md protocol).
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

import tpu_huffman as th
from tpu_huffman.ops import pallas_encode as pe

table = th.load_static_test_table()
N = 8 * 1024 * 1024
K = 32
rng = np.random.default_rng(2024)
data_np = rng.integers(0, 256, size=N, dtype=np.uint8)
symbols = jnp.asarray(data_np)

invp32, enc_intervals, min_len, max_len, Wb, G, num_out_words = pe._plan(
    table, N, K
)
B = G * pe.LANES
nsym_np = np.full(B, K, np.int32)
nsym = jnp.asarray(nsym_np)
pad_to = B * K
interpret = pe._use_interpret()


def staged_syms(syms):
    padded = jnp.pad(syms, (0, pad_to - N))
    syms_u32 = jax.lax.bitcast_convert_type(
        padded.reshape(-1, 4), jnp.uint32
    ).reshape(-1)
    return syms_u32.reshape(G, 8, 128, K // 4).transpose(0, 3, 1, 2)


def run_stage(stage):
    def fn(seed):
        syms = (symbols + seed.astype(jnp.uint8)) - seed.astype(jnp.uint8)
        staged = staged_syms(syms)
        rows, bits, bad = pe._make_pack_call(
            invp32, enc_intervals, K, Wb, G, min_len, max_len, interpret
        )(staged, nsym.reshape(G, 8, 128))
        if stage == "pack":
            return seed ^ rows.sum(dtype=jnp.uint32) ^ bits.sum().astype(jnp.uint32)
        rows = rows.reshape(G, Wb, 8, 128).transpose(0, 2, 3, 1).reshape(B, Wb)
        if stage == "pack_t":
            return seed ^ rows.sum(dtype=jnp.uint32)
        bits_flat = bits.reshape(B)
        offs, total_bits = pe._exclusive_cumsum_blocks(bits_flat)
        if stage == "cumsum":
            return seed ^ rows.sum(dtype=jnp.uint32) ^ offs.sum().astype(jnp.uint32)
        rel = (offs & 31).astype(jnp.uint32)
        rows_ext = jnp.concatenate([rows, jnp.zeros((B, 1), jnp.uint32)], axis=1)
        prev = jnp.concatenate([jnp.zeros((B, 1), jnp.uint32), rows], axis=1)
        shifted = (rows_ext >> rel[:, None]) | (
            (prev << ((jnp.uint32(31) - rel[:, None]))) << jnp.uint32(1)
        )
        if stage == "funnel":
            return seed ^ shifted.sum(dtype=jnp.uint32)
        a = ((offs >> 5) & 31).astype(jnp.int32)
        buf = jnp.concatenate(
            [shifted, jnp.zeros((B, 64 - (Wb + 1)), jnp.uint32)], axis=1
        )
        for k in (16, 8, 4, 2, 1):
            rolled = jnp.pad(buf, ((0, 0), (k, 0)))[:, :64]
            buf = jnp.where((a[:, None] & k) != 0, rolled, buf)
        if stage == "barrel":
            return seed ^ buf.sum(dtype=jnp.uint32)
        r0 = offs >> 10
        W32 = num_out_words // 32
        out2d = jnp.zeros((W32, 32), dtype=jnp.uint32)
        out2d = out2d.at[r0].add(buf[:, :32], mode="drop")
        out2d = out2d.at[r0 + 1].add(buf[:, 32:], mode="drop")
        return seed ^ out2d.sum(dtype=jnp.uint32)

    return jax.jit(fn)


for stage in ("pack", "pack_t", "cumsum", "funnel", "barrel", "scatter"):
    step = run_stage(stage)
    s = step(jnp.uint32(1))
    jax.block_until_ready(s)
    best = float("inf")
    for _ in range(2):
        s = jnp.uint32(1)
        t0 = time.perf_counter()
        REPS = 8
        for _ in range(REPS):
            s = step(s)
        jax.block_until_ready(s)
        best = min(best, (time.perf_counter() - t0) / REPS)
    print(f"{stage:8s}: {best*1e3:8.3f} ms  ({N/best/1e9:.3f} GB/s)", flush=True)
