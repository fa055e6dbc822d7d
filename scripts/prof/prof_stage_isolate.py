"""Isolate the encode pipeline's XLA prologue cost (no Pallas at all).

Chain protocol. Stages:
  floor   — xor-seed the 8 MiB symbol array, sum
  pack32  — + pad + bitcast to u32, sum
  resh    — + reshape (G,8,128,K4), sum (layout no-op, expect = pack32)
  tpose   — + transpose (0,3,1,2), sum  <- suspected cost
  tpose_c — transpose via copy trick: reshape to 2D (1024, G*K4) ... n/a
  mxu     — transpose via dot_general on the MXU: split u32 into 2x u16,
            X^T = dot_general(X, I, contract lhs dim 0) in f32 (exact for
            16-bit values), recombine
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

import tpu_huffman as th
from tpu_huffman.ops import pallas_encode as pe

table = th.load_static_test_table()
N = 8 * 1024 * 1024
K = pe.pack_k(table)
p32t, lent, min_len, max_len, Wb, G, num_out_words = pe._plan(table, N, K)
B = G * pe.LANES
K4 = K // 4
pad_to = B * K
rng = np.random.default_rng(2024)
symbols = jnp.asarray(rng.integers(0, 256, size=N, dtype=np.uint8))
print(f"K={K} K4={K4} B={B} G={G} words={pad_to//4}")

I1024 = jnp.eye(1024, dtype=jnp.float32)


def stage_fn(stage):
    @jax.jit
    def fn(seed):
        syms = symbols ^ seed.astype(jnp.uint8)
        if stage == "floor":
            return seed ^ syms.sum(dtype=jnp.uint32)
        padded = jnp.pad(syms, (0, pad_to - N))
        syms_u32 = jax.lax.bitcast_convert_type(
            padded.reshape(-1, 4), jnp.uint32
        ).reshape(-1)
        if stage == "pack32":
            return seed ^ syms_u32.sum(dtype=jnp.uint32)
        x = syms_u32.reshape(G, 8, 128, K4)
        if stage == "resh":
            return seed ^ x.sum(dtype=jnp.uint32)
        if stage == "tpose":
            staged = x.transpose(0, 3, 1, 2)
            return seed ^ staged.sum(dtype=jnp.uint32)
        if stage == "mxu":
            # (G*K4 lanes-per-... ) view as (B, K4) -> want (K4-major)
            # X2: (1024, G*K4*2) u16 planes; transpose via MXU per g.
            xw = syms_u32.reshape(B, K4)  # row b = block b's words
            lo = (xw & jnp.uint32(0xFFFF)).astype(jnp.float32)
            hi = (xw >> jnp.uint32(16)).astype(jnp.float32)
            # per grid chunk: rows (1024, K4) -> (K4, 1024)
            lo3 = lo.reshape(G, 1024, K4)
            hi3 = hi.reshape(G, 1024, K4)
            # out[g,u,c] = sum_b x[g,b,u] * I[b,c] — the transpose as one
            # MXU contraction (exact in f32: one nonzero per column, 16-bit
            # values).
            lo_t = jnp.einsum("gbu,bc->guc", lo3, I1024)
            hi_t = jnp.einsum("gbu,bc->guc", hi3, I1024)
            st = (
                lo_t.astype(jnp.uint32)
                | (hi_t.astype(jnp.uint32) << jnp.uint32(16))
            ).reshape(G, K4, 8, 128)
            return seed ^ st.sum(dtype=jnp.uint32)
        raise ValueError(stage)

    return fn


STAGES = ("floor", "pack32", "resh", "tpose", "mxu")
fns = {}
for stage in STAGES:
    fns[stage] = stage_fn(stage)
    jax.block_until_ready(fns[stage](jnp.uint32(1)))  # compile
best = {stage: float("inf") for stage in STAGES}
for _round in range(8):  # interleave variants to cancel dispatch-burst drift
    for stage in STAGES:
        step = fns[stage]
        s = jnp.uint32(1)
        t0 = time.perf_counter()
        for _ in range(8):
            s = step(s)
        jax.block_until_ready(s)
        best[stage] = min(best[stage], (time.perf_counter() - t0) / 8)
for stage in STAGES:
    print(f"{stage:7s}: {best[stage]*1e3:8.3f} ms", flush=True)
