"""Interleaved A/B of the offset-cumsum formulation in the encode pipeline.

A (old): bt via sub-block inclusive log chain; _exclusive_cumsum_blocks
         with the int32 log-shift inner level.
B (new): bt via one reduction; MXU triangular-matmul inner level
         (mxu_inner=True).

Both run the FULL production pipeline otherwise (pack kernel + funnel +
barrel + row scatters, index output dropped), interleaved within one
process so rig noise hits both. Loop protocol.

Usage: python prof_true_cumsum_ab.py [K]
"""
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

import tpu_huffman as th
from tpu_huffman.ops import pallas_encode as pe

table = th.load_static_test_table()
N = 8 * 1024 * 1024
rng = np.random.default_rng(2024)
symbols = jnp.asarray(rng.integers(0, 256, size=N, dtype=np.uint8))

K = int(sys.argv[1]) if len(sys.argv) > 1 else 1024


def make_body(variant):
    p32t, lent, min_len, max_len, Wb, G, num_out_words = pe._plan(table, N, K)
    B = G * pe.LANES
    K4 = K // 4
    nsym = jnp.asarray(np.full(B, K, np.int32))
    pad_to = B * K
    interpret = pe._use_interpret()
    S = pe._sub_block(K, min_len, max_len)
    nsub = K // S

    def body(i, s):
        syms = symbols ^ s.astype(jnp.uint8)
        padded = jnp.pad(syms, (0, pad_to - N))
        syms_u32 = jax.lax.bitcast_convert_type(
            padded.reshape(-1, 4), jnp.uint32
        ).reshape(-1)
        staged = syms_u32.reshape(G, 8, 128, K4).transpose(0, 3, 1, 2)
        rows, bits, bad = pe._make_pack_call(
            p32t, lent, K, Wb, G, min_len, max_len, interpret, S
        )(staged, nsym.reshape(G, 8, 128))
        rows2 = rows.reshape(G, Wb, 8, 128).transpose(0, 2, 3, 1).reshape(B, Wb)
        bits4 = bits.reshape(G, nsub, 8, 128)
        if variant == "A":
            incl = bits4
            k = 1
            while k < nsub:
                incl = incl + jnp.pad(
                    incl, ((0, 0), (k, 0), (0, 0), (0, 0))
                )[:, :nsub]
                k *= 2
            bt = incl[:, -1].reshape(B)
            offs, total_bits = pe._exclusive_cumsum_blocks(bt)
        else:
            bt = bits4.sum(axis=1).reshape(B)
            offs, total_bits = pe._exclusive_cumsum_blocks(bt, mxu_inner=True)
        rel = (offs & 31).astype(jnp.uint32)
        rows_ext = jnp.concatenate([rows2, jnp.zeros((B, 1), jnp.uint32)], axis=1)
        prev = jnp.concatenate([jnp.zeros((B, 1), jnp.uint32), rows2], axis=1)
        shifted = (rows_ext >> rel[:, None]) | (
            (prev << ((jnp.uint32(31) - rel[:, None]))) << jnp.uint32(1)
        )
        SW = 128
        nrows = -(-(Wb + SW) // SW)
        Wtot = SW * nrows
        a = ((offs >> 5) & (SW - 1)).astype(jnp.int32)
        buf = jnp.concatenate(
            [shifted, jnp.zeros((B, Wtot - (Wb + 1)), jnp.uint32)], axis=1
        )
        k = SW // 2
        while k >= 1:
            rolled = jnp.pad(buf, ((0, 0), (k, 0)))[:, :Wtot]
            buf = jnp.where((a[:, None] & k) != 0, rolled, buf)
            k //= 2
        r0 = (offs >> (5 + SW.bit_length() - 1)).astype(jnp.int32)
        Wr = num_out_words // SW
        out2d = jnp.zeros((Wr, SW), dtype=jnp.uint32)
        for t in range(nrows):
            out2d = out2d.at[r0 + t].add(
                buf[:, SW * t : SW * (t + 1)], mode="drop",
                indices_are_sorted=True,
            )
        return s ^ out2d.sum(dtype=jnp.uint32) ^ total_bits.astype(jnp.uint32)

    return body


def make_run(body):
    @partial(jax.jit, static_argnames=("k",))
    def run(seed, k):
        return jax.lax.fori_loop(0, k, body, seed)

    return run


runs = {v: make_run(make_body(v)) for v in ("A", "B")}
k_lo, k_hi, reps = 9, 65, 6
for v, run in runs.items():
    int(run(jnp.uint32(1), k_lo))
    int(run(jnp.uint32(1), k_hi))

best = {v: {k_lo: float("inf"), k_hi: float("inf")} for v in runs}
for _ in range(reps):
    for v, run in runs.items():
        for k in (k_lo, k_hi):
            t0 = time.perf_counter()
            int(run(jnp.uint32(1), k))
            best[v][k] = min(best[v][k], time.perf_counter() - t0)

for v in runs:
    per = (best[v][k_hi] - best[v][k_lo]) / (k_hi - k_lo)
    print(f"{v}: {per*1e6:7.1f} us  -> {N/per/1e9:.2f} GB/s", flush=True)
