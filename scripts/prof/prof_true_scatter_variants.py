"""A/B the stitch's final row scatter under the TRUE loop protocol.

Variants (same math, same inputs):
  add_sorted        — production: .add(mode=drop, indices_are_sorted)
  add_sorted_unique — + unique_indices=True (r0+t is strictly increasing
                      within each call: blocks are >=K*min_len/32 >= 1.25
                      rows apart, so r0 is strictly increasing)
  set_then_sum      — 4 separate .set(unique+sorted) buffers, then tree-add
  w64               — 64-wide rows: 6-stage barrel over 192 cols, 3 scatter
                      calls of 64-wide rows (r0_64 = offs>>11)

Usage: python prof_true_scatter_variants.py [K ...]
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

KS = [int(a) for a in sys.argv[1:]] or [256]
VARIANTS = ("w64_dup", "w64", "w128_dup", "w128")


def make_body(K, variant):
    p32t, lent, min_len, max_len, Wb, G, num_out_words = pe._plan(table, N, K)
    B = G * pe.LANES
    K4 = K // 4
    nsym = jnp.asarray(np.full(B, K, np.int32))
    pad_to = B * K
    interpret = pe._use_interpret()

    def body(i, s):
        syms = symbols ^ s.astype(jnp.uint8)
        padded = jnp.pad(syms, (0, pad_to - N))
        syms_u32 = jax.lax.bitcast_convert_type(
            padded.reshape(-1, 4), jnp.uint32
        ).reshape(-1)
        staged = syms_u32.reshape(G, 8, 128, K4).transpose(0, 3, 1, 2)
        rows, bits, bad = pe._make_pack_call(
            p32t, lent, K, Wb, G, min_len, max_len, interpret
        )(staged, nsym.reshape(G, 8, 128))
        rows2 = rows.reshape(G, Wb, 8, 128).transpose(0, 2, 3, 1).reshape(B, Wb)
        bits_flat = bits.reshape(B)
        offs, total_bits = pe._exclusive_cumsum_blocks(bits_flat)
        rel = (offs & 31).astype(jnp.uint32)
        rows_ext = jnp.concatenate([rows2, jnp.zeros((B, 1), jnp.uint32)], axis=1)
        prev = jnp.concatenate([jnp.zeros((B, 1), jnp.uint32), rows2], axis=1)
        shifted = (rows_ext >> rel[:, None]) | (
            (prev << ((jnp.uint32(31) - rel[:, None]))) << jnp.uint32(1)
        )
        if variant.startswith("w") and variant[1] != "3":
            W = int(variant.split("_")[0][1:])
            uniq = not variant.endswith("_dup")
            shift_bits = W.bit_length() - 1 + 5  # log2(W)+5
            nrows = -(-(Wb + W) // W)
            Wtot = W * nrows
            a = ((offs >> 5) & (W - 1)).astype(jnp.int32)
            buf = jnp.concatenate(
                [shifted, jnp.zeros((B, Wtot - (Wb + 1)), jnp.uint32)], axis=1
            )
            k = W // 2
            while k >= 1:
                rolled = jnp.pad(buf, ((0, 0), (k, 0)))[:, :Wtot]
                buf = jnp.where((a[:, None] & k) != 0, rolled, buf)
                k //= 2
            r0 = offs >> shift_bits
            Wr = num_out_words // W
            out2d = jnp.zeros((Wr, W), dtype=jnp.uint32)
            for t in range(nrows):
                out2d = out2d.at[r0 + t].add(
                    buf[:, W * t : W * (t + 1)], mode="drop",
                    indices_are_sorted=True, unique_indices=uniq,
                )
            return s ^ out2d.sum(dtype=jnp.uint32) ^ total_bits.astype(jnp.uint32)

        nrows = -(-(Wb + 32) // 32)
        W64 = 32 * nrows
        a = ((offs >> 5) & 31).astype(jnp.int32)
        buf = jnp.concatenate(
            [shifted, jnp.zeros((B, W64 - (Wb + 1)), jnp.uint32)], axis=1
        )
        for k in (16, 8, 4, 2, 1):
            rolled = jnp.pad(buf, ((0, 0), (k, 0)))[:, :W64]
            buf = jnp.where((a[:, None] & k) != 0, rolled, buf)
        r0 = offs >> 10
        W32 = num_out_words // 32
        if variant == "set_then_sum":
            acc = None
            for t in range(nrows):
                o = jnp.zeros((W32, 32), dtype=jnp.uint32).at[r0 + t].set(
                    buf[:, 32 * t : 32 * (t + 1)], mode="drop",
                    indices_are_sorted=True, unique_indices=True,
                )
                acc = o if acc is None else acc | o
            out2d = acc
        else:
            uniq = variant == "add_sorted_unique"
            out2d = jnp.zeros((W32, 32), dtype=jnp.uint32)
            for t in range(nrows):
                out2d = out2d.at[r0 + t].add(
                    buf[:, 32 * t : 32 * (t + 1)], mode="drop",
                    indices_are_sorted=True, unique_indices=uniq,
                )
        return s ^ out2d.sum(dtype=jnp.uint32) ^ total_bits.astype(jnp.uint32)

    return body


def loop_time(body, k_lo=9, k_hi=65, reps=4):
    @partial(jax.jit, static_argnames=("k",))
    def run(seed, k):
        return jax.lax.fori_loop(0, k, body, seed)

    tot = {}
    for k in (k_lo, k_hi):
        int(run(jnp.uint32(1), k))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            int(run(jnp.uint32(1), k))
            best = min(best, time.perf_counter() - t0)
        tot[k] = best
    return (tot[k_hi] - tot[k_lo]) / (k_hi - k_lo)


for K in KS:
    for v in VARIANTS:
        t = loop_time(make_body(K, v))
        print(f"K={K:4d} {v:18s}: {t*1e6:8.1f}us  -> {N/t/1e9:.2f} GB/s",
              flush=True)
