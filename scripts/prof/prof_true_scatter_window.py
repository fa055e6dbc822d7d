"""Stitch row-scatter variants under the TRUE loop protocol.

The production stitch (ops/pallas_encode.py _encode_pipeline) ends with
nrows separate SW-wide row scatter-adds (index count nrows*B). XLA scatter
also supports multi-row update WINDOWS: one scatter of a (nrows, SW) patch
per block costs B indices for the same element traffic. This probe times,
at the production plan (K, SW=128), the pipeline through the barrel stage
plus each scatter variant:

  barrel    — everything before the scatter (baseline to subtract)
  rows      — production: nrows scatter-adds of (SW,) rows, nrows*B indices
  window    — ONE lax.scatter_add of (nrows, SW) patches, B indices
              (operand padded by nrows rows: whole-window drop semantics)
  window2   — two scatter-adds of (nrows/2, SW) patches, 2B indices

Usage: python prof_true_scatter_window.py [K ...]
"""
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

import tpu_huffman as th
from tpu_huffman.ops import pallas_encode as pe

table = th.load_static_test_table()
N = 8 * 1024 * 1024
rng = np.random.default_rng(2024)
symbols = jnp.asarray(rng.integers(0, 256, size=N, dtype=np.uint8))

KS = [int(a) for a in sys.argv[1:]] or [1024]
STAGES = ("barrel", "rows", "window", "window2")


def make_body(K, stage):
    p32t, lent, min_len, max_len, Wb, G, num_out_words = pe._plan(table, N, K)
    B = G * pe.LANES
    K4 = K // 4
    nsym = jnp.asarray(np.full(B, K, np.int32))
    pad_to = B * K
    interpret = pe._use_interpret()
    S = pe._sub_block(K, min_len, max_len)

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
        bt = bits.reshape(G, -1, 8, 128).sum(axis=1).reshape(B)
        offs, total_bits = pe._exclusive_cumsum_blocks(bt)
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
        if stage == "barrel":
            return s ^ buf.sum(dtype=jnp.uint32) ^ total_bits.astype(jnp.uint32)
        r0 = (offs >> (5 + SW.bit_length() - 1)).astype(jnp.int32)
        Wr = num_out_words // SW
        if stage == "rows":
            out2d = jnp.zeros((Wr, SW), dtype=jnp.uint32)
            for t in range(nrows):
                out2d = out2d.at[r0 + t].add(
                    buf[:, SW * t : SW * (t + 1)], mode="drop",
                    indices_are_sorted=True,
                )
            return s ^ out2d.sum(dtype=jnp.uint32) ^ total_bits.astype(jnp.uint32)
        dn = lax.ScatterDimensionNumbers(
            update_window_dims=(1, 2),
            inserted_window_dims=(),
            scatter_dims_to_operand_dims=(0,),
        )
        if stage == "window":
            out2d = jnp.zeros((Wr + nrows, SW), dtype=jnp.uint32)
            out2d = lax.scatter_add(
                out2d, r0[:, None], buf.reshape(B, nrows, SW), dn,
                indices_are_sorted=True, unique_indices=False,
                mode=lax.GatherScatterMode.FILL_OR_DROP,
            )
            return s ^ out2d.sum(dtype=jnp.uint32) ^ total_bits.astype(jnp.uint32)
        # window2: two scatters of (nrows/2, SW) patches
        h = nrows // 2
        out2d = jnp.zeros((Wr + nrows, SW), dtype=jnp.uint32)
        for t in range(0, nrows, h):
            out2d = lax.scatter_add(
                out2d, (r0 + t)[:, None],
                buf[:, SW * t : SW * (t + h)].reshape(B, h, SW), dn,
                indices_are_sorted=True, unique_indices=False,
                mode=lax.GatherScatterMode.FILL_OR_DROP,
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
    res = {}
    prev = None
    parts = []
    for stage in STAGES:
        res[stage] = loop_time(make_body(K, stage))
        d = "" if prev is None else f"(+{(res[stage]-res['barrel'])*1e6:6.1f})"
        parts.append(f"{stage}={res[stage]*1e6:7.1f}us{d}")
        prev = res[stage]
    print(f"K={K:4d}: " + "  ".join(parts), flush=True)
