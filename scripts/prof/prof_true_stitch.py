"""Fine-grained stage split of the encode STITCH (everything after the
pack kernel) under the TRUE in-program loop protocol. Mirrors the
production pipeline (ops/pallas_encode.py _encode_pipeline) stage by
stage. Cumulative stages:

  pack     — staging + pack kernel
  relayout — + rows (G,Wb,8,128) -> (B,Wb) transpose + sub-bits transpose
  cumsum   — + hierarchical sub-block prefix sum
  funnel   — + bit-level funnel shift to (B, Wb+1)
  barrel   — + 7-stage word-level barrel roll to (B, SW*nrows), SW=128
  scatter  — + nrows 128-wide row scatter-adds (production minus eos pad)
  full     — entire production pipeline

Usage: python prof_true_stitch.py [K ...]
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

KS = [int(a) for a in sys.argv[1:]] or [1024]
STAGES = ("pack", "relayout", "cumsum", "funnel", "barrel", "scatter", "full")


def make_body(K, stage):
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
        if stage == "full":
            words, tb, pb, bad_any, _offs = pe._encode_pipeline(
                syms_u32, nsym, jnp.uint32(0xFF), K, G, Wb, num_out_words,
                p32t, lent, min_len, max_len, interpret,
            )
            return s ^ words.sum(dtype=jnp.uint32) ^ tb.astype(jnp.uint32)
        staged = syms_u32.reshape(G, 8, 128, K4).transpose(0, 3, 1, 2)
        rows, bits, bad = pe._make_pack_call(
            p32t, lent, K, Wb, G, min_len, max_len, interpret, S
        )(staged, nsym.reshape(G, 8, 128))
        if stage == "pack":
            return s ^ rows.sum(dtype=jnp.uint32) ^ bits.sum().astype(jnp.uint32)
        rows2 = rows.reshape(G, Wb, 8, 128).transpose(0, 2, 3, 1).reshape(B, Wb)
        bits_sub = bits.reshape(G, nsub, 8, 128).transpose(0, 2, 3, 1).reshape(B * nsub)
        if stage == "relayout":
            return s ^ rows2.sum(dtype=jnp.uint32) ^ bits_sub.sum().astype(jnp.uint32)
        offs_sub, total_bits = pe._exclusive_cumsum_blocks(bits_sub)
        offs = offs_sub[::nsub] if nsub > 1 else offs_sub
        if stage == "cumsum":
            return (
                s ^ rows2.sum(dtype=jnp.uint32)
                ^ offs.sum().astype(jnp.uint32) ^ total_bits.astype(jnp.uint32)
            )
        rel = (offs & 31).astype(jnp.uint32)
        rows_ext = jnp.concatenate([rows2, jnp.zeros((B, 1), jnp.uint32)], axis=1)
        prev = jnp.concatenate([jnp.zeros((B, 1), jnp.uint32), rows2], axis=1)
        shifted = (rows_ext >> rel[:, None]) | (
            (prev << ((jnp.uint32(31) - rel[:, None]))) << jnp.uint32(1)
        )
        if stage == "funnel":
            return s ^ shifted.sum(dtype=jnp.uint32) ^ total_bits.astype(jnp.uint32)
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
        r0 = offs >> (5 + SW.bit_length() - 1)
        Wr = num_out_words // SW
        out2d = jnp.zeros((Wr, SW), dtype=jnp.uint32)
        for t in range(nrows):
            out2d = out2d.at[r0 + t].add(
                buf[:, SW * t : SW * (t + 1)], mode="drop",
                indices_are_sorted=True,
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
    prev = 0.0
    parts = []
    for stage in STAGES:
        res[stage] = loop_time(make_body(K, stage))
        parts.append(f"{stage}={res[stage]*1e6:7.1f}us(+{(res[stage]-prev)*1e6:6.1f})")
        prev = res[stage]
    print(f"K={K:4d}: " + "  ".join(parts), flush=True)
    print(f"        full -> {N/res['full']/1e9:.2f} GB/s", flush=True)
