"""Stage split of the encode pipeline under the TRUE (in-program loop)
protocol, at several K. Stages are cumulative:

  stage0  — xor + staging (pad, bitcast, reshape, transpose) + sum
  pack    — + Pallas pack kernel
  cumsum  — + rows un-transpose + hierarchical block prefix sum
  full    — entire production pipeline (funnel, barrel, row scatters, pad)

Usage: python prof_true_split.py [K ...]
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

KS = [int(a) for a in sys.argv[1:]] or [64, 128, 256, 512]


def make_body(K, stage):
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
        if stage == "stage0":
            return s ^ staged.sum(dtype=jnp.uint32)
        rows, bits, bad = pe._make_pack_call(
            p32t, lent, K, Wb, G, min_len, max_len, interpret
        )(staged, nsym.reshape(G, 8, 128))
        if stage == "pack":
            return s ^ rows.sum(dtype=jnp.uint32) ^ bits.sum().astype(jnp.uint32)
        rows2 = rows.reshape(G, Wb, 8, 128).transpose(0, 2, 3, 1).reshape(B, Wb)
        bits_flat = bits.reshape(B)
        offs, total_bits = pe._exclusive_cumsum_blocks(bits_flat)
        if stage == "cumsum":
            return (
                s
                ^ rows2.sum(dtype=jnp.uint32)
                ^ offs.sum().astype(jnp.uint32)
                ^ total_bits.astype(jnp.uint32)
            )
        words, tb, pb, bad_any, _offs = pe._encode_pipeline(
            syms_u32, nsym, jnp.uint32(0xFF), K, G, Wb, num_out_words,
            p32t, lent, min_len, max_len, interpret,
        )
        return s ^ words.sum(dtype=jnp.uint32) ^ tb.astype(jnp.uint32)

    return body


def loop_time(body, k_lo=9, k_hi=65, reps=3):
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


STAGES = ("stage0", "pack", "cumsum", "full")
for K in KS:
    res = {}
    for stage in STAGES:
        res[stage] = loop_time(make_body(K, stage))
    line = f"K={K:4d}: " + "  ".join(
        f"{st}={res[st]*1e6:8.1f}us" for st in STAGES
    )
    line += f"  -> full {N/res['full']/1e9:.2f} GB/s"
    print(line, flush=True)
