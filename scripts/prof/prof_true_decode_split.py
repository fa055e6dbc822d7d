"""Decode pipeline stage split under the TRUE in-program loop protocol.

Cumulative: staging (row-takes + relayout) vs full (staging + kernel +
output untangle). Usage: python prof_true_decode_split.py [K ...]
"""
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

import tpu_huffman as th
from tpu_huffman.ops import pallas_decode as pd
from tpu_huffman.ops.bitpack import words_from_bytes_np

table = th.load_static_test_table()
N = 8 * 1024 * 1024
rng = np.random.default_rng(2024)
data_np = rng.integers(0, 256, size=N, dtype=np.uint8)

struct = pd.structure_for(table)
p32_flat = tuple(x for row in struct.p32 for x in row)
lens64 = table.lengths[data_np].astype(np.int64)
ends = np.cumsum(lens64)

KS = [int(a) for a in sys.argv[1:]] or [256]


def setup(K):
    n_blocks = -(-N // K)
    starts_idx = np.arange(n_blocks) * K
    offsets = np.zeros(n_blocks, dtype=np.int64)
    offsets[1:] = ends[starts_idx[1:] - 1]
    total_words = int(ends[-1] + 31) // 32 + 2
    words_np = rng.integers(0, 1 << 32, size=total_words, dtype=np.uint64).astype(
        np.uint32
    )
    B = n_blocks
    G = -(-B // pd.LANES)
    Bp = G * pd.LANES
    Wb = (K * table.max_len + 31) // 32 + 2
    base = np.zeros(Bp, np.int32)
    rel = np.zeros(Bp, np.int32)
    nsym = np.zeros(Bp, np.int32)
    base[:B] = offsets >> 5
    rel[:B] = offsets & 31
    nsym[:B] = K
    nsym[B - 1] = N - (B - 1) * K
    return (
        jnp.asarray(words_np), jnp.asarray(base), jnp.asarray(rel),
        jnp.asarray(nsym), K, Wb, G,
    )


def make_body(K, stage):
    jw, jb, jr, jn, K, Wb, G = setup(K)
    NR = pd._rows_for(Wb)
    interp = pd._use_interpret()

    @partial(jax.jit, static_argnames=())
    def staging_only(w):
        S = -(-w.shape[0] // 32) + NR
        spans = jnp.pad(w, (0, S * 32 - w.shape[0])).reshape(S, 32)
        r = jb >> 5
        win = jnp.concatenate(
            [spans.at[r + t].get(mode="clip", indices_are_sorted=True) for t in range(NR)],
            axis=1,
        )
        win = win.reshape(G, 8, 128, NR * 32).transpose(0, 3, 1, 2)
        return win

    def body(i, carry):
        w = jw ^ carry
        if stage == "staging":
            return carry ^ staging_only(w).sum(dtype=jnp.uint32)
        out, end, _bad = pd._decode_pipeline(
            w, jb, jr, jn, K, Wb, G, struct.intervals, p32_flat, interp
        )
        return carry ^ out.sum(dtype=jnp.uint32) ^ end.sum(dtype=jnp.int32).astype(jnp.uint32)

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
    ts = loop_time(make_body(K, "staging"))
    tf = loop_time(make_body(K, "full"))
    print(
        f"K={K:4d}: staging={ts*1e6:7.1f}us  full={tf*1e6:7.1f}us "
        f"(kernel+untangle={1e6*(tf-ts):7.1f})  -> {N/tf/1e9:.2f} GB/s",
        flush=True,
    )
