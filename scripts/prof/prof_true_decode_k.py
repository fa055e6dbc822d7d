"""Decode-pipeline K (index granularity) sweep under the TRUE in-program
fori_loop slope protocol (MEASURING.md §1, revised 2026-08-18). The old
prof_decode_k.py used the per-dispatch chain protocol, which measures
dispatch overhead, not compute — its 4.2-4.4 ms numbers were ~6x inflated.

Usage: python prof_true_decode_k.py [K ...]
"""
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

import tpu_huffman as th
from tpu_huffman.ops.bitpack import words_from_bytes_np
from tpu_huffman.ops.pallas_decode import (
    LANES, _decode_pipeline, _use_interpret, structure_for, supports,
)
from tpu_huffman import oracle

table = th.load_static_test_table()
struct = structure_for(table)
p32_flat = tuple(x for row in struct.p32 for x in row)
N = 8 * 1024 * 1024
rng = np.random.default_rng(2024)
data_np = rng.integers(0, 256, size=N, dtype=np.uint8)

lens64 = table.lengths[data_np].astype(np.int64)
ends = np.cumsum(lens64)
ot = oracle.OracleTable(table)
encoded = oracle.OracleEncoder(ot).encode(data_np.tobytes())
words_np, _ = words_from_bytes_np(encoded)
words_np = np.concatenate([words_np, np.zeros(2, np.uint32)])
jw = jnp.asarray(words_np)
interp = _use_interpret()

KS = [int(a) for a in sys.argv[1:]] or [128, 256, 384, 512, 768, 1024]


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


for K in KS:
    if not supports(table, K):
        print(f"K={K:4d}: unsupported")
        continue
    n_blocks = -(-N // K)
    starts_idx = np.arange(n_blocks) * K
    offsets = np.zeros(n_blocks, dtype=np.int64)
    offsets[1:] = ends[starts_idx[1:] - 1]
    B = n_blocks
    G = -(-B // LANES)
    Bp = G * LANES
    Wb = (K * table.max_len + 31) // 32 + 2
    base = np.zeros(Bp, np.int32)
    rel = np.zeros(Bp, np.int32)
    nsym = np.zeros(Bp, np.int32)
    base[:B] = offsets >> 5
    rel[:B] = offsets & 31
    nsym[:B] = K
    nsym[B - 1] = N - (B - 1) * K
    jb, jr, jn = map(jnp.asarray, (base, rel, nsym))

    def body(i, carry, jb=jb, jr=jr, jn=jn, K=K, Wb=Wb, G=G):
        out, end, _bad = _decode_pipeline(
            jw ^ carry, jb, jr, jn, K, Wb, G, struct.intervals, p32_flat,
            interp,
        )
        return (
            carry
            ^ out.sum(dtype=jnp.uint32)
            ^ end.sum(dtype=jnp.int32).astype(jnp.uint32)
        )

    t = loop_time(body)
    print(f"K={K:4d}: {t*1e6:8.1f}us  -> {N/t/1e9:.2f} GB/s", flush=True)
