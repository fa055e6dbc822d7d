"""Full encode-pipeline K sweep under the TRUE in-program loop protocol.

The stitch scatter's index count is 2*B = 2*N/K, so bigger blocks amortize
it; the pack kernel's cost is ~linear in K once the S=64 re-anchor bounds
the select windows. Usage: python prof_true_encode_k.py [K ...]
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

KS = [int(a) for a in sys.argv[1:]] or [256, 384, 512]


def make_body(K):
    enc, _ = pe.encode_step(table, N, K=K)

    def body(i, s):
        syms = symbols ^ s.astype(jnp.uint8)
        words, tb, pb = enc(syms)
        return s ^ words.sum(dtype=jnp.uint32) ^ tb.astype(jnp.uint32)

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
    t = loop_time(make_body(K))
    print(f"K={K:4d}: {t*1e6:7.1f} us  -> {N/t/1e9:.2f} GB/s", flush=True)
