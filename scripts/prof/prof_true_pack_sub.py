"""Re-anchored pack kernel (sub-block merge) vs single-anchor: bit-exact
check + TRUE-loop timing of the pack call alone at K=256.

Usage: python prof_true_pack_sub.py [S ...]   (0 = single anchor)
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
K = 256
rng = np.random.default_rng(2024)
symbols_np = rng.integers(0, 256, size=N, dtype=np.uint8)
symbols = jnp.asarray(symbols_np)

SS = [int(a) for a in sys.argv[1:]] or [0, 32, 64, 128]

p32t, lent, min_len, max_len, Wb, G, num_out_words = pe._plan(table, N, K)
B = G * pe.LANES
K4 = K // 4
nsym_np = np.full(B, 0, np.int32)
full = N // K
nsym_np[:full] = K
if N % K:
    nsym_np[full] = N % K
nsym = jnp.asarray(nsym_np)
pad_to = B * K
interpret = pe._use_interpret()

padded = np.zeros(pad_to, np.uint8)
padded[:N] = symbols_np
syms_u32_np = padded.view("<u4")
staged_np = syms_u32_np.reshape(G, 8, 128, K4).transpose(0, 3, 1, 2)
staged = jnp.asarray(np.ascontiguousarray(staged_np))
nsym_r = nsym.reshape(G, 8, 128)

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


for S in SS:
    Sarg = None if S == 0 else S
    call = pe._make_pack_call(
        p32t, lent, K, Wb, G, min_len, max_len, interpret, Sarg
    )

    def body(i, s, call=call):
        st = staged ^ s
        rows, bits, bad = call(st, nsym_r)
        return s ^ rows.sum(dtype=jnp.uint32) ^ bits.sum().astype(jnp.uint32)

    t = loop_time(body)
    print(f"S={S:4d}: pack {t*1e6:8.1f}us  -> {N/t/1e9:.2f} GB/s", flush=True)

# ---- correctness AFTER the clocks stop (big D2H transfers degrade all
# later dispatches in this process, MEASURING.md) --------------------------
ref = None
for S in SS:
    Sarg = None if S == 0 else S
    rows, bits, bad = pe._make_pack_call(
        p32t, lent, K, Wb, G, min_len, max_len, interpret, Sarg
    )(staged, nsym_r)
    got = (np.asarray(rows), np.asarray(bits))
    if ref is None:
        ref = got
    else:
        assert np.array_equal(ref[0], got[0]), f"rows mismatch S={S}"
        assert np.array_equal(ref[1], got[1]), f"bits mismatch S={S}"
        print(f"S={S}: bit-exact vs single-anchor", flush=True)
