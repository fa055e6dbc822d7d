"""TRUE device-time measurement via in-program fori_loop slope fit.

Finding (2026-08-18): every dispatched program on this rig costs ~2 ms of
host/tunnel overhead and a timed call pays a ~30 ms round trip, so the old
8-step dependency chains measured dispatch, not compute (a bare xor+sum of
8 MiB "measured" 2 ms/step; its true device time is 16 us = 527 GB/s).
The honest protocol: run the op k times inside ONE program with a
data-dependent carry (so the loop can't be hoisted), force completion with
a host read of the scalar result, and fit the slope between two large k.

Reports: floor (xor+sum), encode pipeline, decode pipeline @ 8 MiB.
"""
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

import tpu_huffman as th
from tpu_huffman.ops import pallas_encode as pe
from tpu_huffman.ops import pallas_decode as pd

table = th.load_static_test_table()
N = 8 * 1024 * 1024
rng = np.random.default_rng(2024)
symbols_np = rng.integers(0, 256, size=N, dtype=np.uint8)
symbols = jnp.asarray(symbols_np)

# ---------- encode setup (mirrors pallas_encode.encode_step) ----------
K = pe.pack_k(table)
p32t, lent, min_len, max_len, Wb, G, num_out_words = pe._plan(table, N, K)
B = G * pe.LANES
nsym_np = np.full(B, K, np.int32)
nsym_np[B - 1] = K  # N divides evenly here
nsym = jnp.asarray(nsym_np)
pad_to = B * K
interpret = pe._use_interpret()


def encode_body(syms_u8):
    padded = jnp.pad(syms_u8, (0, pad_to - N))
    syms_u32 = jax.lax.bitcast_convert_type(
        padded.reshape(-1, 4), jnp.uint32
    ).reshape(-1)
    words, total_bits, padded_bits, _bad, _offs = pe._encode_pipeline(
        syms_u32, nsym, jnp.uint32(0xFF), K, G, Wb, num_out_words,
        p32t, lent, min_len, max_len, interpret,
    )
    return words.sum(dtype=jnp.uint32) ^ total_bits.astype(jnp.uint32)


# ---------- decode setup (mirrors decode_indexed_pallas) ----------
enc, idx = th.encode_with_index(symbols_np.tobytes(), table)
Kd = idx.symbols_per_block
from tpu_huffman.ops.bitpack import words_from_bytes_np
words_np, _ = words_from_bytes_np(enc)
words_np = np.concatenate([words_np, np.zeros(2, np.uint32)])
Bd = idx.bit_offsets.size
Gd = -(-Bd // pd.LANES)
Bp = Gd * pd.LANES
Wbd = (Kd * table.max_len + 31) // 32 + 2
base_np = np.zeros(Bp, np.int32)
rel_np = np.zeros(Bp, np.int32)
nsd_np = np.zeros(Bp, np.int32)
off64 = idx.bit_offsets.astype(np.int64)
base_np[:Bd] = off64 >> 5
rel_np[:Bd] = off64 & 31
nsd_np[:Bd] = idx.n_symbols
struct = pd.structure_for(table)
dwords = jnp.asarray(words_np)
dbase = jnp.asarray(base_np)
drel = jnp.asarray(rel_np)
dnsym = jnp.asarray(nsd_np)
p32_flat = tuple(x for row in struct.p32 for x in row)
print(f"encode: K={K} Wb={Wb} G={G}; decode: K={Kd} Wb={Wbd} G={Gd}", flush=True)


def decode_body(w):
    out, end, _bad = pd._decode_pipeline(
        w, dbase, drel, dnsym, Kd, Wbd, Gd, struct.intervals, p32_flat,
        pd._use_interpret(),
    )
    return out.sum(dtype=jnp.uint32) ^ end.sum().astype(jnp.uint32)


@partial(jax.jit, static_argnames=("k", "what"))
def run(seed, k, what):
    def body(i, s):
        if what == "floor":
            return s ^ (symbols ^ s.astype(jnp.uint8)).sum(dtype=jnp.uint32)
        if what == "floor_dec":
            return s ^ (dwords ^ s).sum(dtype=jnp.uint32)
        if what == "encode":
            syms = symbols ^ s.astype(jnp.uint8)
            return s ^ encode_body(syms)
        if what == "decode":
            # Real data dependency; decoding xor-perturbed bits is fine for
            # timing (no data-dependent control flow in the kernel).
            w = dwords ^ s
            return s ^ decode_body(w)
        raise ValueError(what)

    return jax.lax.fori_loop(0, k, body, seed)


def measure(what, ks=(1, 65, 257)):
    tot = {}
    for k in ks:
        r = run(jnp.uint32(1), k, what)
        int(r)  # force completion
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            r = run(jnp.uint32(1), k, what)
            int(r)
            best = min(best, time.perf_counter() - t0)
        tot[k] = best
    k0, k1 = ks[-2], ks[-1]
    slope = (tot[k1] - tot[k0]) / (k1 - k0)
    print(
        f"{what:10s}: slope {slope*1e6:9.2f} us/iter "
        f"({N/slope/1e9:8.2f} GB/s)   totals "
        + " ".join(f"k={k}:{tot[k]*1e3:.1f}ms" for k in ks),
        flush=True,
    )
    return slope


measure("floor")
e = measure("encode")
d = measure("decode")
print(f"combined (1 MB each way): {2*N/ (e+d) /1e9:.2f} GB/s", flush=True)
