"""Sweep the self-re-anchor intervals on the DEEP (5-30 bit) table.

Round-1 left both kernels' re-anchor interval at S=64 (tuned on the
static 5-10-bit table). On a 5-30-bit table the per-symbol select window
spans ~(31 + il*(mx))/32 - il*mn/32 words, so by il=63 a window is ~50
words wide — the dominant term of both kernels. Smaller S bounds the
windows at the cost of more barrel rolls. Loop-protocol timing
(MEASURING.md) of the full pipelines per S.

Usage: python scripts/prof/prof_true_deep_s.py [mb]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

import tpu_huffman as th
from bench_suite import mixed_lengths_5_30, _loop_time
from tpu_huffman.ops import pallas_decode as pd
from tpu_huffman.ops import pallas_encode as pe
from tpu_huffman.ops.bitpack import words_from_bytes_np
from tpu_huffman.ops.decode import BlockIndex
from tpu_huffman import oracle

MB = float(sys.argv[1]) if len(sys.argv) > 1 else 8.0
n = int(MB * (1 << 20))

t530 = th.make_canonical(mixed_lengths_5_30(), name="mixed_5_30")
rng = np.random.default_rng(3)
lens = t530.lengths.astype(np.float64)
w = np.where(lens > 0, 2.0 ** -lens, 0.0)
w /= w.sum()
data_np = rng.choice(256, size=n, p=w).astype(np.uint8)
data = data_np.tobytes()
symbols = jnp.asarray(data_np)

ot = oracle.OracleTable(t530)
encoded = oracle.OracleEncoder(ot).encode(data)
print(f"corpus {MB} MiB, ratio {len(encoded)/n:.3f}", flush=True)

# ---------------- encode: sweep pack sub-block S ----------------
orig_sub = pe._sub_block
for S in (8, 16, 32, 64):
    pe._sub_block = lambda K, mn, mx, _s=S: (_s if K % _s == 0 else orig_sub(K, mn, mx))
    pe._make_pack_call.cache_clear()
    pe._encode_pipeline.clear_cache()
    encode_fn, fin = pe.encode_step(t530, n)

    def enc_body(i, carry):
        sym = symbols ^ carry.astype(jnp.uint8)
        words, total_bits, padded_bits = encode_fn(sym)
        return carry ^ words.sum(dtype=jnp.uint32) ^ total_bits.astype(jnp.uint32)

    dt = _loop_time(enc_body)
    print(f"encode S={S}: {dt*1e6:.0f} us -> {n/dt/1e9:.2f} GB/s", flush=True)
pe._sub_block = orig_sub
pe._make_pack_call.cache_clear()
pe._encode_pipeline.clear_cache()

# ---------------- decode: sweep anchor interval S ----------------
K = 512
lens64 = t530.lengths[data_np].astype(np.int64)
ends = np.cumsum(lens64)
B = -(-n // K)
offsets = np.zeros(B, np.int64)
starts_idx = np.arange(B) * K
offsets[1:] = ends[starts_idx[1:] - 1]
n_sym = np.full(B, K, np.int32)
n_sym[-1] = n - (B - 1) * K
index = BlockIndex(K, offsets, n_sym, n, int(ends[-1]))
Wb = pd.plan_wb(index, t530)
words_np, _ = words_from_bytes_np(encoded)
words_np = np.concatenate([words_np, np.zeros(2, np.uint32)])
G = -(-B // pd.LANES)
Bp = G * pd.LANES
base = np.zeros(Bp, np.int32); rel = np.zeros(Bp, np.int32); nsm = np.zeros(Bp, np.int32)
base[:B] = offsets >> 5; rel[:B] = offsets & 31; nsm[:B] = n_sym
jw, jb, jr, jn = map(jnp.asarray, (words_np, base, rel, nsm))
iv, aux = pd.decode_dispatch(t530)
interp = pd._use_interpret()

orig_anchor = pd._anchor_interval
for S in (8, 16, 32, 64):
    pd._anchor_interval = lambda K_, mn, mx, _s=S: (_s if K_ % _s == 0 else orig_anchor(K_, mn, mx))
    pd._make_pallas_call.cache_clear()
    pd._decode_pipeline.clear_cache()

    def dec_body(i, carry):
        w2 = jw ^ carry
        out, end, bad = pd._decode_pipeline(w2, jb, jr, jn, K, Wb, G, iv, aux, interp)
        return carry ^ out.sum(dtype=jnp.uint32) ^ end.sum(dtype=jnp.int32).astype(jnp.uint32) ^ bad.astype(jnp.uint32)

    dt = _loop_time(dec_body)
    print(f"decode S={S}: {dt*1e6:.0f} us -> {n/dt/1e9:.2f} GB/s", flush=True)
pd._anchor_interval = orig_anchor
