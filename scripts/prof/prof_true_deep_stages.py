"""Stage split of BOTH pipelines on the deep (5-30 bit) table, 8 MiB.

Loop-protocol timing of progressively longer prefixes of each pipeline,
so stage cost = difference between consecutive rows. Run AFTER
prof_true_deep_s.py settled S; this tells WHERE the deep-table time goes
(BASELINE config 3 is less than half the static-table number).
"""

import sys

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

n = 8 << 20
t530 = th.make_canonical(mixed_lengths_5_30(), name="mixed_5_30")
rng = np.random.default_rng(3)
lens = t530.lengths.astype(np.float64)
w = np.where(lens > 0, 2.0 ** -lens, 0.0); w /= w.sum()
data_np = rng.choice(256, size=n, p=w).astype(np.uint8)
symbols = jnp.asarray(data_np)
ot = oracle.OracleTable(t530)
encoded = oracle.OracleEncoder(ot).encode(data_np.tobytes())

# ---------------- encode stages ----------------
K = pe.pack_k(t530)
p32t, lent, mn, mx, Wb, G, now = pe._plan(t530, n, K)
B = G * pe.LANES
S = pe._sub_block(K, mn, mx)
nsub = K // S
nsym_np = np.zeros(B, np.int32)
full = n // K
nsym_np[:full] = K
if n % K:
    nsym_np[full] = n % K
nsym = jnp.asarray(nsym_np).reshape(G, 8, 128)
pad_to = B * K
print(f"encode: K={K} S={S} Wb={Wb} G={G} now={now}", flush=True)

import functools

@functools.partial(jax.jit, static_argnames=("stage",))
def enc_stage(carry, stage):
    sym = symbols ^ carry.astype(jnp.uint8)
    padded = jnp.pad(sym, (0, pad_to - n))
    syms_u32 = jax.lax.bitcast_convert_type(padded.reshape(-1, 4), jnp.uint32).reshape(-1)
    staged = syms_u32.reshape(G, 8, 128, K // 4).transpose(0, 3, 1, 2)
    rows, bits, bad = pe._make_pack_call(p32t, lent, K, Wb, G, mn, mx, False, S)(staged, nsym)
    if stage == "pack":
        return carry ^ rows.sum(dtype=jnp.uint32) ^ bits.sum().astype(jnp.uint32)
    rows2 = rows.reshape(G, Wb, 8, 128).transpose(0, 2, 3, 1).reshape(B, Wb)
    bits4 = bits.reshape(G, nsub, 8, 128)
    bt = bits4.sum(axis=1).reshape(B)
    offs, total_bits = pe._exclusive_cumsum_blocks(bt, mxu_inner=(128 * K * mx <= 1 << 24))
    if stage == "cumsum":
        return carry ^ rows2.sum(dtype=jnp.uint32) ^ offs.sum().astype(jnp.uint32)
    rel = (offs & 31).astype(jnp.uint32)
    rows_ext = jnp.concatenate([rows2, jnp.zeros((B, 1), jnp.uint32)], axis=1)
    prev = jnp.concatenate([jnp.zeros((B, 1), jnp.uint32), rows2], axis=1)
    shifted = (rows_ext >> rel[:, None]) | ((prev << ((jnp.uint32(31) - rel[:, None]))) << jnp.uint32(1))
    SW = pe.STITCH_SW
    nrows = -(-(Wb + SW) // SW)
    Wtot = SW * nrows
    a = ((offs >> 5) & (SW - 1)).astype(jnp.int32)
    buf = jnp.concatenate([shifted, jnp.zeros((B, Wtot - (Wb + 1)), jnp.uint32)], axis=1)
    k = SW // 2
    while k >= 1:
        rolled = jnp.pad(buf, ((0, 0), (k, 0)))[:, :Wtot]
        buf = jnp.where((a[:, None] & k) != 0, rolled, buf)
        k //= 2
    if stage == "barrel":
        return carry ^ buf.sum(dtype=jnp.uint32) ^ total_bits.astype(jnp.uint32)
    r0 = offs >> (5 + SW.bit_length() - 1)
    Wr = now // SW
    out2d = jnp.zeros((Wr, SW), dtype=jnp.uint32)
    for t in range(nrows):
        out2d = out2d.at[r0 + t].add(buf[:, SW * t : SW * (t + 1)], mode="drop", indices_are_sorted=True)
    return carry ^ out2d.sum(dtype=jnp.uint32) ^ total_bits.astype(jnp.uint32)

for stage in ("pack", "cumsum", "barrel", "full"):
    dt = _loop_time(lambda i, c, _s=stage: enc_stage(c, _s))
    print(f"encode through {stage}: {dt*1e6:.0f} us", flush=True)

# ---------------- decode stages ----------------
K = 512
lens64 = t530.lengths[data_np].astype(np.int64)
ends = np.cumsum(lens64)
Bq = -(-n // K)
offsets = np.zeros(Bq, np.int64)
offsets[1:] = ends[np.arange(1, Bq) * K - 1]
n_sym = np.full(Bq, K, np.int32); n_sym[-1] = n - (Bq - 1) * K
index = BlockIndex(K, offsets, n_sym, n, int(ends[-1]))
Wbd = pd.plan_wb(index, t530)
words_np, _ = words_from_bytes_np(encoded)
words_np = np.concatenate([words_np, np.zeros(2, np.uint32)])
Gd = -(-Bq // pd.LANES); Bp = Gd * pd.LANES
base = np.zeros(Bp, np.int32); rel = np.zeros(Bp, np.int32); nsm = np.zeros(Bp, np.int32)
base[:Bq] = offsets >> 5; rel[:Bq] = offsets & 31; nsm[:Bq] = n_sym
jw, jb, jr, jn = map(jnp.asarray, (words_np, base, rel, nsm))
iv, aux = pd.decode_dispatch(t530)
NR = pd._rows_for(Wbd)
RW = pd.STAGE_RW
print(f"decode: K={K} Wb={Wbd} NR={NR} G={Gd}", flush=True)

@functools.partial(jax.jit, static_argnames=("stage",))
def dec_stage(carry, stage):
    w2 = jw ^ carry
    Sx = -(-w2.shape[0] // RW) + NR
    spans = jnp.pad(w2, (0, Sx * RW - w2.shape[0])).reshape(Sx, RW)
    r = jb // RW
    rel2 = ((jb % RW) << 5) + jr
    win = jnp.concatenate(
        [spans.at[r + t].get(mode="clip", indices_are_sorted=True) for t in range(NR)],
        axis=1,
    )
    if stage == "rowtake":
        return carry ^ win.sum(dtype=jnp.uint32)
    win = win.reshape(Gd, 8, 128, NR * RW).transpose(0, 3, 1, 2)
    if stage == "transpose":
        return carry ^ win.sum(dtype=jnp.uint32)
    out, end, bad = pd._make_pallas_call(iv, aux, K, Wbd, Gd, False)(
        win, rel2.reshape(Gd, 8, 128), jn.reshape(Gd, 8, 128)
    )
    if stage == "kernel":
        return carry ^ out.sum(dtype=jnp.uint32) ^ end.sum().astype(jnp.uint32)
    out = out.reshape(Gd, K // 4, 8, 128).transpose(0, 2, 3, 1).reshape(Gd * pd.LANES, K // 4)
    return carry ^ out.sum(dtype=jnp.uint32) ^ end.sum().astype(jnp.uint32) ^ jnp.any(bad > 0).astype(jnp.uint32)

for stage in ("rowtake", "transpose", "kernel", "full"):
    dt = _loop_time(lambda i, c, _s=stage: dec_stage(c, _s))
    print(f"decode through {stage}: {dt*1e6:.0f} us", flush=True)
print("done", flush=True)
