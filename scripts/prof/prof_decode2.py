"""Decode staging variants, full pipeline, chain protocol.

V0: current — elementwise window gather words[base[:,None]+jj] + transpose.
V1: aligned row-takes — spans32 = words.reshape(S,32); 3x jnp.take rows
    (r, r+1, r+2) -> (B,96) window; same kernel at Wb=96, rel in [0,1024).
V2: direct-layout lax.gather — 3 gathers producing (G,32,8,128) with the
    window dim already in kernel position (no separate transpose).
Also: kernel-only at Wb=42 (rel<32) and Wb=96 (rel<1024) to size the
select-tree cost.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

import tpu_huffman as th
from tpu_huffman.ops.bitpack import words_from_bytes_np
from tpu_huffman.ops.pallas_decode import (
    LANES, _make_pallas_call, _use_interpret, structure_for,
)
from tpu_huffman import oracle

table = th.load_static_test_table()
struct = structure_for(table)
p32_flat = tuple(x for row in struct.p32 for x in row)
K = 128
N = 8 * 1024 * 1024
rng = np.random.default_rng(2024)
data_np = rng.integers(0, 256, size=N, dtype=np.uint8)

lens64 = table.lengths[data_np].astype(np.int64)
ends = np.cumsum(lens64)
n_blocks = -(-N // K)
starts_idx = np.arange(n_blocks) * K
offsets = np.zeros(n_blocks, dtype=np.int64)
offsets[1:] = ends[starts_idx[1:] - 1]

ot = oracle.OracleTable(table)
encoded = oracle.OracleEncoder(ot).encode(data_np.tobytes())
words_np, _ = words_from_bytes_np(encoded)

B = n_blocks
G = -(-B // LANES)
Bp = G * LANES
Wb = (K * table.max_len + 31) // 32 + 2  # 42
interp = _use_interpret()

# V0 setup
w0_np = np.concatenate([words_np, np.zeros(Wb + 2, np.uint32)])
base = np.zeros(Bp, np.int32); rel = np.zeros(Bp, np.int32); nsym = np.zeros(Bp, np.int32)
base[:B] = offsets >> 5; rel[:B] = offsets & 31; nsym[:B] = K
jw0 = jnp.asarray(w0_np)
jb = jnp.asarray(base)
jrel = jnp.asarray(rel.reshape(G, 8, 128))
jns = jnp.asarray(nsym.reshape(G, 8, 128))
call42 = _make_pallas_call(struct.intervals, p32_flat, K, Wb, G, interp)

# V1/V2 setup: 32-word rows
S = -(-(words_np.size) // 32) + 3
w1_np = np.zeros(S * 32, np.uint32); w1_np[: words_np.size] = words_np
jspans = jnp.asarray(w1_np.reshape(S, 32))
r_np = np.zeros(Bp, np.int32); rel2 = np.zeros(Bp, np.int32)
r_np[:B] = offsets >> 10
rel2[:B] = offsets & 1023
jr = jnp.asarray(r_np)
jrel2 = jnp.asarray(rel2.reshape(G, 8, 128))
call96 = _make_pallas_call(struct.intervals, p32_flat, K, 96, G, interp)


def chain(step, label):
    s = step(jnp.uint32(1))
    jax.block_until_ready(s)
    best = float("inf")
    for _ in range(3):
        s = jnp.uint32(1)
        t0 = time.perf_counter()
        for _ in range(6):
            s = step(s)
        jax.block_until_ready(s)
        best = min(best, (time.perf_counter() - t0) / 6)
    print(f"{label}: {best*1e3:.3f} ms ({N/best/1e9:.2f} GB/s)", flush=True)
    return best


@jax.jit
def v0(seed):
    w = jw0 ^ seed
    jj = lax.broadcasted_iota(jnp.int32, (1, Wb), 1)
    win = w[jb[:, None] + jj]
    win = win.reshape(G, 8, 128, Wb).transpose(0, 3, 1, 2)
    out, end, _bad = call42(win, jrel, jns)
    return seed ^ out.sum(dtype=jnp.uint32) ^ end.sum(dtype=jnp.int32).astype(jnp.uint32)


chain(v0, "V0 full (elementwise gather, Wb=42)")


@jax.jit
def v1(seed):
    s32 = jspans ^ seed
    a = jnp.take(s32, jr, axis=0)
    b = jnp.take(s32, jr + 1, axis=0)
    c = jnp.take(s32, jr + 2, axis=0)
    win = jnp.concatenate([a, b, c], axis=1)
    win = win.reshape(G, 8, 128, 96).transpose(0, 3, 1, 2)
    out, end, _bad = call96(win, jrel2, jns)
    return seed ^ out.sum(dtype=jnp.uint32) ^ end.sum(dtype=jnp.int32).astype(jnp.uint32)


chain(v1, "V1 full (3x row-take32 + transpose, Wb=96)")

dn = lax.GatherDimensionNumbers(
    offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,)
)


def g32(s32, idx):
    return lax.gather(
        s32, idx.reshape(G, 8, 128, 1), dn, slice_sizes=(1, 32),
        mode=lax.GatherScatterMode.CLIP,
    )


@jax.jit
def v2(seed):
    s32 = jspans ^ seed
    win = jnp.concatenate([g32(s32, jr), g32(s32, jr + 1), g32(s32, jr + 2)], axis=1)
    out, end, _bad = call96(win, jrel2, jns)
    return seed ^ out.sum(dtype=jnp.uint32) ^ end.sum(dtype=jnp.int32).astype(jnp.uint32)


chain(v2, "V2 full (3x direct-layout gather, Wb=96)")

# kernel-only costs
win42_0 = jnp.asarray(
    np.ascontiguousarray(
        w0_np[base[:, None] + np.arange(Wb)[None, :]]
        .reshape(G, 8, 128, Wb).transpose(0, 3, 1, 2)
    )
)


@jax.jit
def k42(seed):
    out, end, _bad = call42(win42_0 ^ seed, jrel, jns)
    return seed ^ out.sum(dtype=jnp.uint32) ^ end.sum(dtype=jnp.int32).astype(jnp.uint32)


chain(k42, "kernel only Wb=42")

win96_0 = jnp.asarray(
    np.ascontiguousarray(
        w1_np.reshape(S, 32)[r_np[:, None] + np.arange(3)[None, :]]
        .reshape(Bp, 96)
        .reshape(G, 8, 128, 96).transpose(0, 3, 1, 2)
    )
)


@jax.jit
def k96(seed):
    out, end, _bad = call96(win96_0 ^ seed, jrel2, jns)
    return seed ^ out.sum(dtype=jnp.uint32) ^ end.sum(dtype=jnp.int32).astype(jnp.uint32)


chain(k96, "kernel only Wb=96")

# correctness spot check: V1 path decodes to the original bytes
out, _, _bad = call96(
    jnp.asarray(win96_0), jrel2, jns
)
flat = (
    np.ascontiguousarray(
        np.asarray(out.reshape(G, K // 4, 8, 128).transpose(0, 2, 3, 1).reshape(Bp, K // 4))
    ).view(np.uint8).reshape(Bp, K)[:B]
)
got = flat.reshape(-1)[:N]
print("V1 bit-exact:", bool((got == data_np).all()), flush=True)
