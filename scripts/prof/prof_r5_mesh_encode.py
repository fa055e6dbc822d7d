"""Mesh-encode overhead on the 1-chip mesh (VERDICT r4 #6).

Round 4 recorded the single-chip-mesh overhead for DECODE only (284 vs
271 us/8 MiB). This is the encode twin: the MeshCodec shard program +
stitch vs the plain single-chip encode pipeline, interleaved in one
sampling window (both bodies see the same rig periods). Config 5's real
N>=2-host scaling stays unmeasurable on this 1-chip rig; this datum is
the measurable proxy for the mesh encode path's fixed overhead
(reference anchor: the ordered-assembly contract,
/root/reference/source/huffman_testing.c:75-173).

Usage: python scripts/prof/prof_r5_mesh_encode.py [window_s]
"""
import sys
import time
from functools import partial

sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import tpu_huffman as th  # noqa: E402
from tpu_huffman.shard import MeshCodec, default_mesh, _bucket_pow2, _stitch_kernel  # noqa: E402
from tpu_huffman.ops import pallas_encode as pe  # noqa: E402

WINDOW = float(sys.argv[1]) if len(sys.argv) > 1 else 120.0
table = th.load_static_test_table()
N = 8 << 20
rng = np.random.default_rng(11)
data_np = rng.integers(0, 256, size=N, dtype=np.uint8)
symbols = jnp.asarray(data_np)

mc = MeshCodec(table, default_mesh())
ndev = mc._ndev
per_dev = _bucket_pow2(-(-N // ndev), mc.block_symbols)
total_padded = per_dev * ndev
padded_np = np.zeros(total_padded, np.uint8)
padded_np[:N] = data_np
n_valid = np.minimum(
    np.maximum(N - per_dev * np.arange(ndev, dtype=np.int64), 0), per_dev
).astype(np.int32)
shard_fn = mc._encode_sharded_fn(per_dev, False)
padded_j = jnp.asarray(padded_np)
nv_j = jnp.asarray(n_valid)
num_words = (N * int(table.max_len)) // 32 + 2
print(f"ndev={ndev} per_dev={per_dev}", flush=True)


def mesh_body(i, carry):
    sym = padded_j ^ carry.astype(jnp.uint8)
    words, local_bits, word_bases, bad = shard_fn(sym, nv_j)[:4]
    out = _stitch_kernel(
        words.reshape(ndev, -1), word_bases.reshape(-1).astype(jnp.int32),
        num_out_words=num_words,
    )
    return (
        carry ^ out.sum(dtype=jnp.uint32)
        ^ local_bits.sum().astype(jnp.uint32)
        ^ bad.sum().astype(jnp.uint32)
    )


# Non-mesh comparator at the SAME plan conditions (static bound, no span
# hints — the mesh shard program plans without hints too).
enc_fn, _fin = pe.encode_step(table, N)


def single_body(i, carry):
    sym = symbols ^ carry.astype(jnp.uint8)
    words, total_bits, padded_bits = enc_fn(sym)
    return carry ^ words.sum(dtype=jnp.uint32) ^ total_bits.astype(jnp.uint32)


# correctness first: mesh bytes == single-chip bytes == reference
enc_mesh, _ = mc.encode(data_np.tobytes())
assert enc_mesh == th.encode(data_np.tobytes(), table), "mesh != single"
print("mesh bytes == single-chip bytes: True", flush=True)

runs = []
for body in (single_body, mesh_body):
    @partial(jax.jit, static_argnames=("k",))
    def run(seed, k, body=body):
        return jax.lax.fori_loop(0, k, body, seed)

    runs.append(run)
K_LO, K_HI = 9, 49
names = ("single", "mesh")
for nm, run in zip(names, runs):
    for k in (K_LO, K_HI):
        t0 = time.perf_counter()
        int(run(jnp.uint32(1), k))
        print(f"warm {nm}@{k}: {time.perf_counter() - t0:.1f}s", flush=True)
tl = [float("inf")] * 2
th_ = [float("inf")] * 2
t_end = time.perf_counter() + WINDOW
while time.perf_counter() < t_end:
    for i, run in enumerate(runs):
        t0 = time.perf_counter()
        int(run(jnp.uint32(1), K_HI))
        h = time.perf_counter() - t0
        t0 = time.perf_counter()
        int(run(jnp.uint32(1), K_LO))
        low = time.perf_counter() - t0
        th_[i] = min(th_[i], h)
        tl[i] = min(tl[i], low)
res = {}
for nm, h, low in zip(names, th_, tl):
    us = (h - low) / (K_HI - K_LO) * 1e6
    res[nm] = us
    print(f"{nm}: {us:.0f} us/8MiB ({N / (us / 1e6) / 1e9:.2f} GB/s)", flush=True)
print(f"mesh overhead: {res['mesh'] / res['single'] - 1:+.1%}", flush=True)
