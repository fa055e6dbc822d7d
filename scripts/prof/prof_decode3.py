"""Chain-time the production _decode_pipeline (post row-take/barrel/bounded
rework) at 8 MiB, K=128. MEASURING.md protocol."""
import time
import numpy as np
import jax
import jax.numpy as jnp

import tpu_huffman as th
from tpu_huffman.ops.bitpack import words_from_bytes_np
from tpu_huffman.ops.pallas_decode import (
    LANES, _decode_pipeline, _use_interpret, structure_for,
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
Wb = (K * table.max_len + 31) // 32 + 2
base = np.zeros(Bp, np.int32); rel = np.zeros(Bp, np.int32); nsym = np.zeros(Bp, np.int32)
base[:B] = offsets >> 5; rel[:B] = offsets & 31; nsym[:B] = K
jw = jnp.asarray(words_np)
jb, jr, jn = map(jnp.asarray, (base, rel, nsym))
interp = _use_interpret()


@jax.jit
def step(seed):
    out, end, _bad = _decode_pipeline(
        jw ^ seed, jb, jr, jn, K, Wb, G, struct.intervals, p32_flat, interp
    )
    return seed ^ out.sum(dtype=jnp.uint32) ^ end.sum(dtype=jnp.int32).astype(jnp.uint32)


s = step(jnp.uint32(0))
jax.block_until_ready(s)
best = float("inf")
for _ in range(3):
    s = jnp.uint32(0)
    t0 = time.perf_counter()
    for _ in range(8):
        s = step(s)
    jax.block_until_ready(s)
    best = min(best, (time.perf_counter() - t0) / 8)
print(f"decode pipeline v2: {best*1e3:.3f} ms ({N/best/1e9:.2f} GB/s)", flush=True)

# correctness (after clocks): seed=0 path decodes to original bytes
out, _, _bad = _decode_pipeline(
    jw, jb, jr, jn, K, Wb, G, struct.intervals, p32_flat, interp
)
flat = np.ascontiguousarray(np.asarray(out)).view(np.uint8).reshape(Bp, K)[:B]
print("bit-exact:", bool((flat.reshape(-1)[:N] == data_np).all()), flush=True)
