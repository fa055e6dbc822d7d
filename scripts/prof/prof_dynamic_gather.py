"""tpu.dynamic_gather via jnp.take_along_axis(t, x, axis=0) with
operand/indices/output all (256,128): one per-lane LUT lookup per element.

If fast, it replaces the encode kernel's 64-op rank select tree AND the
interval scan (direct u32 pattern + length tables), and the decode
kernel's perm tree. Probe: correctness + ns/lookup vs the select tree.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_huffman.ops.pallas_encode import _make_byte_lut

rng = np.random.default_rng(3)
table_np = rng.integers(0, 2**31, size=256, dtype=np.int64).astype(np.int32)
G = 16
R = 16
# queries arranged (G, 256, 128): 32Ki lookups per grid step
X = jnp.asarray(rng.integers(0, 256, size=(G, 256, 128), dtype=np.int32))
T = jnp.asarray(np.broadcast_to(table_np[:, None], (256, 128)).copy())


def k_gather(x_ref, t_ref, o_ref):
    x = x_ref[0]
    t = t_ref[...]
    for _ in range(R):
        x = jnp.take_along_axis(t, x, axis=0) & 255
    o_ref[0] = x


f = pl.pallas_call(
    k_gather,
    grid_spec=pl.GridSpec(
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, 256, 128), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 256, 128), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
    ),
    out_shape=jax.ShapeDtypeStruct((G, 256, 128), jnp.int32),
)

# correctness
out = np.asarray(f(X, T))
want = np.asarray(X)
for _ in range(R):
    want = table_np[want] & 255
print("dynamic_gather correct:", np.array_equal(out, want), flush=True)


@jax.jit
def step(seed):
    x = (X ^ seed) & 255
    return seed ^ f(x, T).sum()


s = step(jnp.int32(1))
jax.block_until_ready(s)
best = float("inf")
for _ in range(3):
    s = jnp.int32(1)
    t0 = time.perf_counter()
    for _ in range(8):
        s = step(s)
    jax.block_until_ready(s)
    best = min(best, (time.perf_counter() - t0) / 8)
n_lookups = G * 256 * 128 * R
print(f"dynamic_gather: {best*1e3:8.3f} ms  ({best/n_lookups*1e9:.3f} ns/lookup)", flush=True)

# tree baseline at the same query count
p32 = tuple(
    int(table_np[i * 4] & 0xFF)
    | ((int(table_np[i * 4 + 1]) & 0xFF) << 8)
    | ((int(table_np[i * 4 + 2]) & 0xFF) << 16)
    | ((int(table_np[i * 4 + 3]) & 0xFF) << 24)
    for i in range(64)
)
lut = _make_byte_lut(p32)


def k_tree(x_ref, o_ref):
    x = x_ref[0].astype(jnp.uint32)
    for _ in range(R):
        x = lut(x)
    o_ref[0] = x.astype(jnp.int32)


ft = pl.pallas_call(
    k_tree,
    grid_spec=pl.GridSpec(
        grid=(G,),
        in_specs=[pl.BlockSpec((1, 256, 128), lambda g: (g, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 256, 128), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
    ),
    out_shape=jax.ShapeDtypeStruct((G, 256, 128), jnp.int32),
)


@jax.jit
def step_t(seed):
    x = (X ^ seed) & 255
    return seed ^ ft(x).sum()


s = step_t(jnp.int32(1))
jax.block_until_ready(s)
best = float("inf")
for _ in range(3):
    s = jnp.int32(1)
    t0 = time.perf_counter()
    for _ in range(8):
        s = step_t(s)
    jax.block_until_ready(s)
    best = min(best, (time.perf_counter() - t0) / 8)
print(f"select tree   : {best*1e3:8.3f} ms  ({best/n_lookups*1e9:.3f} ns/lookup)", flush=True)
