"""Does Mosaic lower a per-lane 256-entry LUT inside a Pallas TPU kernel,
and how does it compare to the 4+2-level select tree?

Variants, each applying the lookup R times per grid step to amplify the
per-lookup cost difference above DMA noise:
  tree    — current select tree over 64 packed u32 (the production path)
  take    — jnp.take(flat_table, idx) inside the kernel (if it lowers)
  onehot  — one-hot matmul against an (256,1) table on the MXU (if it lowers)
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_huffman.ops.pallas_encode import _make_byte_lut

rng = np.random.default_rng(3)
table_np = rng.integers(0, 256, size=256, dtype=np.uint8)
p32 = tuple(
    int(
        int(table_np[i * 4])
        | (int(table_np[i * 4 + 1]) << 8)
        | (int(table_np[i * 4 + 2]) << 16)
        | (int(table_np[i * 4 + 3]) << 24)
    )
    for i in range(64)
)
G = 64
R = 16  # lookups per element per grid step
X = jnp.asarray(rng.integers(0, 256, size=(G, 8, 128), dtype=np.int32))
TBL = jnp.asarray(table_np.astype(np.int32))


def run(name, kernel, extra_in=()):
    f = pl.pallas_call(
        kernel,
        grid_spec=pl.GridSpec(
            grid=(G,),
            in_specs=[pl.BlockSpec((1, 8, 128), lambda g: (g, 0, 0), memory_space=pltpu.VMEM)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in extra_in],
            out_specs=pl.BlockSpec((1, 8, 128), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((G, 8, 128), jnp.int32),
    )

    @jax.jit
    def step(seed):
        x = (X ^ seed) & 255
        return seed ^ f(x, *extra_in).sum()

    try:
        s = step(jnp.int32(1))
        jax.block_until_ready(s)
    except Exception as e:
        print(f"{name}: FAILED to lower: {str(e)[:200]}")
        return
    best = float("inf")
    for _ in range(3):
        s = jnp.int32(1)
        t0 = time.perf_counter()
        for _ in range(8):
            s = step(s)
        jax.block_until_ready(s)
        best = min(best, (time.perf_counter() - t0) / 8)
    n_lookups = G * 1024 * R
    print(f"{name}: {best*1e3:8.3f} ms  ({best/n_lookups*1e9:.3f} ns/lookup)", flush=True)


lut = _make_byte_lut(p32)


def k_tree(x_ref, o_ref):
    x = x_ref[0].astype(jnp.uint32)
    acc = jnp.zeros((8, 128), jnp.uint32)
    for _ in range(R):
        x = (lut(x) + acc) & 255
        acc = acc + 1
    o_ref[0] = x.astype(jnp.int32)


def k_take(x_ref, t_ref, o_ref):
    x = x_ref[0]
    t = t_ref[...]
    acc = jnp.zeros((8, 128), jnp.int32)
    for _ in range(R):
        x = (jnp.take(t, x, axis=0) + acc) & 255
        acc = acc + 1
    o_ref[0] = x


def k_onehot(x_ref, t_ref, o_ref):
    x = x_ref[0]
    tf = t_ref[...].astype(jnp.float32).reshape(256, 1)
    acc = jnp.zeros((8, 128), jnp.int32)
    for _ in range(R):
        oh = (x[:, :, None] == jax.lax.broadcasted_iota(jnp.int32, (1, 1, 256), 2)).astype(jnp.float32)
        y = jax.lax.dot_general(
            oh.reshape(8 * 128, 256), tf,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        x = (y.reshape(8, 128).astype(jnp.int32) + acc) & 255
        acc = acc + 1
    o_ref[0] = x


run("tree  ", k_tree)
run("take  ", k_take, (TBL,))
run("onehot", k_onehot, (TBL,))
