"""Cost of tpu.dynamic_gather vs compare-add chain: chained ops inside one
Pallas kernel over a grid, timed via loop-slope at the jit level."""
import sys, time, functools
sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

G = 64; INNER = 512  # ops per grid step

def make(call_kind):
    def kernel(x_ref, lut_ref, o_ref):
        x = x_ref[0]
        lut = lut_ref[:, :]
        for _ in range(INNER):
            if call_kind == "gather":
                x = jnp.take_along_axis(lut, (x & 127).astype(jnp.int32), axis=1) + x
            elif call_kind == "chain":
                # one boundary step of the packed-accumulator chain:
                # compare + select-add (2 ops)
                x = jnp.where(x >= jnp.uint32(0x80000000), x + jnp.uint32(13), x) ^ (x >> jnp.uint32(1))
            elif call_kind == "gather0":
                x = jnp.take_along_axis(lut, (x & 7).astype(jnp.int32), axis=0) + x
        o_ref[0] = x
    grid_spec = pl.GridSpec(
        grid=(G,),
        in_specs=[pl.BlockSpec((1, 8, 128), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, 128), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
    )
    call = pl.pallas_call(kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((G, 8, 128), jnp.uint32))
    return call

rng = np.random.default_rng(0)
X = rng.integers(0, 1 << 31, size=(G, 8, 128), dtype=np.uint32)
LUT8 = np.tile((np.arange(128, dtype=np.uint32) * 2654435761)[None, :], (8, 1))
jX, jL = jnp.asarray(X), jnp.asarray(LUT8)

results = {}
for kind in ("chain", "gather", "gather0"):
    call = make(kind)
    @functools.partial(jax.jit, static_argnames=("k",))
    def run(seed, k, call=call):
        def body(i, c):
            out = call(jX ^ c, jL)
            return c ^ out.sum(dtype=jnp.uint32)
        return jax.lax.fori_loop(0, k, body, seed)
    for k in (5, 25):
        int(run(jnp.uint32(1), k))
    tlo = thi = float("inf")
    t_end = time.perf_counter() + 25
    while time.perf_counter() < t_end:
        t0 = time.perf_counter(); int(run(jnp.uint32(1), 25)); h = time.perf_counter() - t0
        t0 = time.perf_counter(); int(run(jnp.uint32(1), 5)); l = time.perf_counter() - t0
        thi = min(thi, h); tlo = min(tlo, l)
    per_iter = (thi - tlo) / 20
    per_op_ns = per_iter / (G * INNER) * 1e9
    results[kind] = per_op_ns
    print(f"{kind}: {per_iter*1e6:.1f} us/iter, {per_op_ns:.2f} ns per (8,128) op", flush=True)
