"""True windowed lax.scatter_add at flat WORD offsets (overlapping windows)
vs the current 2x fat-row .at[].add stitch.

If one windowed scatter of (B, Wb+1) updates at word offsets beats the
row-aligned pair, the encode stitch can drop the barrel roll entirely
(funnel by offs&31 only, scatter at offs>>5) and move 12-wide instead of
64-wide payloads. Chain protocol per MEASURING.md.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

W = 2 * 1024 * 1024 + 128


def chain(step, x0, reps=8, label=""):
    x = step(x0)
    jax.block_until_ready(x)
    best = float("inf")
    for _ in range(2):
        x = x0
        t0 = time.perf_counter()
        for _ in range(reps):
            x = step(x)
        jax.block_until_ready(x)
        best = min(best, (time.perf_counter() - t0) / reps)
    print(f"{label}: {best*1e3:8.3f} ms", flush=True)
    return best


rng = np.random.default_rng(7)


def windowed(B, width, sorted_hint, label, stride_bits=None):
    # quasi-dense word offsets like offs>>5 (blocks ~10 words apart)
    step_w = (W - 2 * width) // B
    offs_np = (np.arange(B) * step_w + rng.integers(0, 3, size=B)).astype(np.int32)
    offs = jnp.asarray(offs_np)
    vals = jnp.asarray(
        rng.integers(0, 2**32, size=(B, width), dtype=np.uint64).astype(np.uint32)
    )
    dnums = lax.ScatterDimensionNumbers(
        update_window_dims=(1,),
        inserted_window_dims=(),
        scatter_dims_to_operand_dims=(0,),
    )

    @jax.jit
    def step(seed):
        v = vals ^ seed
        out = jnp.zeros((W,), jnp.uint32)
        out = lax.scatter_add(
            out,
            offs[:, None],
            v,
            dnums,
            indices_are_sorted=sorted_hint,
            unique_indices=False,
            mode=lax.GatherScatterMode.FILL_OR_DROP,
        )
        return seed ^ out.sum(dtype=jnp.uint32)

    return chain(step, jnp.uint32(1), label=label)


for B, width in ((262144, 12), (262144, 16), (131072, 23), (131072, 24), (65536, 41), (65536, 48)):
    for hint in (False, True):
        windowed(B, width, hint, f"windowed scatter B={B:6d} w={width:2d} sorted={hint}")
