"""Do XLA's indices_are_sorted / unique_indices hints speed up the
fat-row scatter (encode stitch) and row-take (decode staging) on this rig?

Chain protocol per MEASURING.md.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp


def chain(step, x0, reps=8):
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
    return best


rng = np.random.default_rng(7)

# ---- scatter-add of B fat 32-wide rows into W32 rows (encode stitch shape)
for B, label in ((262144, "K=32"), (65536, "K=128")):
    W32 = 81000
    # sorted, quasi-dense target rows like r0 = offs>>10
    r0_np = np.sort(rng.integers(0, W32 - 2, size=B)).astype(np.int32)
    r0 = jnp.asarray(r0_np)
    buf = jnp.asarray(rng.integers(0, 2**32, size=(B, 64), dtype=np.uint64).astype(np.uint32))

    def mk(sorted_hint):
        @jax.jit
        def step(seed):
            b = buf ^ seed
            out = jnp.zeros((W32, 32), jnp.uint32)
            out = out.at[r0].add(b[:, :32], mode="drop",
                                 indices_are_sorted=sorted_hint)
            out = out.at[r0 + 1].add(b[:, 32:], mode="drop",
                                     indices_are_sorted=sorted_hint)
            return seed ^ out.sum(dtype=jnp.uint32)
        return step

    for hint in (False, True):
        t = chain(mk(hint), jnp.uint32(1))
        print(f"scatter {label} B={B} sorted={hint}: {t*1e3:8.3f} ms", flush=True)

# ---- row take: [S,32] rows taken at B sorted indices (decode staging shape)
S = 66000
spans32 = jnp.asarray(rng.integers(0, 2**32, size=(S, 32), dtype=np.uint64).astype(np.uint32))
B = 65536
idx_np = np.sort(rng.integers(0, S - 4, size=B)).astype(np.int32)
idx = jnp.asarray(idx_np)

def mk_take(sorted_hint, width):
    sp = spans32.reshape(S * (32 // width), width) if width != 32 else spans32
    scale = 32 // width
    @jax.jit
    def step(seed):
        s = sp ^ seed
        acc = jnp.uint32(0)
        for t in range(3 * scale):
            if sorted_hint is None:
                r = jnp.take(s, idx * scale + t, axis=0, mode="clip")
            else:
                r = s.at[idx * scale + t].get(mode="clip",
                                              indices_are_sorted=sorted_hint)
            acc = acc ^ r.sum(dtype=jnp.uint32)
        return seed ^ acc
    return step

for width in (32, 16, 8):
    for hint in (None, False, True):
        t = chain(mk_take(hint, width), jnp.uint32(1))
        print(f"take width={width:2d} rows x{3*(32//width)} sorted={hint}: {t*1e3:8.3f} ms", flush=True)
