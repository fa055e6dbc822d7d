"""Platform ceiling probe: pure elementwise / copy bandwidth, chain protocol.

Establishes the HBM roofline for this rig so staging costs can be judged
against speed-of-light rather than guessed. MEASURING.md §1 protocol.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp


def chain(step, x0, reps=8, label="", nbytes=0):
    x = step(x0)
    jax.block_until_ready(x)
    best = float("inf")
    for _ in range(3):
        x = x0
        t0 = time.perf_counter()
        for _ in range(reps):
            x = step(x)
        jax.block_until_ready(x)
        best = min(best, (time.perf_counter() - t0) / reps)
    gbs = nbytes / best / 1e9 if nbytes else 0.0
    print(f"{label}: {best*1e3:.3f} ms  ({gbs:.1f} GB/s r+w)", flush=True)
    return best


rng = np.random.default_rng(0)

for mb in (8, 64):
    n = mb * 1024 * 1024 // 4
    x0 = jnp.asarray(rng.integers(0, 2**31, size=n, dtype=np.int64).astype(np.uint32))

    @jax.jit
    def xor_step(x):
        return x ^ jnp.uint32(12345)

    chain(xor_step, x0, label=f"xor {mb} MiB", nbytes=2 * mb * 2**20)

    @jax.jit
    def sum_step(x):
        return x ^ x.sum(dtype=jnp.uint32)

    chain(sum_step, x0, label=f"sum+xor {mb} MiB", nbytes=2 * mb * 2**20)

# reshape+concat span staging at the decode shape (K=128 path):
# 2.6M stream words -> (S,58) spans, sw=16
words = jnp.asarray(
    rng.integers(0, 2**31, size=2_700_000, dtype=np.int64).astype(np.uint32)
)
S = 170 * 1024
sw = 16
Wb = 58
pad_elems = S * sw + Wb + sw


@jax.jit
def stage58(seed):
    w = jnp.pad(words ^ seed, (0, pad_elems - words.shape[0]))
    parts = [w[j * sw : j * sw + S * sw].reshape(S, sw) for j in range(Wb // sw + 1)]
    win = jnp.concatenate(parts, axis=1)[:, :Wb]
    return seed ^ win.sum(dtype=jnp.uint32)


chain(stage58, jnp.uint32(1), label=f"span staging (S={S}, Wb={Wb}) ~37MB out",
      nbytes=S * Wb * 4)

# q-row triple-take: 3 gathers of (B rows of 32) from (S,32)
B = 64 * 1024
spans32 = jnp.asarray(
    rng.integers(0, 2**31, size=(84 * 1024, 32), dtype=np.int64).astype(np.uint32)
)
r = jnp.asarray(np.sort(rng.integers(0, 84 * 1024 - 4, size=B)).astype(np.int32))


@jax.jit
def take3(seed):
    s = spans32 ^ seed
    a = jnp.take(s, r, axis=0)
    b = jnp.take(s, r + 1, axis=0)
    c = jnp.take(s, r + 2, axis=0)
    return seed ^ (a.sum(dtype=jnp.uint32) + b.sum(dtype=jnp.uint32) + c.sum(dtype=jnp.uint32))


chain(take3, jnp.uint32(1), label=f"3x row-take32 (B={B}) ~25MB out",
      nbytes=B * 96 * 4)

# single wide take: one gather of (B rows of 128) from (S,128)
spans128 = jnp.asarray(
    rng.integers(0, 2**31, size=(21 * 1024, 128), dtype=np.int64).astype(np.uint32)
)
r2 = jnp.asarray(np.sort(rng.integers(0, 21 * 1024 - 2, size=16 * 1024)).astype(np.int32))


@jax.jit
def take_wide(seed):
    s = spans128 ^ seed
    a = jnp.take(s, r2, axis=0)
    b = jnp.take(s, r2 + 1, axis=0)
    return seed ^ (a.sum(dtype=jnp.uint32) + b.sum(dtype=jnp.uint32))


chain(take_wide, jnp.uint32(1), label="2x row-take128 (B=16Ki) ~16MB out",
      nbytes=16 * 1024 * 256 * 4)
