"""Is XLA scatter-add cost per-element or per-index? Rows vs singles.

Also: strided-span staging via reshape+concat (gather-free window build),
and transpose cost. Chain protocol.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

W = 2 * 1024 * 1024 + 64


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
    print(f"{label}: {best*1e3:.3f} ms", flush=True)
    return best


rng = np.random.default_rng(0)

# a) 2M single-element scatter-add (sorted-ish indices)
idx1 = jnp.asarray(np.sort(rng.integers(0, W - 1, size=2 * 1024 * 1024)).astype(np.int32))
val1 = jnp.asarray(rng.integers(0, 2**31, size=2 * 1024 * 1024, dtype=np.int64).astype(np.uint32))

@jax.jit
def s_single(seed):
    v = val1 ^ seed
    out = jnp.zeros(W, jnp.uint32).at[idx1].add(v, mode="drop")
    return seed ^ out.sum(dtype=jnp.uint32)

chain(s_single, jnp.uint32(1), label="scatter 2M singles")

# b) 256Ki rows x 8 words, one index per row (update_window_dims)
B8 = 256 * 1024
idx8 = jnp.asarray(np.sort(rng.integers(0, W // 8 - 2, size=B8)).astype(np.int32))
val8 = jnp.asarray(rng.integers(0, 2**31, size=(B8, 8), dtype=np.int64).astype(np.uint32))

@jax.jit
def s_row8(seed):
    v = val8 ^ seed
    out = jnp.zeros((W // 8, 8), jnp.uint32).at[idx8].add(v, mode="drop")
    return seed ^ out.sum(dtype=jnp.uint32)

chain(s_row8, jnp.uint32(1), label="scatter 256Ki rows of 8")

# c) 64Ki rows x 32 words
B32 = 64 * 1024
idx32 = jnp.asarray(np.sort(rng.integers(0, W // 32 - 2, size=B32)).astype(np.int32))
val32 = jnp.asarray(rng.integers(0, 2**31, size=(B32, 32), dtype=np.int64).astype(np.uint32))

@jax.jit
def s_row32(seed):
    v = val32 ^ seed
    out = jnp.zeros((W // 32, 32), jnp.uint32).at[idx32].add(v, mode="drop")
    return seed ^ out.sum(dtype=jnp.uint32)

chain(s_row32, jnp.uint32(1), label="scatter 64Ki rows of 32")

# d) 256Ki rows x 11 at WORD-offsets into flat (encode stitch shape, overlapping)
Bw = 256 * 1024
idxw = jnp.asarray((np.arange(Bw) * 8 + rng.integers(0, 3, size=Bw)).astype(np.int32))
valw = jnp.asarray(rng.integers(0, 2**31, size=(Bw, 11), dtype=np.int64).astype(np.uint32))

@jax.jit
def s_roww(seed):
    v = valw ^ seed
    jj = jax.lax.broadcasted_iota(jnp.int32, (1, 11), 1)
    # flat word-granularity placement, overlapping windows — one scatter op
    # with a window dim via at[idx[:,None]+jj]? that's elementwise again;
    # instead: dynamic window scatter over rows of 11 at flat offsets
    out = jnp.zeros(W, jnp.uint32)
    out = out.at[idxw[:, None] + jj].add(v, mode="drop")
    return seed ^ out.sum(dtype=jnp.uint32)

chain(s_roww, jnp.uint32(1), label="scatter 256Ki x 11 elementwise-idx (flat)")

# e) strided-span staging: windows of Wb=24 every 16 words via reshape+concat
S = 128 * 1024
sw = 16
Wb = 24
words = jnp.asarray(rng.integers(0, 2**31, size=S * sw + sw, dtype=np.int64).astype(np.uint32))

@jax.jit
def stage_spans(seed):
    w = words ^ seed
    A = w[: S * sw].reshape(S, sw)
    Bm = w[sw : sw + S * sw].reshape(S, sw)
    win = jnp.concatenate([A, Bm[:, : Wb - sw]], axis=1)
    return seed ^ win.sum(dtype=jnp.uint32)

chain(stage_spans, jnp.uint32(1), label="span staging reshape+concat (2M words)")

# f) the transpose used by kernel staging [G,8,128,Wb] -> [G,Wb,8,128]
G = 128
x0 = jnp.asarray(rng.integers(0, 2**31, size=(G, 8, 128, Wb), dtype=np.int64).astype(np.uint32))

@jax.jit
def t_step(x):
    y = x.transpose(0, 3, 1, 2)
    s = y.sum(dtype=jnp.uint32)
    return x ^ s

chain(t_step, x0, label="transpose [G,8,128,24]->[G,24,8,128] (3M words)")
