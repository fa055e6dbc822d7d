import sys, time
sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])
import numpy as np, jax, jax.numpy as jnp
from functools import partial

N = 18_632_160
rng = np.random.default_rng(0)
src_np = np.sort(rng.integers(0, N, size=N)).astype(np.int32)
tbl8 = jnp.asarray(rng.integers(0, 256, size=N, dtype=np.uint8))
tbl32 = tbl8.astype(jnp.int32)
src = jnp.asarray(src_np)

def t8(s):
    return jnp.take(tbl8, s).sum(dtype=jnp.uint32) ^ s[0].astype(jnp.uint32)
def t32(s):
    return jnp.take(tbl32, s).sum(dtype=jnp.int32).astype(jnp.uint32) ^ s[0].astype(jnp.uint32)
def t8s(s):
    return tbl8.at[s].get(mode="clip", indices_are_sorted=True).sum(dtype=jnp.uint32) ^ s[0].astype(jnp.uint32)
# hierarchical cumsum cost for reference
from tpu_huffman.ops.pallas_encode import _exclusive_cumsum_blocks
def cs(s):
    e, t = _exclusive_cumsum_blocks(s)
    return (e[::1000].sum() + t).astype(jnp.uint32)

for nm, fn in (("take_u8", t8), ("take_i32", t32), ("take_u8_sorted", t8s), ("cumsum4", lambda s: cs(s) ^ cs(s+1) ^ cs(s+2) ^ cs(s+3))):
    def body(i, carry, fn=fn):
        return carry ^ fn(src ^ (carry & 1).astype(jnp.int32))
    @partial(jax.jit, static_argnames=("k",))
    def run(seed, k, body=body):
        return jax.lax.fori_loop(0, k, body, seed)
    for k in (3, 13):
        int(run(jnp.uint32(1), k))
    ts = []
    for _ in range(6):
        t0 = time.perf_counter(); int(run(jnp.uint32(1), 13)); h = time.perf_counter() - t0
        t0 = time.perf_counter(); int(run(jnp.uint32(1), 3)); l = time.perf_counter() - t0
        ts.append((h - l) / 10)
    print(f"{nm}: {min(ts)*1e3:.1f} ms", flush=True)
