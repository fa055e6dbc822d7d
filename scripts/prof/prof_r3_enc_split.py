"""Encode split: (a) staging+pack-kernel only, (b) full pipeline. Interleaved."""
import sys, time
from functools import partial
sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])
import numpy as np, jax, jax.numpy as jnp
from tpu_huffman.ops import pallas_encode as pe
from tpu_huffman.ops.pallas_encode import LANES
import tpu_huffman as th

WINDOW = float(sys.argv[1]) if len(sys.argv) > 1 else 40.0
table = th.load_static_test_table()
N = 8 * 1024 * 1024
rng = np.random.default_rng(2024)
data_np = rng.integers(0, 256, size=N, dtype=np.uint8)
K = pe.pack_k(table)
wb_hint = pe.plan_wb_encode(table, data_np, K=K)
p32t, lent, min_len, max_len, Wb, G, num_out_words = pe._plan(table, N, K, wb_cap=wb_hint)
B = G * LANES
S = pe._sub_block(K, min_len, max_len)
fuse_sw = pe.STITCH_SW if (128 * K * max_len <= 1 << 24) else 0
print(f"K={K} Wb={Wb} G={G} S={S} fuse_sw={fuse_sw}", flush=True)
nsym_np = np.zeros(B, np.int32)
full = N // K
nsym_np[:full] = K
if N % K: nsym_np[full] = N % K
nsym = jnp.asarray(nsym_np)
symbols = jnp.asarray(data_np)
pad_to = B * K
interp = pe._use_interpret()
enc_full, _f = pe.encode_step(table, N, 512, K=K, wb_hint=wb_hint)

@jax.jit
def kernel_only(sym):
    padded = jnp.pad(sym, (0, pad_to - N))
    syms_u32 = jax.lax.bitcast_convert_type(padded.reshape(-1, 4), jnp.uint32).reshape(-1)
    staged = syms_u32.reshape(G, 8, 128, K // 4).transpose(0, 3, 1, 2)
    out = pe._make_pack_call(p32t, lent, K, Wb, G, min_len, max_len, interp, S, fuse_sw)(
        staged, nsym.reshape(G, 8, 128))
    return sum(o.astype(jnp.uint32).sum(dtype=jnp.uint32) for o in out)

def body_kernel(i, carry):
    return carry ^ kernel_only(symbols ^ carry.astype(jnp.uint8))

def body_full(i, carry):
    sym = symbols ^ carry.astype(jnp.uint8)
    words, total_bits, _p = enc_full(sym)
    return carry ^ words.sum(dtype=jnp.uint32) ^ total_bits.astype(jnp.uint32)

runs = []
for body in (body_kernel, body_full):
    @partial(jax.jit, static_argnames=("k",))
    def run(seed, k, body=body):
        return jax.lax.fori_loop(0, k, body, seed)
    runs.append(run)
K_LO, K_HI = 9, 49
for nm, run in zip(("kernel", "full"), runs):
    for k in (K_LO, K_HI):
        for attempt in range(4):
            try:
                t0 = time.perf_counter(); int(run(jnp.uint32(1), k))
                print(f"warm {nm}@{k}: {time.perf_counter()-t0:.1f}s", flush=True)
                break
            except Exception as e:
                print(f"retry {type(e).__name__}", flush=True); time.sleep(10)
tl = [float("inf")] * 2; thv = [float("inf")] * 2
t_end = time.perf_counter() + WINDOW
while time.perf_counter() < t_end:
    for i, run in enumerate(runs):
        t0 = time.perf_counter(); int(run(jnp.uint32(1), K_HI)); h = time.perf_counter() - t0
        t0 = time.perf_counter(); int(run(jnp.uint32(1), K_LO)); l = time.perf_counter() - t0
        thv[i] = min(thv[i], h); tl[i] = min(tl[i], l)
for nm, h, l in zip(("kernel", "full"), thv, tl):
    us = (h - l) / (K_HI - K_LO) * 1e6
    print(f"{nm}: {us:.0f} us ({N/(us/1e6)/1e9:.2f} GB/s)", flush=True)
