import sys, time
from functools import partial
sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])
import numpy as np, jax, jax.numpy as jnp
from tpu_huffman.ops import pallas_encode as pe
from tpu_huffman.ops.pallas_encode import LANES, STITCH_SW
import tpu_huffman as th
import bench_suite as bs

WINDOW = float(sys.argv[1]) if len(sys.argv) > 1 else 100.0
table = th.make_canonical(bs.mixed_lengths_5_30(), name="mixed_5_30")
N = 8 * 1024 * 1024
rng = np.random.default_rng(11)
p = 2.0 ** -table.lengths[table.lengths > 0].astype(np.float64)
syms = np.nonzero(table.lengths > 0)[0]
p /= p.sum()
data_np = rng.choice(syms, size=N, p=p).astype(np.uint8)
K = 512
wb = pe.plan_wb_encode(table, data_np, K=K)
p32t, lent, min_len, max_len, Wb, G, num_out = pe._plan(table, N, K, wb_cap=wb, exact_out=True)
B = G * LANES
S = pe._sub_block(K, min_len, max_len)
fuse_sw = STITCH_SW if (128 * K * max_len <= 1 << 24) else 0
nrows = -(-(Wb + fuse_sw) // fuse_sw)
print(f"K={K} Wb={Wb} G={G} S={S} nrows={nrows} num_out={num_out} ({num_out*4/1e6:.0f} MB)", flush=True)
nsym_np = np.zeros(B, np.int32); nsym_np[: N // K] = K
nsym = jnp.asarray(nsym_np)
symbols = jnp.asarray(data_np)
pad_to = B * K
interp = pe._use_interpret()
call = pe._make_pack_call(p32t, lent, K, Wb, G, min_len, max_len, interp, S, fuse_sw)

def stage(sym):
    padded = jnp.pad(sym, (0, pad_to - N))
    syms_u32 = jax.lax.bitcast_convert_type(padded.reshape(-1, 4), jnp.uint32).reshape(-1)
    staged = syms_u32.reshape(G, 8, 128, K // 4).transpose(0, 3, 1, 2)
    return call(staged, nsym.reshape(G, 8, 128))

def fold(*xs):
    return sum(x.astype(jnp.uint32).sum(dtype=jnp.uint32) for x in xs)

enc_full, _f = pe.encode_step(table, N, 512, K=K, wb_hint=wb)
VAR = [("kernel", lambda s: fold(*stage(s))),
       ("full", lambda s: (lambda w, tb, pb: fold(w) ^ tb.astype(jnp.uint32))(*enc_full(s)))]
runs = []
for nm, fn in VAR:
    def body(i, carry, fn=fn):
        return carry ^ fn(symbols ^ carry.astype(jnp.uint8))
    @partial(jax.jit, static_argnames=("k",))
    def run(seed, k, body=body):
        return jax.lax.fori_loop(0, k, body, seed)
    runs.append(run)
K_LO, K_HI = 9, 49
for (nm, _), run in zip(VAR, runs):
    for k in (K_LO, K_HI):
        t0 = time.perf_counter(); int(run(jnp.uint32(1), k))
        print(f"warm {nm}@{k}: {time.perf_counter()-t0:.1f}s", flush=True)
tl = [float("inf")] * len(runs); thv = [float("inf")] * len(runs)
t_end = time.perf_counter() + WINDOW
while time.perf_counter() < t_end:
    for i, run in enumerate(runs):
        t0 = time.perf_counter(); int(run(jnp.uint32(1), K_HI)); h = time.perf_counter() - t0
        t0 = time.perf_counter(); int(run(jnp.uint32(1), K_LO)); l = time.perf_counter() - t0
        thv[i] = min(thv[i], h); tl[i] = min(tl[i], l)
for (nm, _), h, l in zip(VAR, thv, tl):
    us = (h - l) / (K_HI - K_LO) * 1e6
    print(f"{nm}: {us:.0f} us ({N/(us/1e6)/1e9:.2f} GB/s)", flush=True)
