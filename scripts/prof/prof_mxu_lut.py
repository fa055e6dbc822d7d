"""MXU one-hot-matmul LUT vs the 3-gather deep-table lookup (VERDICT r4 #2).

The deep-table (max_len in (26,32]) pack kernel is lookup-bound at 3
tpu.dynamic_gather 256-LUT reads per symbol tile (BASELINE.md round 4:
3 x 8192 tiles x ~13 VPU cycles ~= 340 us of a 404 us 8 MiB kernel).
Round 4 dismissed the one structural alternative — a one-hot MXU matmul
LUT — as "unproven". This script measures it.

Variants, identical workload (per-(8,128)-tile 256-entry lookups of a
38-bit entry: 32-bit left-aligned pattern + 6-bit length):

  gather3   the production scheme: 2 pattern row gathers + hi select,
            1 packed-length gather + byte select (pallas_encode lookup).
  onehot_k  in-kernel MXU: per tile, transpose to (128,8); per column
            build a (128,256) one-hot (bf16) and dot it with a (256,128)
            byte-column table (5 useful columns: 4 pattern bytes + len;
            integers <= 255 are exact in bf16; accumulate f32).
  onehot_x  XLA-level one-hot matmul over the flat symbol stream (lets
            XLA pick its own fusion/layout for the same contraction).

Arithmetic floor for the MXU form, independent of implementation: the
MXU's minimum output width is 128 lanes, so each symbol's lookup costs a
256x128 MAC column block = 32768 MACs ~= 2 MXU cycles/symbol, vs the
gather scheme's 3*13/1024 ~= 0.04 VPU cycles/symbol — a ~50x handicap
that no column packing can recover (one symbol's one-hot row selects one
table row; columns beyond the 5 used are waste).

Also recorded here (the addressing-arithmetic floor for gathers): one
dynamic_gather indexes 128 lanes. Covering 256 symbols therefore either
(a) pairs gathers with a hi-bit select — 32 useful bits per 2 gathers —
or (b) packs k entries per word addressed by idx>>log2(k) — 32/k useful
bits per gather. A 38-bit entry (pattern > 26 bits + length) thus needs
>= 3 gathers in every combination; <= 32-bit entries (max_len <= 26)
need 2, <= 16-bit (max_len <= 12) need 1 — exactly the fused/fused16
tiers the kernel already ships.

Usage: python scripts/prof/prof_mxu_lut.py [window_s]
"""
import sys
import time
from functools import partial

sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

WINDOW = float(sys.argv[1]) if len(sys.argv) > 1 else 60.0

rng = np.random.default_rng(7)
# a deep-table entry set: 30-bit left-aligned patterns + lengths 5..30
len_np = rng.integers(5, 31, size=256).astype(np.int32)
pat_np = rng.integers(0, 1 << 32, size=256, dtype=np.uint64).astype(np.uint32)
mask = (np.uint64(0xFFFFFFFF) << (32 - len_np).astype(np.uint64)).astype(
    np.uint32)
p32_np = np.where(len_np > 0, pat_np & mask, np.uint32(0)).astype(np.uint32)

G = 128   # grid steps
R = 64    # lookups per lane per step -> G*1024*R = 8.4 Mi lookups
N_LOOKUPS = G * 1024 * R

X = jnp.asarray(rng.integers(0, 256, size=(G, 8, 128), dtype=np.int32))

# ---- gather3: the production lookup ----
plo_np = np.broadcast_to(p32_np.view(np.int32)[:128], (8, 128))
phi_np = np.broadcast_to(p32_np.view(np.int32)[128:], (8, 128))
lp = np.zeros(128, np.uint32)
lp[:64] = (len_np[0::4].astype(np.uint32)
           | (len_np[1::4].astype(np.uint32) << 8)
           | (len_np[2::4].astype(np.uint32) << 16)
           | (len_np[3::4].astype(np.uint32) << 24))
lpk_np = np.broadcast_to(lp.view(np.int32), (8, 128))
TBL3 = jnp.asarray(np.stack([plo_np, phi_np, lpk_np]))


def k_gather3(x_ref, t_ref, o_ref):
    x0 = x_ref[0]
    plo, phi, lpk = t_ref[0], t_ref[1], t_ref[2]
    accp = jnp.zeros((8, 128), jnp.uint32)
    accl = jnp.zeros((8, 128), jnp.int32)
    for r in range(R):
        idx = (x0 + r) & 255
        lo = idx & 127
        p = jnp.where(
            idx >= 128,
            jnp.take_along_axis(phi, lo, axis=1),
            jnp.take_along_axis(plo, lo, axis=1),
        )
        le = jax.lax.bitcast_convert_type(
            jnp.take_along_axis(lpk, idx >> 2, axis=1), jnp.uint32
        )
        ln = ((le >> ((idx & 3) << 3).astype(jnp.uint32)) & jnp.uint32(0xFF)
              ).astype(jnp.int32)
        accp = accp ^ jax.lax.bitcast_convert_type(p, jnp.uint32)
        accl = accl + ln
    o_ref[0] = jax.lax.bitcast_convert_type(accp, jnp.int32) ^ accl


f_gather3 = pl.pallas_call(
    k_gather3,
    grid_spec=pl.GridSpec(
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, 8, 128), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, 128), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM),
    ),
    out_shape=jax.ShapeDtypeStruct((G, 8, 128), jnp.int32),
)

# ---- onehot_k: in-kernel MXU one-hot matmul ----
# Table as byte columns (exact in bf16): [p_b3, p_b2, p_b1, p_b0, len],
# padded to 128 output lanes (the MXU's minimum output width).
Tm_np = np.zeros((256, 128), np.float32)
for b in range(4):
    Tm_np[:, b] = ((p32_np >> (8 * (3 - b))) & 0xFF).astype(np.float32)
Tm_np[:, 4] = len_np.astype(np.float32)
TM = jnp.asarray(Tm_np.astype(jnp.bfloat16.dtype if hasattr(jnp.bfloat16, "dtype") else np.float32))
TM = jnp.asarray(Tm_np).astype(jnp.bfloat16)


def k_onehot(x_ref, t_ref, o_ref):
    x0 = x_ref[0]
    tm = t_ref[...]
    accp = jnp.zeros((8, 128), jnp.int32)
    accl = jnp.zeros((8, 128), jnp.int32)
    iota = jax.lax.broadcasted_iota(jnp.int32, (128, 256), 1)
    for r in range(R):
        idx = (x0 + r) & 255
        xT = idx.T  # (128, 8)
        pc, lc = [], []
        for c in range(8):
            oh = (xT[:, c:c + 1] == iota).astype(jnp.bfloat16)
            res = jax.lax.dot(oh, tm,
                              preferred_element_type=jnp.float32)  # (128,128)
            p = (res[:, 0].astype(jnp.int32) * 16777216
                 + res[:, 1].astype(jnp.int32) * 65536
                 + res[:, 2].astype(jnp.int32) * 256
                 + res[:, 3].astype(jnp.int32))
            pc.append(p.reshape(128, 1))
            lc.append(res[:, 4].astype(jnp.int32).reshape(128, 1))
        accp = accp ^ jnp.concatenate(pc, axis=1).T
        accl = accl + jnp.concatenate(lc, axis=1).T
    o_ref[0] = accp ^ accl


f_onehot = pl.pallas_call(
    k_onehot,
    grid_spec=pl.GridSpec(
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, 8, 128), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, 128), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM),
    ),
    out_shape=jax.ShapeDtypeStruct((G, 8, 128), jnp.int32),
)

# ---- onehot_x: XLA-level one-hot matmul over the flat stream ----
N_X = 1 << 20
XF = jnp.asarray(rng.integers(0, 256, size=N_X, dtype=np.int32))


def xla_onehot(x):
    oh = jax.nn.one_hot(x, 256, dtype=jnp.bfloat16)  # (N, 256)
    res = jax.lax.dot(oh, TM, preferred_element_type=jnp.float32)
    p = (res[:, 0].astype(jnp.int32) * 16777216
         + res[:, 1].astype(jnp.int32) * 65536
         + res[:, 2].astype(jnp.int32) * 256
         + res[:, 3].astype(jnp.int32))
    ln = res[:, 4].astype(jnp.int32)
    return p ^ ln


# ---- correctness: all three agree with the host truth ----
want_p = p32_np.view(np.int32)
want = np.zeros((G, 8, 128), np.int32)
accp = np.zeros((G, 8, 128), np.uint32)
accl = np.zeros((G, 8, 128), np.int32)
Xn = np.asarray(X)
for r in range(R):
    idx = (Xn + r) & 255
    accp ^= p32_np[idx]
    accl += len_np[idx]
want = accp.view(np.int32) ^ accl
o3 = np.asarray(f_gather3(X, TBL3))
print("gather3 correct:", np.array_equal(o3, want), flush=True)
oh_ok = None
try:
    ok = np.asarray(f_onehot(X, TM))
    oh_ok = np.array_equal(ok, want)
except Exception as e:  # Mosaic may reject the transpose/dot layout
    print("onehot_k failed to compile:", repr(e)[:200], flush=True)
print("onehot_k correct:", oh_ok, flush=True)
ox = np.asarray(xla_onehot(XF))
want_x = p32_np[np.asarray(XF)].view(np.int32) ^ len_np[np.asarray(XF)]
print("onehot_x correct:", np.array_equal(ox, want_x), flush=True)

# ---- timing: in-program loop slope ----
VAR = [("gather3", lambda s: f_gather3((X ^ s) & 255, TBL3).sum(), N_LOOKUPS)]
if oh_ok:
    VAR.append(("onehot_k", lambda s: f_onehot((X ^ s) & 255, TM).sum(),
                N_LOOKUPS))
VAR.append(("onehot_x", lambda s: xla_onehot((XF ^ s) & 255).sum(), N_X))

runs = []
for nm, fn, _n in VAR:
    def body(i, carry, fn=fn):
        return carry ^ fn(carry & 255)

    @partial(jax.jit, static_argnames=("k",))
    def run(seed, k, body=body):
        return jax.lax.fori_loop(0, k, body, seed)

    runs.append(run)
K_LO, K_HI = 5, 25
for (nm, _f, _n), run in zip(VAR, runs):
    for k in (K_LO, K_HI):
        t0 = time.perf_counter()
        int(run(jnp.int32(1), k))
        print(f"warm {nm}@{k}: {time.perf_counter() - t0:.1f}s", flush=True)
tl = [float("inf")] * len(runs)
th_ = [float("inf")] * len(runs)
t_end = time.perf_counter() + WINDOW
while time.perf_counter() < t_end:
    for i, run in enumerate(runs):
        t0 = time.perf_counter()
        int(run(jnp.int32(1), K_HI))
        h = time.perf_counter() - t0
        t0 = time.perf_counter()
        int(run(jnp.int32(1), K_LO))
        low = time.perf_counter() - t0
        th_[i] = min(th_[i], h)
        tl[i] = min(tl[i], low)
for (nm, _f, n), h, low in zip(VAR, th_, tl):
    s = (h - low) / (K_HI - K_LO)
    print(f"{nm}: {s*1e6:9.0f} us/iter  {s / n * 1e9:8.3f} ns/lookup "
          f"({n} lookups/iter)", flush=True)
