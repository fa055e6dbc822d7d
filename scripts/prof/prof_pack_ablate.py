"""Ablation of the Pallas pack kernel's per-symbol cost at production K.

Variants (same grid/staging; chain protocol, XOR seeding):
  full  — production kernel (2 dynamic_gather LUTs + bounded window scatter)
  lut   — LUTs + off update only; w[] writes removed (checksum via xor acc)
  lut1  — single-gather packed LUT (p32|len in one u32; valid max_len<=26)
          + off update only
  win   — window scatter only; (p32, ln) faked arithmetically from sym
  full1 — full kernel with the single-gather packed LUT
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import tpu_huffman as th
from tpu_huffman.ops import pallas_encode as pe

table = th.load_static_test_table()
N = 8 * 1024 * 1024
K = pe.pack_k(table)
rng = np.random.default_rng(2024)
symbols = jnp.asarray(rng.integers(0, 256, size=N, dtype=np.uint8))

p32t, lent, min_len, max_len, Wb, G, num_out_words = pe._plan(table, N, K)
B = G * pe.LANES
K4 = K // 4
print(f"K={K} Wb={Wb} B={B} G={G} min={min_len} max={max_len}")
nsym = jnp.asarray(np.full(B, K, np.int32)).reshape(G, 8, 128)
pad_to = B * K


@functools.lru_cache(maxsize=16)
def make_call(mode):
    p32_np = np.asarray(p32t, dtype=np.uint64).astype(np.uint32)
    len_np = np.asarray(lent, dtype=np.int32)
    packed_np = (p32_np | len_np.astype(np.uint32)).view(np.int32)
    p32_np = p32_np.view(np.int32)
    tbl_np = np.stack(
        [
            np.broadcast_to(p32_np[:128], (8, 128)),
            np.broadcast_to(p32_np[128:], (8, 128)),
            np.broadcast_to(len_np[:128], (8, 128)),
            np.broadcast_to(len_np[128:], (8, 128)),
            np.broadcast_to(packed_np[:128], (8, 128)),
            np.broadcast_to(packed_np[128:], (8, 128)),
        ]
    )

    def lookup2(sym, luts):
        idx = sym.astype(jnp.int32)
        lo = idx & 127
        hi = idx >= 128
        plo, phi, llo, lhi = luts[:4]
        p = jnp.where(
            hi,
            jnp.take_along_axis(phi, lo, axis=1),
            jnp.take_along_axis(plo, lo, axis=1),
        )
        ln = jnp.where(
            hi,
            jnp.take_along_axis(lhi, lo, axis=1),
            jnp.take_along_axis(llo, lo, axis=1),
        )
        return jax.lax.bitcast_convert_type(p, jnp.uint32), ln

    def lookup1(sym, luts):
        idx = sym.astype(jnp.int32)
        lo = idx & 127
        hi = idx >= 128
        clo, chi = luts[4], luts[5]
        c = jnp.where(
            hi,
            jnp.take_along_axis(chi, lo, axis=1),
            jnp.take_along_axis(clo, lo, axis=1),
        )
        cu = jax.lax.bitcast_convert_type(c, jnp.uint32)
        ln = (c & 63).astype(jnp.int32)
        return cu & jnp.uint32(~np.uint32(63)), ln

    def lookup_fake(sym, luts):
        p32 = sym << jnp.uint32(24)
        ln = 5 + (sym & jnp.uint32(3)).astype(jnp.int32)
        return p32, ln

    def kernel(syms_ref, nsym_ref, luts_ref, rows_ref, bits_ref, bad_ref):
        luts = tuple(luts_ref[t] for t in range(6))
        ns = nsym_ref[0]
        w = [jnp.zeros((8, 128), jnp.uint32) for _ in range(Wb)]
        off = jnp.zeros((8, 128), jnp.int32)
        bad = jnp.zeros((8, 128), jnp.bool_)
        acc = jnp.zeros((8, 128), jnp.uint32)
        lut = {"full": lookup2, "lut": lookup2, "lut1": lookup1,
               "win": lookup_fake, "full1": lookup1,
               "nop": lookup_fake, "extract": lookup_fake,
               "lut4": lookup2}[mode]
        write_w = mode in ("full", "win", "full1")
        if mode == "nop":
            for j in range(Wb):
                rows_ref[j] = w[j]
            bits_ref[0] = off
            bad_ref[0] = bad.astype(jnp.int32)
            return
        if mode == "extract":
            for u in range(K4):
                packed = syms_ref[0, u]
                for v in range(4):
                    sym = (packed >> jnp.uint32(8 * v)) & jnp.uint32(0xFF)
                    off = off + sym.astype(jnp.int32)
            for j in range(Wb):
                rows_ref[j] = w[j]
            bits_ref[0] = off
            bad_ref[0] = bad.astype(jnp.int32)
            return
        if mode == "lut4":
            offs4 = [jnp.zeros((8, 128), jnp.int32) for _ in range(4)]
            accs4 = [jnp.zeros((8, 128), jnp.uint32) for _ in range(4)]
            for u in range(K4):
                packed = syms_ref[0, u]
                for v in range(4):
                    sym = (packed >> jnp.uint32(8 * v)) & jnp.uint32(0xFF)
                    p32, ln = lookup2(sym, luts)
                    offs4[v] = offs4[v] + ln
                    accs4[v] = accs4[v] ^ p32
            w[0] = accs4[0] ^ accs4[1] ^ accs4[2] ^ accs4[3]
            for j in range(Wb):
                rows_ref[j] = w[j]
            bits_ref[0] = offs4[0] + offs4[1] + offs4[2] + offs4[3]
            bad_ref[0] = bad.astype(jnp.int32)
            return
        for u in range(K4):
            packed = syms_ref[0, u]
            for v in range(4):
                i = u * 4 + v
                sym = (packed >> jnp.uint32(8 * v)) & jnp.uint32(0xFF)
                p32, ln = lut(sym, luts)
                active = i < ns
                bad = bad | (active & (ln == 0))
                p32 = jnp.where(active, p32, jnp.uint32(0))
                ln = jnp.where(active, ln, 0)
                if write_w:
                    widx = off >> 5
                    sh = (off & 31).astype(jnp.uint32)
                    hi = p32 >> sh
                    lo = (p32 << (jnp.uint32(31) - sh)) << jnp.uint32(1)
                    j_lo = (i * min_len) >> 5
                    j_hi = min((i * max_len) >> 5, Wb - 1)
                    j_end = min(j_hi + 1, Wb - 1)
                    eq_prev = None
                    for j in range(j_lo, j_end + 1):
                        eq = (widx == j) if j <= j_hi else None
                        if eq is not None and eq_prev is not None:
                            vv = jnp.where(eq, hi, jnp.where(eq_prev, lo, jnp.uint32(0)))
                        elif eq is not None:
                            vv = jnp.where(eq, hi, jnp.uint32(0))
                        else:
                            vv = jnp.where(eq_prev, lo, jnp.uint32(0))
                        w[j] = w[j] | vv
                        eq_prev = eq
                else:
                    acc = acc ^ p32
                off = off + ln
        if not write_w:
            w[0] = acc
        for j in range(Wb):
            rows_ref[j] = w[j]
        bits_ref[0] = off
        bad_ref[0] = bad.astype(jnp.int32)

    grid_spec = pl.GridSpec(
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, K4, 8, 128), lambda g: (g, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((Wb, 8, 128), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
        ],
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((G * Wb, 8, 128), jnp.uint32),
            jax.ShapeDtypeStruct((G, 8, 128), jnp.int32),
            jax.ShapeDtypeStruct((G, 8, 128), jnp.int32),
        ],
    )

    @jax.jit
    def fn(seed):
        syms = symbols ^ seed.astype(jnp.uint8)
        padded = jnp.pad(syms, (0, pad_to - N))
        syms_u32 = jax.lax.bitcast_convert_type(
            padded.reshape(-1, 4), jnp.uint32
        ).reshape(-1)
        staged = syms_u32.reshape(G, 8, 128, K4).transpose(0, 3, 1, 2)
        rows, bits, bad = call(staged, nsym, jnp.asarray(tbl_np))
        return seed ^ rows.sum(dtype=jnp.uint32) ^ bits.sum().astype(jnp.uint32)

    return fn


for mode in ("nop", "extract", "lut4", "lut", "full"):
    step = make_call(mode)
    s = step(jnp.uint32(1))
    jax.block_until_ready(s)
    best = float("inf")
    for _ in range(3):
        s = jnp.uint32(1)
        t0 = time.perf_counter()
        for _ in range(8):
            s = step(s)
        jax.block_until_ready(s)
        best = min(best, (time.perf_counter() - t0) / 8)
    print(f"{mode:6s}: {best*1e3:8.3f} ms  ({N/best/1e9:.3f} GB/s)", flush=True)
