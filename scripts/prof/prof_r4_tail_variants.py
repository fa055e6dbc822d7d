"""Round-4: encode stitch-tail variants, interleaved loop-protocol A/B.

The round-3 split put the fused-stitch pack kernel at ~234 us and the XLA
tail (relayout + 4 SW-wide row scatter-adds into a pow2-padded out2d) at
~259 us per 8 MiB. Variants measured here:

  kernel   pack kernel only (floor)
  trans    kernel + relayout (transpose to (B, Wtot)) + fold
  full     current pipeline (pow2 num_out_words, 4 row scatter-adds)
  exact    num_out_words rounded to 128 instead of pow2
  uniq     exact + unique_indices=True on the row scatters (valid: spans
           >= K*min_len bits > 32*SW => r0 strictly increasing)
  onescat  exact + ONE flat scatter-add of (B, Wtot)-word windows at
           starts (offs>>5)&~(SW-1) (8192 indices instead of 32768;
           windows overlap, adds stay duplicate-tolerant)
"""
import sys, time
from functools import partial
sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])
import numpy as np, jax, jax.numpy as jnp
from tpu_huffman.ops import pallas_encode as pe
from tpu_huffman.ops.pallas_encode import LANES, STITCH_SW
import tpu_huffman as th

WINDOW = float(sys.argv[1]) if len(sys.argv) > 1 else 90.0
table = th.load_static_test_table()
N = 8 * 1024 * 1024
rng = np.random.default_rng(2024)
data_np = rng.integers(0, 256, size=N, dtype=np.uint8)
K = pe.pack_k(table)
wb_hint = pe.plan_wb_encode(table, data_np, K=K)
p32t, lent, min_len, max_len, Wb, G, now_pow2 = pe._plan(table, N, K, wb_cap=wb_hint)
B = G * LANES
S = pe._sub_block(K, min_len, max_len)
fuse_sw = STITCH_SW if (128 * K * max_len <= 1 << 24) else 0
SW = fuse_sw
nrows = -(-(Wb + SW) // SW)
Wtot = SW * nrows
needed = -(-(N * max_len) // 32) + 2
now_exact = -(-needed // 128) * 128
print(f"K={K} Wb={Wb} G={G} S={S} SW={SW} nrows={nrows} Wtot={Wtot} "
      f"out pow2={now_pow2} exact={now_exact}", flush=True)
nsym_np = np.zeros(B, np.int32)
nsym_np[: N // K] = K
nsym = jnp.asarray(nsym_np)
symbols = jnp.asarray(data_np)
pad_to = B * K
interp = pe._use_interpret()
call = pe._make_pack_call(p32t, lent, K, Wb, G, min_len, max_len, interp, S, fuse_sw)


def stage(sym):
    padded = jnp.pad(sym, (0, pad_to - N))
    syms_u32 = jax.lax.bitcast_convert_type(
        padded.reshape(-1, 4), jnp.uint32).reshape(-1)
    staged = syms_u32.reshape(G, 8, 128, K // 4).transpose(0, 3, 1, 2)
    return call(staged, nsym.reshape(G, 8, 128))


def fold(*xs):
    return sum(x.astype(jnp.uint32).sum(dtype=jnp.uint32) for x in xs)


def v_kernel(sym):
    return fold(*stage(sym))


def v_trans(sym):
    rows, bits, bad, offs_t = stage(sym)
    buf = rows.reshape(G, Wtot, 8, 128).transpose(0, 2, 3, 1).reshape(B, Wtot)
    return fold(buf, bits, bad, offs_t)


def tail(sym, num_out_words, mode):
    rows, bits, bad, offs_t = stage(sym)
    offs = offs_t.reshape(B)
    bt = bits.reshape(G, -1, 8, 128).sum(axis=1).reshape(B)
    total_bits = offs[B - 1] + bt[B - 1]
    buf = rows.reshape(G, Wtot, 8, 128).transpose(0, 2, 3, 1).reshape(B, Wtot)
    if mode == "onescat":
        starts = ((offs >> 5) & ~jnp.int32(SW - 1)).astype(jnp.int32)
        dn = jax.lax.ScatterDimensionNumbers(
            update_window_dims=(1,), inserted_window_dims=(),
            scatter_dims_to_operand_dims=(0,))
        words = jax.lax.scatter_add(
            jnp.zeros((num_out_words,), jnp.uint32), starts[:, None], buf, dn,
            indices_are_sorted=True, unique_indices=False,
            mode=jax.lax.GatherScatterMode.FILL_OR_DROP)
    else:
        r0 = offs >> (5 + SW.bit_length() - 1)
        out2d = jnp.zeros((num_out_words // SW, SW), jnp.uint32)
        uniq = mode == "uniq"
        for t in range(nrows):
            out2d = out2d.at[r0 + t].add(
                buf[:, SW * t: SW * (t + 1)], mode="drop",
                indices_are_sorted=True, unique_indices=uniq)
        words = out2d.reshape(num_out_words)
    pad_p32, pad_len = pe._pad_code(total_bits, jnp.uint32(0xFF))
    pw = total_bits >> 5
    psh = (total_bits & 31).astype(jnp.uint32)
    words = words.at[pw].add(pad_p32 >> psh, mode="drop")
    words = words.at[pw + 1].add(
        (pad_p32 << (jnp.uint32(31) - psh)) << jnp.uint32(1), mode="drop")
    return fold(words, bad) ^ total_bits.astype(jnp.uint32)


VARIANTS = [
    ("kernel", lambda s: v_kernel(s)),
    ("trans", lambda s: v_trans(s)),
    ("full", lambda s: tail(s, now_pow2, "add")),
    ("exact", lambda s: tail(s, now_exact, "add")),
    ("uniq", lambda s: tail(s, now_exact, "uniq")),
    ("onescat", lambda s: tail(s, now_exact, "onescat")),
]

# correctness cross-check of the variants against the shipped pipeline
enc_full, _f = pe.encode_step(table, N, 512, K=K, wb_hint=wb_hint)
ref_words, ref_bits, ref_pad = jax.jit(enc_full)(symbols)
ref = np.asarray(ref_words)[: now_exact]
for nm in ("exact", "uniq", "onescat"):
    fn = dict(VARIANTS)[nm]
    # rebuild words (not folded) for comparison
    def words_of(mode, nw):
        rows, bits, bad, offs_t = stage(symbols)
        offs = offs_t.reshape(B)
        bt = bits.reshape(G, -1, 8, 128).sum(axis=1).reshape(B)
        total_bits = offs[B - 1] + bt[B - 1]
        buf = rows.reshape(G, Wtot, 8, 128).transpose(0, 2, 3, 1).reshape(B, Wtot)
        if mode == "onescat":
            starts = ((offs >> 5) & ~jnp.int32(SW - 1)).astype(jnp.int32)
            dn = jax.lax.ScatterDimensionNumbers(
                update_window_dims=(1,), inserted_window_dims=(),
                scatter_dims_to_operand_dims=(0,))
            words = jax.lax.scatter_add(
                jnp.zeros((nw,), jnp.uint32), starts[:, None], buf, dn,
                indices_are_sorted=True, unique_indices=False,
                mode=jax.lax.GatherScatterMode.FILL_OR_DROP)
        else:
            r0 = offs >> (5 + SW.bit_length() - 1)
            out2d = jnp.zeros((nw // SW, SW), jnp.uint32)
            for t in range(nrows):
                out2d = out2d.at[r0 + t].add(
                    buf[:, SW * t: SW * (t + 1)], mode="drop",
                    indices_are_sorted=True, unique_indices=(mode == "uniq"))
            words = out2d.reshape(nw)
        pad_p32, pad_len = pe._pad_code(total_bits, jnp.uint32(0xFF))
        pw = total_bits >> 5
        psh = (total_bits & 31).astype(jnp.uint32)
        words = words.at[pw].add(pad_p32 >> psh, mode="drop")
        words = words.at[pw + 1].add(
            (pad_p32 << (jnp.uint32(31) - psh)) << jnp.uint32(1), mode="drop")
        return words
    got = np.asarray(jax.jit(partial(words_of, nm, now_exact))())
    assert np.array_equal(got, ref), nm
print("variants bit-exact vs shipped pipeline", flush=True)

bodies = []
for nm, fn in VARIANTS:
    def body(i, carry, fn=fn):
        return carry ^ fn(symbols ^ carry.astype(jnp.uint8))
    bodies.append(body)
runs = []
for body in bodies:
    @partial(jax.jit, static_argnames=("k",))
    def run(seed, k, body=body):
        return jax.lax.fori_loop(0, k, body, seed)
    runs.append(run)
K_LO, K_HI = 9, 49
for (nm, _), run in zip(VARIANTS, runs):
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
for (nm, _), h, l in zip(VARIANTS, thv, tl):
    us = (h - l) / (K_HI - K_LO) * 1e6
    print(f"{nm}: {us:.0f} us ({N/(us/1e6)/1e9:.2f} GB/s)", flush=True)
