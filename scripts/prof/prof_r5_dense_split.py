"""Stage split of the dense self-sync merge-stitch (round 5).

The foreign-stream interleaved A/B (prof_r5_foreign_ab.py) measured the
dense pipeline at ~365 ms device for 8 MiB while its two kernels cost
only ~42 ms — the merge-stitch assembly holds ~320 ms. This script
mirrors _dense_core's stages with cut points to find the term.

Stages (cumulative):
  k      kernels only (full + patch), reduce exits
  prep   + bitcasts, counts, lensA/pA cumsum
  merge  + the (S, A, max_syms) boundary-match + resolution flags
  repair + the in-graph compacted repair (window gather, kernel, lens)
  chan   + counts splice, N_pad channel scatter + 4 hierarchical cumsums
  full   + the flat body take (== production _segments_pipeline_dense)

Usage: python scripts/prof/prof_r5_dense_split.py [window_s]
"""
import sys
import time
from functools import partial

sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_huffman_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import tpu_huffman as th  # noqa: E402
from tpu_huffman import oracle  # noqa: E402
from tpu_huffman.ops import selfsync  # noqa: E402
from tpu_huffman.ops.selfsync import (  # noqa: E402
    PATCH_SYMS, SEG_SLACK, _make_selfsync_call, _segments_pipeline_fast,
)
from tpu_huffman.ops.pallas_decode import decode_dispatch, _use_interpret  # noqa: E402
from tpu_huffman.ops.pallas_encode import _exclusive_cumsum_blocks  # noqa: E402
from tpu_huffman.ops.bitpack import words_from_bytes_np  # noqa: E402

LANES = 1024
WINDOW = float(sys.argv[1]) if len(sys.argv) > 1 else 60.0
table = th.load_static_test_table()
N = 8 << 20
rng = np.random.default_rng(11)
data = rng.integers(0, 256, size=N, dtype=np.uint8).tobytes()
foreign = oracle.OracleEncoder(oracle.OracleTable(table)).encode(data)
plan = selfsync._plan_segments(len(foreign) * 8, selfsync.SEG_WORDS)
S, G, Bp, seg_bits, need_words = plan
words_np, _ = words_from_bytes_np(foreign)
padded = np.zeros(need_words, np.uint32)
padded[: min(words_np.size, need_words)] = words_np[:need_words]
JW = jnp.asarray(padded)
intervals, aux = decode_dispatch(table)
min_len = max(int(table.min_len), 1)
max_syms = -(-((seg_bits + table.max_len) // min_len + 1) // 4) * 4
S_dl = min(Bp, max(16, 1 << (S - 1).bit_length()))
LEN = jnp.asarray(table.lengths.astype(np.int32))
seg_words = selfsync.SEG_WORDS
interp = _use_interpret()
print(f"S={S} G={G} S_dl={S_dl} max_syms={max_syms}", flush=True)


def core(buf, w0, start_bit, lengths, rs, stage):
    """_dense_core mirror with a cut at ``stage``."""
    A = PATCH_SYMS
    K4 = -(-max_syms // 4)
    raw = _segments_pipeline_fast(
        buf, w0, start_bit, rs, need_words=need_words, G=G,
        seg_words=seg_words, S_dl=S_dl, max_syms=max_syms,
        intervals=intervals, aux=aux, interpret=interp,
    )
    rows0, rowsA, offs0, exits0, exitsA, blast0, badA, entries1 = raw
    if stage == "k":
        return exits0.sum() + exitsA.sum()
    syms0 = jax.lax.bitcast_convert_type(rows0, jnp.uint8).reshape(S_dl, 4 * K4)
    symsA = jax.lax.bitcast_convert_type(rowsA, jnp.uint8).reshape(S_dl, A)
    o16 = jax.lax.bitcast_convert_type(offs0, jnp.uint16).reshape(S_dl, 4 * K4)
    starts0 = o16[:, :max_syms].astype(jnp.int32)
    active = jnp.arange(S_dl, dtype=jnp.int32) < rs
    exits0 = exits0.astype(jnp.int32)
    exitsA = exitsA.astype(jnp.int32)
    blast0 = blast0.astype(jnp.int32)
    e1 = entries1.astype(jnp.int32)
    count0 = jnp.sum((starts0 < seg_bits).astype(jnp.int32), axis=1)
    lensA = jnp.take(lengths, symsA.astype(jnp.int32), axis=0).astype(jnp.int32)
    pA = jnp.cumsum(lensA, axis=1) - lensA + e1[:, None]
    countA = jnp.sum((pA < seg_bits).astype(jnp.int32), axis=1)
    if stage == "prep":
        return count0.sum() + countA.sum() + starts0.sum()
    big = jnp.int32(1 << 30)
    j_iota16 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, max_syms), 2)
    eq = (starts0[:, None, :] == pA[:, :, None]) & (
        j_iota16 < count0[:, None, None]
    )
    j_min = jnp.min(jnp.where(eq, j_iota16, big), axis=2)
    a_iota = jax.lax.broadcasted_iota(jnp.int32, (S_dl, A), 1)
    hit = (j_min < big) & (a_iota < countA[:, None])
    any_hit = jnp.any(hit, axis=1)
    i_s = jnp.where(any_hit, jnp.argmax(hit, axis=1).astype(jnp.int32), 0)
    j_s = jnp.where(
        any_hit, jnp.take_along_axis(j_min, i_s[:, None], axis=1)[:, 0], 0
    )
    merge_bit = jnp.take_along_axis(pA, i_s[:, None], axis=1)[:, 0]
    tail_clean = (blast0 == 0) | (blast0 - 1 < merge_bit)
    use_tail = any_hit & tail_clean
    reached_end = countA < A
    resolved = (badA == 0) & (use_tail | (reached_end & (exitsA == exits0)))
    resolved = resolved | ~active
    fail = active & ~resolved
    i_eff = jnp.where(use_tail, i_s, countA)
    counts = jnp.where(active, i_eff + jnp.where(use_tail, count0 - j_s, 0), 0)
    if stage == "merge":
        return counts.sum() + j_s.sum() + fail.sum()
    R_MAX = 256
    n_fail = jnp.sum(fail.astype(jnp.int32))
    posf = jnp.cumsum(fail.astype(jnp.int32)) - 1
    idx_r = jnp.zeros((LANES,), jnp.int32).at[
        jnp.where(fail & (posf < R_MAX), posf, LANES)
    ].set(jnp.arange(S_dl, dtype=jnp.int32), mode="drop")
    lane_i1 = jnp.arange(LANES, dtype=jnp.int32)
    live = lane_i1 < jnp.minimum(n_fail, R_MAX)
    Wb_r = seg_words + SEG_SLACK
    rows_r = jnp.where(
        live[:, None],
        w0 + idx_r[:, None] * seg_words
        + jnp.arange(Wb_r, dtype=jnp.int32)[None, :],
        0,
    )
    winf = jnp.take(buf, rows_r, mode="clip")
    winf = winf.reshape(1, 8, 128, Wb_r).transpose(0, 3, 1, 2)
    ent_r = jnp.where(live, jnp.take(e1, idx_r, mode="clip"), 0)
    rep_call = _make_selfsync_call(intervals, aux, max_syms, 1, interp, seg_words)
    out_r, exits_r, bad_r = rep_call(winf, ent_r.reshape(1, 8, 128))
    rep_rows = (
        out_r.reshape(1, K4, 8, 128).transpose(0, 2, 3, 1).reshape(LANES, K4)
    )
    rep_syms = jax.lax.bitcast_convert_type(rep_rows, jnp.uint8).reshape(
        LANES, 4 * K4
    )
    exits_r = exits_r.reshape(-1)
    bad_r = bad_r.reshape(-1)
    valid_r = (~live) | (
        (bad_r == 0) & (exits_r == jnp.take(exits0, idx_r, mode="clip"))
    )
    repair_ok = (n_fail <= R_MAX) & jnp.all(valid_r)
    lens_r = jnp.take(
        lengths, rep_syms[:, :max_syms].astype(jnp.int32), axis=0
    ).astype(jnp.int32)
    starts_r = (
        jnp.cumsum(lens_r, axis=1) - lens_r
        + jnp.take(e1, idx_r, mode="clip")[:, None]
    )
    counts_r = jnp.sum((starts_r < seg_bits).astype(jnp.int32), axis=1)
    if stage == "repair":
        return counts_r.sum() + repair_ok.astype(jnp.int32)
    drop_idx = jnp.where(live, idx_r, S_dl)
    counts_spliced = counts.at[drop_idx].set(counts_r, mode="drop")
    lane_map = jnp.zeros((S_dl,), jnp.int32).at[drop_idx].set(
        lane_i1, mode="drop"
    )
    repaired = fail & repair_ok
    counts_asm = jnp.where(repair_ok, counts_spliced, counts)
    comb = jnp.concatenate([symsA, syms0], axis=1)
    stride = A + 4 * K4
    comb_flat = jnp.concatenate(
        [comb.reshape(S_dl * stride), rep_syms.reshape(LANES * 4 * K4)]
    )
    pos_seg, total = _exclusive_cumsum_blocks(counts_asm)
    N_pad = S_dl * (max_syms + A)
    base_seg = jnp.where(
        repaired,
        jnp.int32(S_dl * stride) + lane_map * jnp.int32(4 * K4),
        jnp.arange(S_dl, dtype=jnp.int32) * stride,
    )
    i_eff_asm = jnp.where(repaired, counts_asm, i_eff)
    vals = jnp.stack([base_seg, pos_seg, i_eff_asm, jnp.int32(A) + j_s], axis=1)
    deltas = vals - jnp.concatenate(
        [jnp.zeros((1, 4), jnp.int32), vals[:-1]], axis=0
    )
    w4 = jnp.zeros((N_pad, 4), jnp.int32).at[pos_seg].add(
        deltas, mode="drop", indices_are_sorted=True
    )
    cols = []
    for c in range(4):
        excl, _t = _exclusive_cumsum_blocks(w4[:, c])
        cols.append(excl + w4[:, c])
    if stage == "chan":
        return sum(c[-1] for c in cols) + total
    t_iota = jnp.arange(N_pad, dtype=jnp.int32)
    u = t_iota - cols[1]
    col = jnp.where(u < cols[2], u, u - cols[2] + cols[3])
    src = jnp.clip(cols[0] + col, 0, S_dl * stride + LANES * 4 * K4 - 1)
    body_pad = jnp.take(comb_flat, src)
    return body_pad.astype(jnp.int32).sum() + total


STAGES = ("k", "prep", "merge", "repair", "chan", "full")
fns = {
    s: jax.jit(partial(core, stage=s), static_argnames=())
    for s in STAGES
}
for s in STAGES:
    int(fns[s](JW, jnp.int32(0), jnp.int32(0), LEN, jnp.int32(S)))
best = {s: float("inf") for s in STAGES}
t_end = time.perf_counter() + WINDOW
while time.perf_counter() < t_end:
    for s in STAGES:
        t0 = time.perf_counter()
        int(fns[s](JW, jnp.int32(0), jnp.int32(0), LEN, jnp.int32(S)))
        best[s] = min(best[s], time.perf_counter() - t0)
prev = 0.0
for s in STAGES:
    print(f"{s:7s}: {best[s]*1e3:7.1f} ms  (+{(best[s]-prev)*1e3:6.1f})", flush=True)
    prev = best[s]
