"""Pallas TPU kernel: mini-block indexed Huffman decode.

The reference decoder advances one symbol at a time through a bit window
(reference: source/huffman.c:230-281); its serial bit-offset chain is the
obstacle to vectorization. This kernel breaks the stream into K-symbol
mini-blocks (bit offsets come from the encoder's BlockIndex — metadata
outside the byte stream, so the stream stays bit-identical to the
reference) and decodes 1024 blocks per grid step as an (8, 128) lane tile,
entirely VMEM-resident.

Two design rules force the kernel's shape (measured on this hardware):

1. **No per-lane dynamic gathers.** XLA's elementwise gather is catastrophic
   on TPU and Mosaic has no per-lane gather primitive. Every "lookup" here
   is either arithmetic or a log2-depth select tree over VMEM-resident
   values:
     - the two stream words a window straddles: select tree over the
       block's Wb-word row (the whole row sits in vector registers),
     - code length + rank: *arithmetic* interval compares — possible
       because compiled tables are "range-monotone" (codes of each length
       occupy one consecutive code range; true for canonical tables and for
       the reference's static test table),
     - rank -> symbol: 4-level select tree over the 16x4-word packed
       permutation table (scalar constants, broadcast into lanes).

2. **One HBM touch per byte.** Per-block word windows are pre-sliced by one
   XLA *row* gather (outer-index + inner-iota; this pattern lowers to fast
   sliced loads, unlike elementwise gathers), staged [G, Wb, 8, 128] so each
   grid step DMAs one contiguous block into VMEM.

The decoded symbols are packed 4-per-u32 (little-endian) to keep the output
tile int32-shaped; the host view reinterprets bytes for free.
"""

from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..tables import HuffmanTable

LANES = 1024  # blocks per grid step, shaped (8, 128)


@dataclasses.dataclass(frozen=True)
class RangeMonotone:
    """Arithmetic decode structure: per code length one consecutive range.

    intervals: tuple of (lo32, hi32, L, sub, bias) — a window w decodes at
    length L iff lo32 <= w < hi32 (bounds MSB-aligned); its table rank is
    (w >> sub) + bias. perm maps rank -> symbol byte.
    """

    intervals: tuple
    perm: np.ndarray  # uint8[256] (padded with 0)

    @property
    def p32(self):
        """perm packed little-endian: [16 rows][4 words]."""
        p = self.perm.astype(np.uint32)
        return [
            [
                int(
                    p[a * 16 + w * 4]
                    | (p[a * 16 + w * 4 + 1] << 8)
                    | (p[a * 16 + w * 4 + 2] << 16)
                    | (p[a * 16 + w * 4 + 3] << 24)
                )
                for w in range(4)
            ]
            for a in range(16)
        ]


def range_monotone_structure(table: HuffmanTable) -> RangeMonotone | None:
    """Extract the arithmetic structure, or None if the table lacks it."""
    by_len: dict[int, list[tuple[int, int]]] = {}
    for s in range(256):
        if table.lengths[s]:
            by_len.setdefault(int(table.lengths[s]), []).append(
                (int(table.patterns[s]), s)
            )
    intervals = []
    perm = np.zeros(256, dtype=np.uint8)
    base = 0
    for L in sorted(by_len):
        codes = sorted(by_len[L])
        first = codes[0][0]
        for i, (c, s) in enumerate(codes):
            if c != first + i:
                return None  # codes of this length are not consecutive
        for i, (_, s) in enumerate(codes):
            perm[base + i] = s
        lo32 = first << (32 - L)
        hi32 = (first + len(codes)) << (32 - L)
        intervals.append((lo32, hi32, L, 32 - L, base - first))
        base += len(codes)
    intervals.sort()
    # Sanity: intervals must not overlap (prefix-free already ensures this).
    for a, b in zip(intervals, intervals[1:]):
        if a[1] > b[0]:
            return None
    return RangeMonotone(intervals=tuple(intervals), perm=perm)


def structure_for(table: HuffmanTable) -> RangeMonotone | None:
    # Cached on the table object itself (object.__setattr__ pierces the
    # frozen dataclass): an id()-keyed module dict can alias a new table
    # at a recycled address after the original is collected.
    try:
        return table._rm_struct
    except AttributeError:
        struct = range_monotone_structure(table)
        object.__setattr__(table, "_rm_struct", struct)
        return struct


def capped_intervals(intervals: tuple, maxlen_cap: int):
    """Split-plan decode (round 5): the interval tuple restricted to code
    lengths <= maxlen_cap, or None when capping gains nothing.

    A window holding a deeper code matches NO kept interval and decodes
    ln == 0 — the same poison contract Kraft-incomplete tables use — so
    the caller re-runs with the full structure on the bad flag. Shorter
    compare chains AND a larger per-window symbol count (M = 32 // max_len
    in the kernels) follow automatically; the perm stays the full table's
    (kept intervals' biases index it unchanged).
    """
    lens = [L for (_lo, _hi, L, _s, _b) in intervals]
    if maxlen_cap <= 0 or maxlen_cap >= max(lens):
        return None
    kept = tuple(iv for iv in intervals if iv[2] <= maxlen_cap)
    return kept if kept else None


@dataclasses.dataclass(frozen=True)
class Predecessor:
    """General-table decode structure: sorted codeword-boundary search.

    Works for ANY prefix-free table (the reference generator accepts any
    prefix tree, generator.c:236-278), unlike RangeMonotone. Sorted by
    MSB-aligned value, the codewords' 32-bit intervals
    [c << (32-L), (c+1) << (32-L)) are disjoint (prefix-freeness), so a
    window w decodes to code i iff i = predecessor(w) over the sorted
    boundaries AND w's top L_i bits equal code i's. The kernel computes
    predecessor(w) as a bucket-seeded branchless binary search: a 256-entry
    root LUT on the top 8 bits gives the starting rank, then ``steps``
    rounds of (gather boundary, compare, conditional advance) — cost
    independent of the table's shape.

    key: hashable static form for the lru-cached pallas_call:
    (bounds[256] u32 MSB-aligned sorted (0xFFFFFFFF padded),
     ents[256] = (len << 8) | sym (0 padded),
     cnt_less[256] root LUT (#boundaries < p << 24),
     steps, m, min_len, max_len).
    """

    key: tuple


def predecessor_structure(table: HuffmanTable) -> Predecessor:
    codes = sorted(
        (
            int(table.patterns[s]) << (32 - int(table.lengths[s])),
            int(table.lengths[s]),
            s,
        )
        for s in range(256)
        if table.lengths[s]
    )
    m = len(codes)
    bounds = tuple(c32 for c32, _, _ in codes) + (0xFFFFFFFF,) * (256 - m)
    ents = tuple((L << 8) | s for _, L, s in codes) + (0,) * (256 - m)
    b_arr = np.asarray(bounds[:m], dtype=np.uint64)
    cnt_less = tuple(
        int(np.searchsorted(b_arr, p << 24, side="left")) for p in range(256)
    )
    pops = [
        (cnt_less[p + 1] if p < 255 else m) - cnt_less[p] for p in range(256)
    ]
    steps = max(1, max(pops).bit_length())
    return Predecessor(
        key=(bounds, ents, cnt_less, steps, m, table.min_len, table.max_len)
    )


def predecessor_structure_for(table: HuffmanTable) -> Predecessor:
    try:
        return table._pred_struct
    except AttributeError:
        struct = predecessor_structure(table)
        object.__setattr__(table, "_pred_struct", struct)
        return struct


def decode_dispatch(table: HuffmanTable) -> tuple:
    """Static (intervals, aux) pair keying the kernel's window decoder.

    Range-monotone tables use the arithmetic interval decoder (fastest);
    any other prefix-free table uses the predecessor-search decoder —
    signalled by ``intervals is None`` with aux = Predecessor.key.
    """
    struct = structure_for(table)
    if struct is not None:
        return struct.intervals, tuple(x for row in struct.p32 for x in row)
    return None, predecessor_structure_for(table).key


def _interval_decode(w, intervals):
    """Arithmetic (rank, ln) from an MSB-aligned 32-bit window ``w``.

    ln == 0 means no code matches (the reference coder's bits_read==0
    contract, source/huffman.c:46-48).

    Two forms, picked by interval count (both measured on the 5-30-bit
    deep table and the 5-10-bit static table at 8 MiB, loop protocol):

    * few lengths — the direct two-compare loop (static: 383 us; the
      telescoped form was 12% slower there: its variable-shift epilogue
      costs more than the compares it saves at 6 intervals);
    * many lengths — TELESCOPING: intervals made contiguous by synthetic
      zero-length gap intervals, so membership is ONE compare per
      boundary and (L, bias) accumulate as select-adds of constant
      deltas, with the variable shift hoisted out of the loop
      (deep table: 735 -> 604 us; this loop is the deep decode kernel's
      floor — window-width clamping only bought 7%).

    The telescoped form packs BOTH accumulators into one u32,
    ``P = ((bias & 0x3FFFFFF) << 6) | L``: the boundaries are sorted, so
    for any window exactly a PREFIX of the chain fires and the sum of
    full-width u32 deltas telescopes exactly to the last fired entry's
    P (mod 2^32) — one compare + one select-add per boundary instead of
    two. rank < 256 <= 2^26, so computing it mod 2^26 from the truncated
    bias is exact."""
    if len(intervals) < 12:
        # Tree-summed terms: every interval's membership test and
        # contribution is independent of the others, so reduce them in a
        # balanced tree (depth ~3) instead of a serial add chain (depth 6)
        # — the inter-symbol critical path (this chain -> ln -> consume
        # shift -> next window) is what the multi-symbol kernel serializes
        # on.
        ln_terms = []
        rank_terms = []
        for (lo, hi, L, sub, bias) in intervals:
            if hi >= 1 << 32:
                ind = w >= jnp.uint32(lo)
            else:
                ind = (w >= jnp.uint32(lo)) & (w < jnp.uint32(hi))
            ln_terms.append(jnp.where(ind, jnp.int32(L), 0))
            rank_terms.append(jnp.where(
                ind,
                (w >> jnp.uint32(sub)).astype(jnp.int32) + jnp.int32(bias),
                0,
            ))

        def tree(ts):
            while len(ts) > 1:
                ts = [
                    ts[2 * i] + ts[2 * i + 1] if 2 * i + 1 < len(ts) else ts[2 * i]
                    for i in range((len(ts) + 1) // 2)
                ]
            return ts[0]

        return tree(rank_terms), tree(ln_terms)

    # Contiguous (lo, L, bias) chain; a leading gap (w < lo_0) falls out
    # naturally: ln stays 0.
    chain = []
    pos = None
    for (lo, hi, L, sub, bias) in intervals:
        if pos is not None and lo != pos:
            chain.append((pos, 0, 0))  # gap: no code matches
        chain.append((lo, L, bias))
        pos = hi
    if pos is not None and pos < (1 << 32):
        chain.append((pos, 0, 0))  # top gap
    # Tree-summed select-adds: the fired-prefix sum is order-independent
    # mod 2^32, so reduce the ~27 deltas in a depth-5 tree instead of a
    # serial chain — the chain sits on the inter-symbol critical path.
    terms = []
    prev_p = 0
    for (lo, L, bias) in chain:
        p = (((bias & 0x3FFFFFF) << 6) | L) & 0xFFFFFFFF
        if p != prev_p:
            t = w >= jnp.uint32(lo)
            terms.append(jnp.where(
                t, jnp.uint32((p - prev_p) & 0xFFFFFFFF), jnp.uint32(0)
            ))
        prev_p = p
    while len(terms) > 1:
        terms = [
            terms[2 * i] + terms[2 * i + 1] if 2 * i + 1 < len(terms) else terms[2 * i]
            for i in range((len(terms) + 1) // 2)
        ]
    acc = terms[0] if terms else jnp.zeros(w.shape, jnp.uint32)
    ln = (acc & jnp.uint32(63)).astype(jnp.int32)
    sh = (jnp.uint32(32) - acc) & jnp.uint32(31)
    rank = (((w >> sh) + (acc >> jnp.uint32(6))) & jnp.uint32(0x3FFFFFF)).astype(jnp.int32)
    rank = jnp.where(ln > 0, rank, 0)
    return rank, ln


def _window_decode_factory(intervals, aux):
    """Kernel-side window decoder for a :func:`decode_dispatch` pair.

    Returns (tbl_np int32[T,8,128] — sublane-broadcast lookup rows passed
    into the kernel as one VMEM input, make(rows) -> decode(w u32[8,128])
    -> (sym u32, ln i32), min_len, max_len). ``ln == 0`` = no code matches
    (the reference coder's bits_read==0 contract, huffman.h:46-48).

    Two implementations:
      * ``intervals`` not None — arithmetic interval compares over the
        range-monotone structure + ONE packed rank->symbol dynamic_gather
        (4 symbol bytes per u32, 64 of 128 lanes used).
      * ``intervals`` None (aux = Predecessor.key) — bucket-seeded
        branchless binary search over the sorted codeword boundaries:
        1 root gather + 1 seed gather + ``steps`` search gathers + 1 packed
        (sym,len) gather + a prefix match. Handles ANY prefix-free table.
    """
    if intervals is not None:
        p32_flat = aux
        lens = [L for (_lo, _hi, L, _sub, _bias) in intervals]
        mn, mx = min(lens), max(lens)
        perm_np = np.zeros(256, np.int32)
        for mi, word in enumerate(p32_flat):
            a, wq = divmod(mi, 4)
            for kk in range(4):
                perm_np[a * 16 + wq * 4 + kk] = (word >> (8 * kk)) & 0xFF
        # Four ranks' symbol bytes per u32: the whole 256-entry rank->symbol
        # table fits one 128-wide row -> ONE lane-axis dynamic_gather on
        # (rank >> 2) + a byte extract.
        perm32_np = np.zeros(128, np.uint32)
        for j in range(64):
            perm32_np[j] = (
                perm_np[4 * j]
                | (perm_np[4 * j + 1] << 8)
                | (perm_np[4 * j + 2] << 16)
                | (perm_np[4 * j + 3] << 24)
            )
        # (A "counting + gather" variant for many-length tables —
        # r = #(lo_i <= w) - 1 then two per-rank gathers — was tried and
        # measured 2x SLOWER than this unrolled compare loop on the
        # 26-length 5-30-bit table: 1359 us vs 735 us per 8 MiB. The
        # per-symbol dynamic_gathers cost far more than compares against
        # scalar constants, which Mosaic schedules almost for free.)
        tbl_np = np.broadcast_to(
            perm32_np.view(np.int32), (1, 8, 128)
        ).copy()

        def make(rows):
            perm32 = rows[0]

            def decode(w):
                rank, ln = _interval_decode(w, intervals)
                e = jnp.take_along_axis(perm32, rank >> 2, axis=1)
                eu = jax.lax.bitcast_convert_type(e, jnp.uint32)
                sh = ((rank & 3) << 3).astype(jnp.uint32)
                return (eu >> sh) & jnp.uint32(0xFF), ln

            return decode

        return tbl_np, make, mn, mx

    bounds, ents, cnt_less, steps, m, mn, mx = aux
    b_np = np.asarray(bounds, np.uint64).astype(np.uint32).view(np.int32)
    e_np = np.asarray(ents, np.uint64).astype(np.uint32)
    c_np = np.asarray(cnt_less, np.uint64).astype(np.uint32)
    ents_row = (e_np[0::2] | (e_np[1::2] << 16)).view(np.int32)
    cnts_row = (c_np[0::2] | (c_np[1::2] << 16)).view(np.int32)
    two_rows = m > 128  # skip the high bounds row (and its gathers) if unused
    rows_np = [np.broadcast_to(b_np[:128], (8, 128))]
    if two_rows:
        rows_np.append(np.broadcast_to(b_np[128:], (8, 128)))
    rows_np += [
        np.broadcast_to(ents_row, (8, 128)),
        np.broadcast_to(cnts_row, (8, 128)),
    ]
    tbl_np = np.stack(rows_np)

    def make(rows):
        if two_rows:
            b_lo, b_hi, ents_r, cnts_r = rows
        else:
            b_lo, ents_r, cnts_r = rows
            b_hi = None

        def g32(row, idx):
            return jax.lax.bitcast_convert_type(
                jnp.take_along_axis(row, idx, axis=1), jnp.uint32
            )

        def gather_b(r):  # r int32 in [0, 256); rows hold sorted boundaries
            if b_hi is None:
                return g32(b_lo, jnp.minimum(r, 127))
            v0 = g32(b_lo, r & 127)
            v1 = g32(b_hi, r & 127)
            return jnp.where(r >= 128, v1, v0)

        def decode(w):
            p = (w >> jnp.uint32(24)).astype(jnp.int32)
            cw = g32(cnts_r, p >> 1)
            c = (
                jnp.where((p & 1) == 1, cw >> jnp.uint32(16), cw)
                & jnp.uint32(0xFFFF)
            ).astype(jnp.int32)
            # r tracks the predecessor rank; a code from an EARLIER bucket
            # can still match (short codes span many buckets), so the seed
            # boundary b[max(c-1, 0)] participates in the final match test.
            r = c - 1
            bsel = gather_b(jnp.maximum(r, 0))
            for kbit in range(steps - 1, -1, -1):
                cand = r + (1 << kbit)
                bc = gather_b(jnp.minimum(cand, 255))
                take = (cand < m) & (bc <= w)
                r = jnp.where(take, cand, r)
                bsel = jnp.where(take, bc, bsel)
            ri = jnp.maximum(r, 0)
            ew = g32(ents_r, ri >> 1)
            e = jnp.where(
                (ri & 1) == 1, ew >> jnp.uint32(16), ew
            ) & jnp.uint32(0xFFFF)
            ln = (e >> jnp.uint32(8)).astype(jnp.int32)
            sym = e & jnp.uint32(0xFF)
            # Match iff w's top ln bits equal the predecessor codeword's
            # (boundaries are MSB-aligned with zero low bits, so a mismatch
            # anywhere — including w < b[0] — fails here naturally).
            sh = (jnp.uint32(32) - ln.astype(jnp.uint32)) & jnp.uint32(31)
            match = ((w ^ bsel) >> sh) == 0
            ln = jnp.where(match & (ln > 0), ln, 0)
            return sym, ln

        return decode

    return tbl_np, make, mn, mx


# Staging row width (words). Wider aligned row-takes are faster on this
# hardware even though they stage more volume: interleaved loop-protocol
# sweep at 8 MiB / K=256 measured 299 us @RW=32, 202 @64, 160 @128
# (row-take cost is per-index as much as per-byte). The in-row slack
# (<RW words) moves into the kernel's entry barrel roll.
STAGE_RW = 128


def _rows_for(Wb: int) -> int:
    """STAGE_RW-word staging rows per block: a <RW-word in-row start plus
    the Wb-word window."""
    return -(-(Wb + STAGE_RW - 1) // STAGE_RW)


def _anchor_interval(K: int, mn: int, mx: int) -> int:
    """Self-re-anchor interval S (symbols): after S symbols the kernel
    knows its own bit offset, rolls the word buffer left by off>>5 and
    resets to a <32-bit phase, so every select window is bounded by the
    LOCAL symbol index il < S instead of the block index i < K — the same
    trick as the encode kernel's _sub_block, but data-driven (no extra
    index metadata). Fixed-length tables keep narrow windows anyway.

    Deep tables (mx > 16, pair-fetch) re-anchor every 16 symbols: with
    the multi-symbol fetch the narrower select trees outweigh the extra
    rolls (round-3 S sweep on the 5-30-bit table at 8 MiB: 512-517 us
    @S=16 vs 524 @32, 546-561 @64, 562 @8). Shallow variable-length
    tables keep S=64 (static-table sweep: 32 was a wash)."""
    if K <= 64 or mn == mx:
        return K
    start = (16, 32, 64) if mx > 16 else (64, 32, 16)
    for s in start + (8, 4):
        if K % s == 0:
            return s
    return K


@functools.lru_cache(maxsize=64)
def _make_pallas_call(intervals, p32_flat, K: int, Wb: int, G: int, interpret: bool):
    """Build the pallas_call for a (table-structure, K, Wb, G) combination.

    ``(intervals, p32_flat)`` is a :func:`decode_dispatch` pair: the
    range-monotone (intervals, perm) form, or (None, Predecessor.key) for
    arbitrary prefix-free tables — the kernel machinery is identical except
    for the window decoder (see _window_decode_factory).

    The staged input is NR=ceil((Wb+31)/32) aligned 32-word rows per block;
    the block's first symbol starts ``rel < 1024`` bits into them. The
    kernel barrel-rolls the rows left by ``rel >> 5`` words (5 log steps),
    then decodes with per-symbol *bounded* select windows: symbol il's
    word index provably lies in [il*min_len >> 5, (31 + il*max_len) >> 5]
    where il is the index since the last re-anchor (see _anchor_interval),
    so the select tree spans only that slice — the dominant kernel cost
    drops from O(K * K*avg_len/32) to O(K * S*avg_len/32).
    """
    K4 = K // 4
    NR = _rows_for(Wb)
    NW = NR * STAGE_RW
    tbl_np, make_dec, mn, mx = _window_decode_factory(intervals, p32_flat)
    T = tbl_np.shape[0]
    S = _anchor_interval(K, mn, mx)
    nsub = K // S
    # Multi-symbol window reuse: one fetched window serves M consecutive
    # symbols, decoded in-window by left-shifting consumed bits — sound
    # because symbol q's top mx bits are genuine while q*mx <= width - mx
    # (interval membership and rank use only the code's own top bits, and
    # the predecessor comparisons are unaffected by garbage below bit
    # 32 - mx; see fetch32/fetch64). The select tree — the kernel's
    # dominant cost — runs once per M symbols instead of once per symbol:
    # static table (mx=10) fetches 3 symbols per 32-bit window, deep
    # tables (mx<=32) 2 per 64-bit pair fetch.
    if 32 // mx >= 2:
        M, PAIR = 32 // mx, False
    else:
        M, PAIR = 2, True
    EXT = 2 if PAIR else 1  # lookahead words past the window

    def kernel(win_ref, rel_ref, nsym_ref, tbl_ref, out_ref, end_ref, bad_ref):
        decode_win = make_dec([tbl_ref[t] for t in range(T)])

        w = [win_ref[0, j] for j in range(NW)]
        rel = rel_ref[0]  # bit offset into the staged rows, [0, STAGE_RW*32)
        a = rel >> 5  # entry word, < STAGE_RW
        zero = jnp.zeros((8, 128), jnp.uint32)
        # Entry roll with progressive shrink: after the full roll only
        # Wb+EXT words matter, but intermediate steps must keep the words
        # the remaining shift can still bring into range.
        entry_ks = [k for k in (64, 32, 16, 8, 4, 2, 1) if k < STAGE_RW]
        rem = sum(entry_ks)
        for k in entry_ks:
            rem -= k
            t = (a & k) != 0
            keep = min(len(w), Wb + EXT + rem)
            w = [
                jnp.where(t, w[j + k] if j + k < len(w) else zero, w[j])
                for j in range(keep)
            ]
        w = w[: Wb + EXT]
        while len(w) < Wb + EXT:
            w.append(zero)

        def fetch(wl, off, lo, hi):
            """32-bit (PAIR: 64-bit) MSB-aligned window at bit ``off``, the
            word index known to lie in [lo, hi]. Returns (wv[, wlo])."""
            widx = off >> 5
            sh = (off & 31).astype(jnp.uint32)
            width = hi - lo + 1
            nb = 1 << max(0, (width - 1).bit_length())
            p0 = [wl[lo + j] for j in range(width)] + [wl[hi]] * (nb - width)
            p1 = [wl[lo + j + 1] for j in range(width)] + [wl[hi + 1]] * (nb - width)
            p2 = (
                [wl[lo + j + 2] for j in range(width)] + [wl[hi + 2]] * (nb - width)
                if PAIR
                else []
            )
            d = widx - lo
            for b in range(max(0, (width - 1).bit_length())):
                t = ((d >> b) & 1) == 1
                p0 = [jnp.where(t, p0[2 * i + 1], p0[2 * i]) for i in range(len(p0) // 2)]
                p1 = [jnp.where(t, p1[2 * i + 1], p1[2 * i]) for i in range(len(p1) // 2)]
                p2 = [jnp.where(t, p2[2 * i + 1], p2[2 * i]) for i in range(len(p2) // 2)]
            wv = (p0[0] << sh) | ((p1[0] >> jnp.uint32(1)) >> (jnp.uint32(31) - sh))
            if not PAIR:
                return wv, None
            wlo = (p1[0] << sh) | ((p2[0] >> jnp.uint32(1)) >> (jnp.uint32(31) - sh))
            return wv, wlo

        ns = nsym_ref[0]
        off = rel & 31
        base = a  # words already rolled off the front (for end_ref)
        bad = jnp.zeros((8, 128), jnp.bool_)
        S4 = S // 4
        # Per-re-anchor roll distance d = off>>5 with off <= 31 + S*mx.
        roll_ks = [k for k in (64, 32, 16, 8, 4, 2, 1) if k <= (31 + S * mx) >> 5]
        # (A 4-symbol group-refill variant — one extract_at roll per group
        # feeding tiny per-symbol trees — measured 45% SLOWER than the
        # per-symbol bounded trees on the deep table: 569 vs 391 us per
        # 8 MiB. The serialized extract->decode chain schedules worse than
        # four independent-ish select trees.)
        wv = zero
        wlo = zero
        for s in range(nsub):
            for u4 in range(S4):
                packed = jnp.zeros((8, 128), jnp.uint32)
                for v in range(4):
                    il = u4 * 4 + v
                    i = s * S + il
                    if il % M == 0:
                        lo = (il * mn) >> 5
                        hi = min((31 + il * mx) >> 5, len(w) - 1 - EXT)
                        wv, wlo = fetch(w, off, lo, hi)
                    sym, ln = decode_win(wv)
                    active = i < ns
                    # Poison flag: an active symbol with no matching code
                    # means the (trusted) index points into a corrupt
                    # stream — the reference's UNKNOWN_SYMBOL condition
                    # (source/huffman.c:246); the wrapper raises. The
                    # window simply repeats (off += 0), emitting flagged
                    # garbage that never reaches the caller.
                    bad = bad | (active & (ln == 0))
                    packed = packed | (
                        jnp.where(active, sym, jnp.uint32(0)) << jnp.uint32(8 * v)
                    )
                    lnw = jnp.where(active, ln, 0)
                    if il % M != M - 1:
                        # In-window consume (skipped on the fetch's last
                        # symbol; the next iteration re-fetches at off).
                        lnu = lnw.astype(jnp.uint32)
                        if PAIR and mx >= 32:
                            # A 32-bit code makes `wv << 32` (and 31 - lnu)
                            # out-of-range — undefined in XLA. Clamp the
                            # shift and select the whole-word case. Only
                            # tables with a 32-bit code pay the selects.
                            big = lnu >= 32
                            sh = jnp.where(big, jnp.uint32(0), lnu)
                            wv = jnp.where(
                                big,
                                wlo,
                                (wv << sh) | ((wlo >> jnp.uint32(1)) >> (jnp.uint32(31) - sh)),
                            )
                            wlo = jnp.where(big, jnp.uint32(0), wlo << sh)
                        elif PAIR:
                            wv = (wv << lnu) | (
                                (wlo >> jnp.uint32(1)) >> (jnp.uint32(31) - lnu)
                            )
                            wlo = wlo << lnu
                        else:
                            wv = wv << lnu
                    off = off + lnw
                out_ref[s * S4 + u4] = packed
            if s < nsub - 1:
                # Self re-anchor: shift the consumed words off the front so
                # the next sub-block starts <32 bits in. The buffer shrinks
                # to what the remaining symbols can possibly touch.
                d = off >> 5
                # Worst case: entry phase <32 bits + rem*mx code bits + a
                # 32-bit lookahead window + the fetch's +EXT words.
                need = min(len(w), ((((nsub - 1 - s) * S) * mx + 31) >> 5) + 2 + EXT)
                rem = sum(roll_ks)
                for k in roll_ks:
                    rem -= k
                    t = (d & k) != 0
                    w = [
                        jnp.where(t, w[j + k] if j + k < len(w) else zero, w[j])
                        for j in range(min(len(w), need + rem))
                    ]
                base = base + d
                off = off - (d << 5)
        end_ref[0] = off + (base << 5)
        bad_ref[0] = bad.astype(jnp.int32)

    grid_spec = pl.GridSpec(
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, NW, 8, 128), lambda g: (g, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((K4, 8, 128), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
        ],
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((G * K4, 8, 128), jnp.uint32),
            jax.ShapeDtypeStruct((G, 8, 128), jnp.int32),
            jax.ShapeDtypeStruct((G, 8, 128), jnp.int32),
        ],
        interpret=interpret,
    )

    def run(win, rel, nsym):
        # tbl_np stays a host constant; materializing it per trace
        # avoids caching a tracer in this lru-cached closure.
        return call(win, rel, nsym, jnp.asarray(tbl_np))

    return run


@functools.lru_cache(maxsize=64)
def _make_pallas_call_dual(intervals, p32_flat, Kh: int, Wb: int, Wbh: int,
                           G: int, interpret: bool):
    """Dual-chain variant of :func:`_make_pallas_call`.

    The decode kernel is LATENCY-bound on the inter-symbol dependency
    (decode_win -> ln -> consume shift -> next window): a constant-step
    probe ran 254 us vs 324 us on the 8 MiB static pipeline. Each lane
    therefore decodes TWO independent symbol chains — the two halves of a
    2*Kh-symbol block, whose mid-offset comes free from the encoder's
    sub-block index — interleaved at the op level so the scheduler
    overlaps their latency chains.

    Inputs per lane: rel (half 0's entry bit within the staged rows),
    relm (half 1's entry bit, same rows), nsym (valid symbols in the
    PAIR). Output tiles: half 0's Kh symbols then half 1's — block order.
    ``Wb`` sizes the staged rows (pair span); ``Wbh`` bounds each half's
    live window after its entry roll.
    """
    K4h = Kh // 4
    NR = _rows_for(Wb)
    NW = NR * STAGE_RW
    tbl_np, make_dec, mn, mx = _window_decode_factory(intervals, p32_flat)
    T = tbl_np.shape[0]
    S = _anchor_interval(Kh, mn, mx)
    nsub = Kh // S
    if 32 // mx >= 2:
        M, PAIR = 32 // mx, False
    else:
        M, PAIR = 2, True
    EXT = 2 if PAIR else 1

    def kernel(win_ref, rel_ref, relm_ref, nsym_ref, tbl_ref, out_ref,
               end_ref, bad_ref):
        decode_win = make_dec([tbl_ref[t] for t in range(T)])
        zero = jnp.zeros((8, 128), jnp.uint32)
        w0 = [win_ref[0, j] for j in range(NW)]

        def entry(rel, max_shift_ks):
            a = rel >> 5
            w = w0
            rem = sum(max_shift_ks)
            for k in max_shift_ks:
                rem -= k
                t = (a & k) != 0
                keep = min(len(w), Wbh + EXT + rem)
                w = [
                    jnp.where(t, w[j + k] if j + k < len(w) else zero, w[j])
                    for j in range(keep)
                ]
            w = w[: Wbh + EXT]
            while len(w) < Wbh + EXT:
                w.append(zero)
            return w, rel & 31, a

        def fetch(wl, off, lo, hi):
            widx = off >> 5
            sh = (off & 31).astype(jnp.uint32)
            width = hi - lo + 1
            nb = 1 << max(0, (width - 1).bit_length())
            p0 = [wl[lo + j] for j in range(width)] + [wl[hi]] * (nb - width)
            p1 = [wl[lo + j + 1] for j in range(width)] + [wl[hi + 1]] * (nb - width)
            p2 = (
                [wl[lo + j + 2] for j in range(width)] + [wl[hi + 2]] * (nb - width)
                if PAIR
                else []
            )
            d = widx - lo
            for b in range(max(0, (width - 1).bit_length())):
                t = ((d >> b) & 1) == 1
                p0 = [jnp.where(t, p0[2 * i + 1], p0[2 * i]) for i in range(len(p0) // 2)]
                p1 = [jnp.where(t, p1[2 * i + 1], p1[2 * i]) for i in range(len(p1) // 2)]
                p2 = [jnp.where(t, p2[2 * i + 1], p2[2 * i]) for i in range(len(p2) // 2)]
            wv = (p0[0] << sh) | ((p1[0] >> jnp.uint32(1)) >> (jnp.uint32(31) - sh))
            if not PAIR:
                return wv, None
            wlo = (p1[0] << sh) | ((p2[0] >> jnp.uint32(1)) >> (jnp.uint32(31) - sh))
            return wv, wlo

        ns = nsym_ref[0]
        # Half 0's entry sits < STAGE_RW words in; half 1's up to the pair
        # span further — its roll needs the 128 step too.
        entry_ks0 = [k for k in (64, 32, 16, 8, 4, 2, 1) if k < STAGE_RW]
        entry_ksm = [k for k in (256, 128, 64, 32, 16, 8, 4, 2, 1) if k < NW]
        wA, offA, baseA = entry(rel_ref[0], entry_ks0)
        wB, offB, baseB = entry(relm_ref[0], entry_ksm)
        bad = jnp.zeros((8, 128), jnp.bool_)
        S4 = S // 4
        roll_ks = [k for k in (64, 32, 16, 8, 4, 2, 1) if k <= (31 + S * mx) >> 5]
        st = {
            "A": [wA, offA, baseA, zero, zero],
            "B": [wB, offB, baseB, zero, zero],
        }
        packs = {"A": zero, "B": zero}

        def step(h, il, i, v):
            w, off, base, wv, wlo = st[h]
            if il % M == 0:
                lo = (il * mn) >> 5
                hi = min((31 + il * mx) >> 5, len(w) - 1 - EXT)
                wv, wlo = fetch(w, off, lo, hi)
            sym, ln = decode_win(wv)
            active = i < ns
            nonlocal_bad = active & (ln == 0)
            packs[h] = packs[h] | (
                jnp.where(active, sym, jnp.uint32(0)) << jnp.uint32(8 * v)
            )
            lnw = jnp.where(active, ln, 0)
            if il % M != M - 1:
                lnu = lnw.astype(jnp.uint32)
                if PAIR and mx >= 32:
                    big = lnu >= 32
                    sh = jnp.where(big, jnp.uint32(0), lnu)
                    wv = jnp.where(
                        big, wlo,
                        (wv << sh) | ((wlo >> jnp.uint32(1)) >> (jnp.uint32(31) - sh)),
                    )
                    wlo = jnp.where(big, jnp.uint32(0), wlo << sh)
                elif PAIR:
                    wv = (wv << lnu) | ((wlo >> jnp.uint32(1)) >> (jnp.uint32(31) - lnu))
                    wlo = wlo << lnu
                else:
                    wv = wv << lnu
            st[h] = [w, off + lnw, base, wv, wlo]
            return nonlocal_bad

        def anchor(h, s):
            w, off, base, wv, wlo = st[h]
            d = off >> 5
            need = min(len(w), ((((nsub - 1 - s) * S) * mx + 31) >> 5) + 2 + EXT)
            rem = sum(roll_ks)
            for k in roll_ks:
                rem -= k
                t = (d & k) != 0
                w = [
                    jnp.where(t, w[j + k] if j + k < len(w) else zero, w[j])
                    for j in range(min(len(w), need + rem))
                ]
            st[h] = [w, off - (d << 5), base + d, wv, wlo]

        for s in range(nsub):
            for u4 in range(S4):
                packs["A"] = zero
                packs["B"] = zero
                for v in range(4):
                    il = u4 * 4 + v
                    i = s * S + il
                    bA = step("A", il, i, v)
                    bB = step("B", il, Kh + i, v)
                    bad = bad | bA | bB
                out_ref[s * S4 + u4] = packs["A"]
                out_ref[K4h + s * S4 + u4] = packs["B"]
            if s < nsub - 1:
                anchor("A", s)
                anchor("B", s)
        _, offB_f, baseB_f, _, _ = st["B"]
        end_ref[0] = offB_f + (baseB_f << 5)
        bad_ref[0] = bad.astype(jnp.int32)

    grid_spec = pl.GridSpec(
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, NW, 8, 128), lambda g: (g, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((2 * K4h, 8, 128), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
        ],
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((G * 2 * K4h, 8, 128), jnp.uint32),
            jax.ShapeDtypeStruct((G, 8, 128), jnp.int32),
            jax.ShapeDtypeStruct((G, 8, 128), jnp.int32),
        ],
        interpret=interpret,
    )

    def run(win, rel, relm, nsym):
        return call(win, rel, relm, nsym, jnp.asarray(tbl_np))

    return run


@functools.partial(jax.jit, static_argnames=("Kh", "Wb", "Wbh", "G", "intervals", "p32_flat", "interpret"))
def _decode_pipeline_dual(words, base, rel, relm, nsym, Kh, Wb, Wbh, G,
                          intervals, p32_flat, interpret):
    """Pair-staged pipeline driving the dual-chain kernel.

    Lanes are PAIRS of Kh-symbol blocks sharing one staged row window.
    base/rel locate half 0, relm half 1 (bit offset in the same rows),
    nsym counts the pair's valid symbols. Staging volume and index count
    match the single-chain pipeline at block size 2*Kh.
    """
    NR = _rows_for(Wb)
    RW = STAGE_RW
    Sp = -(-words.shape[0] // RW) + NR
    spans = jnp.pad(words, (0, Sp * RW - words.shape[0])).reshape(Sp, RW)
    r = base // RW
    rel2 = ((base % RW) << 5) + rel
    relm2 = ((base % RW) << 5) + relm
    win = jnp.concatenate(
        [
            spans.at[r + t].get(mode="clip", indices_are_sorted=True)
            for t in range(NR)
        ],
        axis=1,
    )
    win = win.reshape(G, 8, 128, NR * RW).transpose(0, 3, 1, 2)
    out, end, bad = _make_pallas_call_dual(
        intervals, p32_flat, Kh, Wb, Wbh, G, interpret
    )(
        win, rel2.reshape(G, 8, 128), relm2.reshape(G, 8, 128),
        nsym.reshape(G, 8, 128),
    )
    K4 = 2 * (Kh // 4)
    out = out.reshape(G, K4, 8, 128).transpose(0, 2, 3, 1).reshape(G * LANES, K4)
    return out, end, jnp.any(bad > 0)


def _on_tpu() -> bool:
    """Dispatch seam: True when the real kernel (not the interpreter) runs.
    Kept separate from _use_interpret so tests can force the dispatch path
    while still executing through the interpreter."""
    return jax.default_backend() == "tpu"


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(jax.jit, static_argnames=("K", "Wb", "G", "intervals", "p32_flat", "interpret"))
def _decode_pipeline(words, base, rel, nsym, K, Wb, G, intervals, p32_flat, interpret):
    """words u32[*], base i32[B] (word index of block start), rel i32[B]
    (bit within that word), nsym i32[B] -> (packed symbols, end bits,
    bad_any flag — True when any active symbol hit an invalid prefix,
    the reference's UNKNOWN_SYMBOL condition, source/huffman.c:246).

    Staging is NR aligned 32-word row-takes per block — elementwise window
    gathers cost ~9 ns/element on this rig (MEASURING.md §2) while aligned
    row-takes amortize the per-index cost 32-wide; the in-row misalignment
    moves into the kernel's barrel roll.
    """
    NR = _rows_for(Wb)
    RW = STAGE_RW
    S = -(-words.shape[0] // RW) + NR
    spans = jnp.pad(words, (0, S * RW - words.shape[0])).reshape(S, RW)
    r = base // RW
    rel2 = ((base % RW) << 5) + rel
    # r comes from the block bit-offset index (a cumsum) => sorted; the
    # sorted .at[].get beats jnp.take 7.8 -> 4.5 ms on 3x64Ki row-takes
    # (scripts/prof/prof_sorted_hints.py).
    # (A single layout-emitting lax.gather — offset_dims (1,2) placing the
    # (NR, RW) slice so the transpose pass disappears — was tried and
    # measured 17 ms vs ~320 us: XLA scalarizes multi-offset-dim gathers
    # on TPU. The two-pass row-take + tiled transpose stays.)
    win = jnp.concatenate(
        [
            spans.at[r + t].get(mode="clip", indices_are_sorted=True)
            for t in range(NR)
        ],
        axis=1,
    )
    win = win.reshape(G, 8, 128, NR * RW).transpose(0, 3, 1, 2)
    out, end, bad = _make_pallas_call(intervals, p32_flat, K, Wb, G, interpret)(
        win, rel2.reshape(G, 8, 128), nsym.reshape(G, 8, 128)
    )
    K4 = K // 4
    out = out.reshape(G, K4, 8, 128).transpose(0, 2, 3, 1).reshape(G * LANES, K4)
    return out, end, jnp.any(bad > 0)


def plan_wb(index, table: HuffmanTable) -> int:
    """Per-block word-window size for this (stream, index) pair.

    The static bound K*max_len assumes every code in a block is maximal;
    for compressible data (or deep tables with a matched corpus) the real
    max block span is far smaller — on the 5-30-bit table with a matched
    corpus it is ~4x smaller, and staging volume scales with Wb. The index
    gives every block's actual span, so size the window from the data:
    rel (<32) + span bits + a 32-bit lookahead window at the last symbol +
    the select pair's +1 word. Rounded up to a multiple of 8 so nearby
    streams share a compilation (the jit/pallas cache keys on Wb).
    """
    K = index.symbols_per_block
    static_wb = (K * table.max_len + 31) // 32 + 2
    off = index.bit_offsets.astype(np.int64)
    if off.size == 0:
        return static_wb
    spans = np.diff(off, append=np.int64(index.total_bits))
    max_span = int(spans.max()) if spans.size else 0
    need = (max_span + 94) // 32 + 2
    return min(static_wb, -(-need // 8) * 8)


def supports(table: HuffmanTable, symbols_per_block: int) -> bool:
    """Can the Pallas fast path decode this (table, index) combination?

    Any prefix-free table qualifies (range-monotone tables ride the
    arithmetic interval decoder; the rest use the predecessor-search
    decoder) — matching the reference generator's acceptance of arbitrary
    prefix trees (generator.c:236-278). Only the block-size envelope gates.
    """
    return (
        symbols_per_block % 4 == 0
        and 4 <= symbols_per_block <= 512
        and int(table.lengths.max()) > 0
    )


def pair_dual_inputs(off64, n_symbols, total_bits: int, table: HuffmanTable,
                     Kh: int):
    """Pair a Kh-granular index into dual-chain pipeline inputs.

    Returns (base i32[Bp], rel, relm, nsym, nb, Wb, Wbh, G): per-PAIR word
    base, both halves' entry bits, pair symbol counts, the real pair
    count, and the window plans (pair span for the staged rows, half span
    for each chain's live window). Blocks must be uniform except the tail.
    """
    B = off64.size
    P = B // 2
    has_tail = B % 2 == 1
    G = -(-(P + (1 if has_tail else 0)) // LANES)
    Bp = G * LANES
    off_pairs = off64[0 : 2 * P : 2]
    off_mid = off64[1 : 2 * P : 2]
    nsym_pairs = (
        n_symbols[0 : 2 * P : 2].astype(np.int64)
        + n_symbols[1 : 2 * P : 2].astype(np.int64)
    )
    if has_tail:
        off_pairs = np.concatenate([off_pairs, off64[-1:]])
        off_mid = np.concatenate([off_mid, off64[-1:]])
        nsym_pairs = np.concatenate(
            [nsym_pairs, n_symbols[-1:].astype(np.int64)]
        )
    base = np.zeros(Bp, np.int32)
    rel = np.zeros(Bp, np.int32)
    relm = np.zeros(Bp, np.int32)
    nsym = np.zeros(Bp, np.int32)
    nb = off_pairs.size
    base[:nb] = off_pairs >> 5
    rel[:nb] = off_pairs & 31
    relm[:nb] = off_mid - ((off_pairs >> 5) << 5)
    nsym[:nb] = nsym_pairs
    spans_h = np.diff(off64, append=np.int64(total_bits))
    max_half = int(spans_h.max()) if spans_h.size else 0
    ends = np.concatenate([off64[1:], [np.int64(total_bits)]])
    pair_span_max = int(
        (ends[1 : 2 * P : 2] - off64[0 : 2 * P : 2]).max()
    ) if P else max_half
    static_wb = (2 * Kh * table.max_len + 31) // 32 + 2
    Wb = min(static_wb, -(-((pair_span_max + 94) // 32 + 2) // 8) * 8)
    static_wbh = (Kh * table.max_len + 31) // 32 + 2
    Wbh = min(static_wbh, -(-((max_half + 94) // 32 + 2) // 8) * 8)
    return base, rel, relm, nsym, nb, Wb, Wbh, G


def decode_indexed_pallas(
    data: bytes | np.ndarray,
    index,
    table: HuffmanTable,
) -> bytes:
    """Block-parallel decode on the Pallas fast path.

    Caller must check :func:`supports` first. Bit-exact with the reference
    decoder over indexed streams (same symbols; trailing padding ignored).
    """
    intervals, aux = decode_dispatch(table)
    raw = bytes(data) if isinstance(data, (bytes, bytearray)) else np.asarray(data, dtype=np.uint8).tobytes()
    if index.total_symbols == 0:
        return b""
    K = index.symbols_per_block
    # Split-plan decode (round 5): plan the kernel on the stream's code-
    # length envelope when the index carries it. A deeper-than-cap window
    # poisons (ln == 0) and the full structure re-runs; a genuinely
    # corrupt stream raises from the full attempt.
    attempts = [intervals]
    cap = int(getattr(index, "max_code_len", 0) or 0)
    if intervals is not None and cap:
        capped = capped_intervals(intervals, cap)
        if capped is not None:
            attempts.insert(0, capped)
    # byteswap on device (round 5): the host big-endian astype cost
    # ~140 ms per 8 MiB of a transfer-bound wall; the device swap is a
    # few fused VPU ops whose dispatch overlaps the pipeline's.
    from .selfsync import _words_from_u8_dev

    nw = len(raw) // 4 + 3
    pad8 = np.zeros(nw * 4, np.uint8)
    pad8[: len(raw)] = np.frombuffer(raw, np.uint8)
    words_np = _words_from_u8_dev(jnp.asarray(pad8))

    B = index.bit_offsets.size
    off64 = index.bit_offsets.astype(np.int64)

    # Dual-chain pairing: with a fine-grained index (K <= 256) every lane
    # decodes TWO independent half-chains (latency-bound kernel — see
    # _make_pallas_call_dual); staging volume and index count match the
    # single-chain pipeline at block size 2K. Needs uniform full blocks
    # except the tail (guaranteed by encode_with_index).
    dual_ok = (
        K <= 256
        and B >= 2
        and (index.n_symbols[:-1] == K).all()
    )
    if dual_ok:
        base, rel, relm, nsym, nb, Wb, Wbh, G = pair_dual_inputs(
            off64, index.n_symbols, index.total_bits, table, K
        )
        Bp = G * LANES
        for iv in attempts:
            out, _end, bad = _decode_pipeline_dual(
                jnp.asarray(words_np), jnp.asarray(base), jnp.asarray(rel),
                jnp.asarray(relm), jnp.asarray(nsym),
                K, Wb, Wbh, G, iv, aux, _use_interpret(),
            )
            if not bool(bad):
                break
        if bool(bad):
            from ..errors import UnknownSymbolError

            raise UnknownSymbolError()
        flat = (
            np.ascontiguousarray(np.asarray(out))
            .view(np.uint8)
            .reshape(Bp, 2 * K)[:nb]
        )
        return flat.reshape(-1)[: index.total_symbols].tobytes()

    G = -(-B // LANES)
    Bp = G * LANES
    Wb = plan_wb(index, table)
    base = np.zeros(Bp, np.int32)
    rel = np.zeros(Bp, np.int32)
    nsym = np.zeros(Bp, np.int32)
    base[:B] = off64 >> 5
    rel[:B] = off64 & 31
    nsym[:B] = index.n_symbols

    for iv in attempts:
        out, _end, bad = _decode_pipeline(
            jnp.asarray(words_np), jnp.asarray(base), jnp.asarray(rel),
            jnp.asarray(nsym),
            K, Wb, G, iv, aux,
            _use_interpret(),
        )
        if not bool(bad):
            break
    if bool(bad):
        from ..errors import UnknownSymbolError

        raise UnknownSymbolError()
    flat = (
        np.ascontiguousarray(np.asarray(out))
        .view(np.uint8)
        .reshape(Bp, K)[:B]
    )
    if (index.n_symbols[:-1] == K).all():
        return flat.reshape(-1)[: index.total_symbols].tobytes()
    parts = [flat[b, : int(index.n_symbols[b])] for b in range(B)]
    return np.concatenate(parts).tobytes()
