"""Pallas TPU kernel: block-local Huffman encode (pack) + XLA stitch.

TPU-native replacement for both the reference's serial bit packer
(reference: source/huffman.c:59-105, 161-173) and this repo's first-cut XLA
encode kernel (ops/encode.py). Chain-protocol measurement (MEASURING.md §1)
showed the XLA kernel's true cost on 8 Mi symbols is ~293 ms, split between
two 256-entry elementwise table gathers (~137 ms), a full-length cumsum
(~34 ms) and a 2N-element scatter (~148 ms). This kernel removes all three:

1. **No XLA gathers.** Symbol -> (pattern, length) is two direct
   256-entry LUTs done as lane-axis `tpu.dynamic_gather` pairs over
   128-wide table rows (XLA's elementwise gather costs ~137 ms at 8 Mi on
   this rig; the in-kernel gather is ~13 VPU cycles per 256-LUT lookup and
   beat the 4+2-level select tree + rank-interval arithmetic it replaced
   2x, scripts/prof/prof_dynamic_gather.py).
2. **Block-local pack.** Each lane packs K symbols into Wb VMEM words from
   bit 0 (MSB-first, reference bit order), via a bounded select-scatter:
   symbol i's word index lies in [i*min_len/32, i*max_len/32], so only that
   window of words is touched. 1024 lanes (8x128) per grid step.
3. **Small stitch.** Block bit lengths come back to XLA; an exclusive
   prefix sum over *blocks* (hierarchical log-shift cumsum — XLA's builtin
   1-D cumsum is ~34 ms at 8 Mi on this rig) gives each block's global bit
   offset; rows are funnel-shifted by (offset & 31) elementwise and
   scatter-added at word granularity — ~N*max_len/32 elements instead of 2N.

Bit-exactness: disjoint bit positions make integer add equal bitwise OR, so
the stitched stream is bit-identical to the reference encoder
(source/huffman.c:131-187), including the eos_padding MSB fill of the final
partial byte (source/huffman.c:178-184), applied as one extra synthetic
code at total_bits.

Unknown symbols (length-0 table entries; reference raises at
source/huffman.c:62-64) set a per-block flag, reduced by the wrapper.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..tables import HuffmanTable

LANES = 1024  # blocks per grid step, shaped (8, 128)
STITCH_SW = 128  # stitch scatter row width (words); see prof notes


def _make_byte_lut(p32_flat):
    """byte_lut(idx u32 in [0,256)) -> u32 byte, via a 4+2-level select tree
    over the 256-byte table packed little-endian into 16 rows x 4 u32.
    Same machinery as the decode kernel's perm_select
    (ops/pallas_decode.py) with the constants swapped."""
    P32 = [list(p32_flat[a * 4 : a * 4 + 4]) for a in range(16)]

    def lut(idx):
        a = idx >> 4
        b = idx & 15
        cur = [[jnp.uint32(P32[r][w]) for w in range(4)] for r in range(16)]
        for bit in range(4):
            t = ((a >> bit) & 1) == 1
            cur = [
                [jnp.where(t, cur[2 * i + 1][w], cur[2 * i][w]) for w in range(4)]
                for i in range(len(cur) // 2)
            ]
        row = cur[0]
        t0 = (b & 4) != 0
        w01 = jnp.where(t0, row[1], row[0])
        w23 = jnp.where(t0, row[3], row[2])
        word = jnp.where((b & 8) != 0, w23, w01)
        sh = ((b & 3) << 3).astype(jnp.uint32)
        return (word >> sh) & jnp.uint32(0xFF)

    return lut


def _sub_block(K: int, min_len: int, max_len: int) -> int:
    """Pack-kernel re-anchor interval: symbols per in-kernel sub-block.

    The per-symbol select-scatter window grows linearly with symbol
    position (j spans [i*min_len/32, i*max_len/32]), so packing all K
    symbols from one anchor costs O(K^2*(max_len-min_len)/32) selects per
    block. Re-anchoring every S symbols (pack locally from bit 0, then
    funnel+barrel-merge the S-symbol window into the block buffer) bounds
    the window at ~S*(max_len-min_len)/32 words, so the best S shrinks
    with the table's length SPREAD: S=64 measured fastest on the static
    table (spread 5, prof_true_pack_sub.py) but S=16 on the 5-30-bit
    table (spread 25 — prof_true_deep_s.py: 1625 us @S=8, **1094 @16**,
    1215 @32, 1239 @64 per 8 MiB). Target ~10 window words. Must divide
    K; fixed-length tables (min==max) keep windows width-2 regardless."""
    if K <= 64:
        return K
    if min_len == max_len:
        # Fixed-length tables keep width-2 pack windows from a single
        # anchor, but S also sets the granularity of the free bit-offset
        # side output (offset_granularity): cap it so the decode index
        # (256 symbols) stays derivable at large K.
        return min(K, 256)
    target = max(8, min(64, 320 // max(1, max_len - min_len)))
    for s in (8, 16, 32, 64):  # smallest S >= target (S=16 beat 8 at spread 25)
        if s >= target and K % s == 0:
            return s
    for s in (64, 32, 28, 20, 16, 12, 8, 4):
        if K % s == 0:
            return s
    return K


def gather_tail_plan(K: int, min_len: int, max_len: int, Wb: int,
                     dmin_hint: int | None = None):
    """Plan the gather-based stitch tail (round 4).

    The scatter tail costs ~3-4 ns per scattered row plus full
    read-modify-write passes over the output (measured 262 us of a 498 us
    8 MiB encode, scripts/prof/prof_r4_tail_variants.py). The inverse
    formulation reads each OUTPUT row once from its owner block: out row r
    belongs to block hi(r) = max{b : r0_b <= r} (r0 = offs>>12, the
    block's first SW-word output row), and its content is the owner's
    buffer row (r - r0_hi) PROVIDED each block's buffer rows were pre-OR'd
    in-kernel with the rows of predecessors that reach into them (the
    spill merge). One small scatter + cumsum gives every row's owner.

    Requires every FULL block to advance the output row cursor by at least
    dmin >= 1 rows (else a row can have unboundedly many contributors):
    guaranteed when K*min_len >= 32*SW. ``dmin_hint`` (from a data sample)
    tightens the merge-case set; the pipeline flags any block violating it
    and the caller re-runs with the static bound, mirroring wb_hint.

    Returns (dmin_rows, merge_jmax); dmin_rows == 0 means ineligible
    (callers keep the scatter tail).
    """
    SW = STITCH_SW
    if min_len <= 0 or 128 * K * max_len > 1 << 24:
        return 0, 0
    dmin_static = (K * min_len) // (32 * SW)
    if dmin_static < 1:
        return 0, 0
    dmin = max(dmin_static, int(dmin_hint or 0))
    nrows = -(-(Wb + SW) // SW)
    jmax = (nrows - 1) // dmin
    if jmax > 4:
        # the in-kernel merge holds ~jmax*nrows*SW live row tiles; past
        # this the deep static-bound kernel blows scoped VMEM (measured
        # 26.9M vs 16M at nrows=9). Such plans (worst-case buffers on
        # deep tables) keep the scatter tail; the span-adaptive hinted
        # plan stays gather-eligible.
        return 0, 0
    return dmin, jmax


@functools.lru_cache(maxsize=64)
def _make_pack_call(p32t, lent, K: int, Wb: int, G: int,
                    min_len: int, max_len: int, interpret: bool,
                    S: int | None = None, fuse_sw: int = 0,
                    merge_jmax: int = 0, dmin_rows: int = 0):
    """pallas_call packing K symbols/lane into Wb words, G grid steps.

    p32t/lent: 256-tuples of the left-aligned code pattern (u32 as int)
    and code length per symbol (length 0 = unknown symbol, the reference
    coder contract, huffman.h:36-57).

    S: re-anchor interval (see _sub_block); None or K = single anchor.

    fuse_sw > 0 = FUSED STITCH: the kernel itself computes every block's
    global bit offset (an in-kernel MXU cumsum over the (8,128) tile of
    block bit totals + a VMEM carry tile across the sequential grid) and
    funnel-shifts + barrel-rotates its rows to their global phase, so the
    wrapper needs only the relayout + fuse_sw-wide row scatter-adds — the
    XLA cumsum/funnel/barrel stages (and their HBM round trips) vanish.
    Requires 128*K*max_len <= 2^24 (f32 MXU row-cumsum exactness, same
    envelope as _exclusive_cumsum_blocks' mxu_inner). Outputs become
    (rows[G*Wtot,8,128] pre-barreled with Wtot=fuse_sw*ceil((Wb+fuse_sw)/
    fuse_sw), bits, offs[G,8,128] exclusive block bit offsets, bad).
    """
    K4 = K // 4
    if S is None:
        S = K
    # Symbol -> (pattern, length) via direct 256-entry LUTs as lane-axis
    # tpu.dynamic_gather lookups over 128-wide table rows broadcast across
    # sublanes (+ a bit-7 select). One gather-based 256-LUT costs ~13 VPU
    # cycles vs ~27 for the packed select tree it replaced, and the direct
    # tables also delete the rank->length interval scan (scripts/prof:
    # gather 0.0132 vs tree 0.0272 ns/lookup above a common floor).
    # When max_len <= 26 the left-aligned pattern's low 6 bits are zero, so
    # pattern and length FUSE into one entry (pattern | length): one
    # gather pair + mask instead of two pairs — halves the lookup cost.
    p32_np = np.asarray(p32t, dtype=np.uint64).astype(np.uint32)
    len_np = np.asarray(lent, dtype=np.int32)
    # When max_len <= 12 a whole entry fits 16 bits (12 MSB-aligned pattern
    # bits + 4 length bits), so TWO symbols' entries pack into one u32 and
    # the 256-entry LUT collapses to ONE 128-wide dynamic_gather on
    # (sym >> 1) plus a 16-bit halfword select on (sym & 1) — vs two
    # gathers + select for the 256-row forms below. The gather is the
    # expensive primitive (~13 VPU cycles), so this nearly halves lookup
    # cost; lookups are the largest term of the pack kernel.
    fused16 = max_len <= 12
    fused = max_len <= 26
    if fused16:
        e16 = (p32_np >> 16) | len_np.astype(np.uint32)
        tbl_np = np.broadcast_to(
            (e16[0::2] | (e16[1::2] << 16)).astype(np.uint32).view(np.int32),
            (1, 8, 128),
        ).copy()
    elif fused:
        ent_np = (p32_np | len_np.astype(np.uint32)).view(np.int32)
        tbl_np = np.stack(
            [
                np.broadcast_to(ent_np[:128], (8, 128)),
                np.broadcast_to(ent_np[128:], (8, 128)),
            ]
        )
    else:
        # max_len in (26, 32]: the pattern needs the full u32 (two row
        # gathers + select), but the LENGTHS pack 4-per-u32 into 64 words
        # — ONE row gather on (sym >> 2) + a byte select, cutting the
        # per-symbol lookup from 4 gathers to 3 (round 4: the deep-table
        # pack kernel is lookup-bound, ~13 VPU cycles per 256-LUT gather).
        lp = np.zeros(128, np.uint32)
        lp[:64] = (
            len_np[0::4].astype(np.uint32)
            | (len_np[1::4].astype(np.uint32) << 8)
            | (len_np[2::4].astype(np.uint32) << 16)
            | (len_np[3::4].astype(np.uint32) << 24)
        )
        tbl_np = np.stack(
            [
                np.broadcast_to(p32_np.view(np.int32)[:128], (8, 128)),
                np.broadcast_to(p32_np.view(np.int32)[128:], (8, 128)),
                np.broadcast_to(lp.view(np.int32), (8, 128)),
            ]
        )

    def lookup(sym, luts):
        """sym u32[8,128] -> (p32 left-aligned u32, ln i32; ln==0 unknown)."""
        idx = sym.astype(jnp.int32)
        if fused16:
            (et,) = luts
            e = jnp.take_along_axis(et, idx >> 1, axis=1)
            eu = jax.lax.bitcast_convert_type(e, jnp.uint32)
            h = jnp.where((idx & 1) == 1, eu >> jnp.uint32(16), eu)
            return (h & jnp.uint32(0xFFF0)) << jnp.uint32(16), (
                h & jnp.uint32(15)
            ).astype(jnp.int32)
        lo = idx & 127
        hi = idx >= 128
        if fused:
            elo, ehi = luts
            e = jnp.where(
                hi,
                jnp.take_along_axis(ehi, lo, axis=1),
                jnp.take_along_axis(elo, lo, axis=1),
            )
            eu = jax.lax.bitcast_convert_type(e, jnp.uint32)
            return eu & jnp.uint32(0xFFFFFFC0), (e & 63).astype(jnp.int32)
        plo, phi, lpk = luts
        p = jnp.where(
            hi,
            jnp.take_along_axis(phi, lo, axis=1),
            jnp.take_along_axis(plo, lo, axis=1),
        )
        le = jax.lax.bitcast_convert_type(
            jnp.take_along_axis(lpk, idx >> 2, axis=1), jnp.uint32
        )
        ln = (
            (le >> ((idx & 3) << 3).astype(jnp.uint32)) & jnp.uint32(0xFF)
        ).astype(jnp.int32)
        return jax.lax.bitcast_convert_type(p, jnp.uint32), ln

    nsub = K // S
    S4 = S // 4
    Ws = -(-(S * max_len) // 32) if nsub > 1 else Wb

    n_luts = tbl_np.shape[0]
    SWf = fuse_sw
    nrows_f = -(-(Wb + SWf) // SWf) if SWf else 0
    Wtot_f = SWf * nrows_f
    if SWf:
        # f32 MXU cumsum matrices: column-inclusive upper-tri + all-ones
        # (row totals). Exact while 128*K*max_len <= 2^24 (caller guard).
        tri_np = np.stack(
            [np.triu(np.ones((128, 128), np.float32)),
             np.ones((128, 128), np.float32)]
        )

    def kernel(syms_ref, nsym_ref, luts_ref, *refs):
        if SWf:
            tri_ref, rows_ref, bits_ref, bad_ref, offs_ref, carry_ref = refs
        else:
            rows_ref, bits_ref, bad_ref = refs
        luts = tuple(luts_ref[t] for t in range(n_luts))
        ns = nsym_ref[0]
        zero = jnp.zeros((8, 128), jnp.uint32)
        w = [zero for _ in range(Wb)]
        off = jnp.zeros((8, 128), jnp.int32)
        bad = jnp.zeros((8, 128), jnp.bool_)
        # Pair fusion: fuse symbols 2j,2j+1 into one unit and run ONE
        # select-scatter per pair — the window arithmetic depends only on
        # the unit's start bit, so the dominant window work halves. When
        # two codes fit one u32 (max_len <= 16) the unit is a single
        # pattern word spanning <= 2 output words; for deeper codes
        # (max_len <= 32, always true) it is a TWO-word pattern (phi, plo)
        # spanning <= 3 output words (round 4: this deletes the deep
        # table's one-scatter-per-symbol regime, VERDICT r3 #4).
        pair = max_len <= 16
        pair64 = not pair
        step = 2

        def unit(wl, loff, bad, packed, v, i, il, Wl):
            """Pack one fused-pair unit at local offset ``loff`` into
            ``wl`` (mutated). Returns (bad, new loff)."""
            sym = (packed >> jnp.uint32(8 * v)) & jnp.uint32(0xFF)
            p32, ln = lookup(sym, luts)
            active = i < ns
            bad = bad | (active & (ln == 0))
            p32 = jnp.where(active, p32, jnp.uint32(0))
            ln = jnp.where(active, ln, 0)
            sym1 = (packed >> jnp.uint32(8 * (v + 1))) & jnp.uint32(0xFF)
            p1, l1 = lookup(sym1, luts)
            active1 = (i + 1) < ns
            bad = bad | (active1 & (l1 == 0))
            p1 = jnp.where(active1, p1, jnp.uint32(0))
            l1 = jnp.where(active1, l1, 0)
            if pair:
                p32 = p32 | (p1 >> ln.astype(jnp.uint32))
                ln = ln + l1
            else:
                # two-word fused pattern: phi = p0 | p1 >> l0 (l0 in
                # [1,32] when p1 != 0, so the double shift stays defined),
                # plo = p1 << (32 - l0) (l0 == 0 implies p1 == 0).
                lnu = ln.astype(jnp.uint32)
                phi = p32 | (
                    (p1 >> jnp.uint32(1)) >> ((lnu - 1) & jnp.uint32(31))
                )
                plo = p1 << ((jnp.uint32(32) - lnu) & jnp.uint32(31))
                ln = ln + l1
            widx = loff >> 5
            sh = (loff & 31).astype(jnp.uint32)
            inv = jnp.uint32(31) - sh
            if pair:
                hi = p32 >> sh
                lo = (p32 << inv) << jnp.uint32(1)
            else:
                hi = phi >> sh
                lo = ((phi << inv) << jnp.uint32(1)) | (plo >> sh)
                lo2 = (plo << inv) << jnp.uint32(1)
            # the unit's start bit is within [il*min_len, il*max_len]
            # (loff >= il*min_len always, so widx >= j_lo and the tail
            # halves never land at j_lo). The widx==j compare at word j
            # is reused as the widx==j-k test at word j+k.
            tail = 2 if pair64 else 1
            j_lo = (il * min_len) >> 5
            j_hi = min((il * max_len) >> 5, Wl - 1)
            j_end = min(j_hi + tail, Wl - 1)
            parts = (hi, lo, lo2) if pair64 else (hi, lo)
            eqs = []  # eqs[-1-k] = (widx == j-k), None once past j_hi
            for j in range(j_lo, j_end + 1):
                eqs.append((widx == j) if j <= j_hi else None)
                vv = None  # where(widx==j, hi, where(widx==j-1, lo, ...))
                for k, part in enumerate(parts):
                    if len(eqs) <= k or eqs[-1 - k] is None:
                        continue
                    vv = jnp.where(eqs[-1 - k], part, zero if vv is None else vv)
                if vv is not None:
                    wl[j] = wl[j] | vv
            return bad, loff + ln

        def merge_local(wl, loff, s, w, off):
            """Merge local window ``wl`` into block buffer ``w`` (mutated)
            at bit offset ``off``; returns the new block offset."""
            if s == 0:
                # off == 0 for every lane at the first sub-block.
                for t in range(Ws):
                    w[t] = wl[t]
                return loff
            # Merge the local window into the block buffer at bit
            # offset off: bit-level funnel to the phase (off & 31),
            # then a word-level barrel by d = (off>>5) - j_anchor
            # (d in [0, maxshift]: off is between s*S*min_len and
            # s*S*max_len), then fixed-position ORs from j_anchor.
            rel = (off & 31).astype(jnp.uint32)
            wlf = []
            for t in range(Ws + 1):
                cur = (wl[t] >> rel) if t < Ws else zero
                if t > 0:
                    cur = cur | (
                        (wl[t - 1] << (jnp.uint32(31) - rel)) << jnp.uint32(1)
                    )
                wlf.append(cur)
            j_anchor = (s * S * min_len) >> 5
            # d = (off>>5) - j_anchor is bounded both by the length spread
            # AND by the buffer itself (off + span <= 32*Wb): clamping by
            # Wb cuts the select depth for late sub-blocks of span-adaptive
            # deep-table plans (round 4: 9 -> 5 stages at Wb=108, S=16).
            maxshift = min(
                ((s * S * max_len) >> 5) - j_anchor,
                max(0, Wb - j_anchor - 1),
            )
            width = min(Ws + 1 + maxshift, Wb - j_anchor)
            buf = wlf + [zero] * max(0, width - (Ws + 1))
            buf = buf[:width]
            d = (off >> 5) - j_anchor
            k = 1 << max(0, maxshift.bit_length() - 1)
            while k >= 1:
                sel = (d & k) != 0
                buf = [
                    jnp.where(sel, buf[t - k] if t - k >= 0 else zero, buf[t])
                    for t in range(width)
                ]
                k //= 2
            for t in range(width):
                w[j_anchor + t] = w[j_anchor + t] | buf[t]
            return off + loff

        # Pack sub-blocks into local windows anchored at bit 0: the
        # per-symbol select-scatter window is bounded by the LOCAL index
        # il, not the block index, making total pack work
        # O(K*S*(max-min)/32) instead of O(K^2*(max-min)/32). Sub-blocks
        # are processed in PAIRS with unit ops interleaved. Measured
        # NEUTRAL (495-498 us vs 491-497 at 8 MiB): unlike the decode
        # kernel, the pack is throughput-bound — the scheduler already
        # overlapped adjacent sub-blocks' independent chains across the
        # old loop's iterations. Kept for the explicit structure.
        s = 0
        while s < nsub:
            if nsub == 1:
                for u in range(S4):
                    packed = syms_ref[0, u]
                    for v in range(0, 4, step):
                        il = u * 4 + v
                        bad, off = unit(w, off, bad, packed, v, il, il, Wb)
                bits_ref[0] = off
                s += 1
                continue
            dual = nsub - s >= 2
            wlA = [zero for _ in range(Ws)]
            loffA = jnp.zeros((8, 128), jnp.int32)
            wlB = [zero for _ in range(Ws)] if dual else None
            loffB = jnp.zeros((8, 128), jnp.int32) if dual else None
            for u in range(S4):
                pkA = syms_ref[0, s * S4 + u]
                pkB = syms_ref[0, (s + 1) * S4 + u] if dual else None
                for v in range(0, 4, step):
                    il = u * 4 + v
                    bad, loffA = unit(
                        wlA, loffA, bad, pkA, v, s * S + il, il, Ws
                    )
                    if dual:
                        bad, loffB = unit(
                            wlB, loffB, bad, pkB, v, (s + 1) * S + il, il, Ws
                        )
            bits_ref[s] = loffA
            off = merge_local(wlA, loffA, s, w, off)
            if dual:
                bits_ref[s + 1] = loffB
                off = merge_local(wlB, loffB, s + 1, w, off)
            s += 2 if dual else 1
        # flags: bit 0 = unknown symbol (reference huffman.c:62-64);
        # bit 1 = block overflowed the Wb-word buffer (only possible when
        # the caller passed a span-adaptive wb_hint below the static
        # bound; the wrapper re-runs with the full buffer).
        bad_ref[0] = bad.astype(jnp.int32) | jnp.where(
            off > 32 * Wb, jnp.int32(2), jnp.int32(0)
        )
        if not SWf:
            for j in range(Wb):
                rows_ref[j] = w[j]
            return

        # ---- fused stitch: global offsets + funnel + barrel in VMEM ----
        # Block order is b = g*1024 + sublane*128 + lane (the staging
        # reshape). Exclusive prefix over the tile: lane-inclusive via ONE
        # f32 MXU matmul against the upper-triangular ones (exact while
        # 128*K*max_len <= 2^24, caller-guarded), sublane prefix via 3
        # masked Hillis-Steele rolls in i32, carry across the sequential
        # grid in a VMEM scratch tile (dimension_semantics=ARBITRARY).
        btf = off.astype(jnp.float32)
        lane_incl = jax.lax.dot(
            btf, tri_ref[0], precision=jax.lax.Precision.HIGHEST
        )
        row_tot = jax.lax.dot(
            btf, tri_ref[1], precision=jax.lax.Precision.HIGHEST
        ).astype(jnp.int32)
        acc = row_tot
        for kk in (1, 2, 4):
            rolled = pltpu.roll(acc, kk, 0)
            m = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) >= kk
            acc = acc + jnp.where(m, rolled, 0)
        tot = row_tot
        for kk in (1, 2, 4):
            tot = tot + pltpu.roll(tot, kk, 0)

        @pl.when(pl.program_id(0) == 0)
        def _init():
            carry_ref[...] = jnp.zeros((8, 128), jnp.int32)

        carry = carry_ref[...]
        offs_t = carry + (lane_incl - btf).astype(jnp.int32) + (acc - row_tot)
        carry_ref[...] = carry + tot
        offs_ref[0] = offs_t

        # Bit-level funnel to the global phase (offs & 31).
        rel = (offs_t & 31).astype(jnp.uint32)
        shifted = []
        for t in range(Wb + 1):
            cur = (w[t] >> rel) if t < Wb else zero
            if t > 0:
                cur = cur | ((w[t - 1] << (jnp.uint32(31) - rel)) << jnp.uint32(1))
            shifted.append(cur)
        # Word-level barrel to column (offs>>5) & (SWf-1): the wrapper's
        # scatter-add then works on SWf-wide rows directly.
        col = (offs_t >> 5) & (SWf - 1)
        buf = shifted + [zero] * (Wtot_f - (Wb + 1))
        kk = SWf // 2
        while kk >= 1:
            selk = (col & kk) != 0
            buf = [
                jnp.where(selk, buf[t - kk] if t - kk >= 0 else zero, buf[t])
                for t in range(Wtot_f)
            ]
            kk //= 2
        if merge_jmax:
            # ---- spill merge (gather tail): OR into this block's rows the
            # rows of up to merge_jmax PREDECESSOR blocks that reach them.
            # Block b-j's row u lands in b's local row t = u - D_j where
            # D_j = r0_b - r0_{b-j} (output-row distance). D_j is per-lane
            # data; enumerate the statically possible cases
            # D in [j*dmin_rows, nrows_f-1] and select. Predecessor tiles
            # come from a lane-roll (block order is sublane*128 + lane, so
            # b-j = lane-j with a sublane carry at lane < j); the previous
            # GRID STEP's last blocks are masked here (sublane 0, lane < j)
            # and patched by the wrapper's tiny seam scatter.
            lane_i = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
            subl_i = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
            r0t = offs_t >> jnp.int32(5 + (SWf.bit_length() - 1))

            def prev_j(tile, j, fill):
                r1 = pltpu.roll(tile, j, 1)
                r2 = pltpu.roll(r1, 1, 0)
                v = jnp.where(lane_i < j, r2, r1)
                return jnp.where((subl_i == 0) & (lane_i < j), fill, v)

            new = list(buf)
            for j in range(1, merge_jmax + 1):
                u_min = max(j * dmin_rows, 1)
                if u_min >= nrows_f:
                    break
                # masked lanes get D ~ 2^29: no case fires.
                D = r0t - prev_j(r0t, j, jnp.int32(-(1 << 29)))
                rolled = [
                    [prev_j(buf[u * SWf + w2], j, zero) for w2 in range(SWf)]
                    for u in range(u_min, nrows_f)
                ]
                for Dc in range(u_min, nrows_f):
                    m = D == Dc
                    for t in range(nrows_f - Dc):
                        src_row = rolled[t + Dc - u_min]
                        for w2 in range(SWf):
                            new[t * SWf + w2] = new[t * SWf + w2] | jnp.where(
                                m, src_row[w2], zero
                            )
            buf = new
        for t in range(Wtot_f):
            rows_ref[t] = buf[t]

    in_specs = [
        pl.BlockSpec((1, K4, 8, 128), lambda g: (g, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 8, 128), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    W_out = Wtot_f if SWf else Wb
    out_specs = [
        pl.BlockSpec((W_out, 8, 128), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((nsub, 8, 128), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 8, 128), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((G * W_out, 8, 128), jnp.uint32),
        jax.ShapeDtypeStruct((G * nsub, 8, 128), jnp.int32),
        jax.ShapeDtypeStruct((G, 8, 128), jnp.int32),
    ]
    extra = {}
    if SWf:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))  # tri/ones
        out_specs.append(
            pl.BlockSpec((1, 8, 128), lambda g: (g, 0, 0), memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((G, 8, 128), jnp.int32))
        extra = dict(
            scratch_shapes=[pltpu.VMEM((8, 128), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)
            ),
        )
    call = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        **extra,
    )

    def run(staged_syms, nsym):
        # tbl_np stays a host constant; materializing it per trace avoids
        # caching a tracer in this lru-cached closure.
        if SWf:
            return call(staged_syms, nsym, jnp.asarray(tbl_np), jnp.asarray(tri_np))
        return call(staged_syms, nsym, jnp.asarray(tbl_np))

    return run


def _cumsum_last(x):
    """Inclusive cumsum along the last axis via log-shift adds (pad+slice;
    XLA's builtin 1-D cumsum costs ~34 ms at 8 Mi on this rig)."""
    n = x.shape[-1]
    k = 1
    while k < n:
        shifted = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(k, 0)])[..., :n]
        x = x + shifted
        k *= 2
    return x


def _exclusive_cumsum_blocks(bits, C=128, mxu_inner=False):
    """Exclusive prefix sum of a 1-D i32 array, hierarchical in C-wide rows.

    Returns (offsets, total). Works for any length (pads to a multiple of C).

    ``mxu_inner`` runs the within-row inclusive cumsum as ONE MXU matmul
    against an upper-triangular ones matrix instead of a ~7-op log-shift
    chain (which dominated the ~70 us cumsum stage of the encode pipeline
    at 8 MiB, prof_true_stitch.py). f32 is exact only while each ROW SUM
    stays below 2^24. PRECONDITION (caller-checked at the _encode_pipeline
    call site): pass mxu_inner=True only when 128 * max_row_entry <= 2^24
    (for the encode pipeline: 128 * K * max_len <= 2^24; the default
    pack_k keeps K*max_len <= 32768, far inside). Recursive levels
    accumulate to the full stream bit count and always take the exact
    int32 log-shift path.
    """
    B = bits.shape[0]
    Bp = -(-B // C) * C
    x = jnp.pad(bits, (0, Bp - B)).reshape(Bp // C, C)
    if mxu_inner and C <= 128:
        tri = jnp.asarray(
            np.triu(np.ones((C, C), np.float32)), dtype=jnp.float32
        )
        inner = jax.lax.dot(
            x.astype(jnp.float32), tri,
            precision=jax.lax.Precision.HIGHEST,
        ).astype(jnp.int32)
    else:
        inner = _cumsum_last(x)  # inclusive within each row
    row_tot = inner[:, -1]
    if Bp // C > 1:
        row_off, _ = _exclusive_cumsum_blocks(row_tot, C)
    else:
        row_off = jnp.zeros((1,), jnp.int32)
    incl = (inner + row_off[:, None]).reshape(Bp)[:B]
    total = incl[B - 1]
    offs = incl - bits
    return offs, total


def _pad_code(total_bits, eos_padding):
    """EOS padding as one synthetic left-aligned code at total_bits
    (reference: source/huffman.c:178-184; low pad_len bits of eos_padding)."""
    tail = (total_bits & 7).astype(jnp.int32)
    pad_len = ((8 - tail) & 7).astype(jnp.uint32)
    pad_low = eos_padding.astype(jnp.uint32) & (
        (jnp.uint32(1) << pad_len) - jnp.uint32(1)
    )
    pad_p32 = jnp.where(
        pad_len > 0,
        pad_low << ((jnp.uint32(32) - pad_len) & jnp.uint32(31)),
        jnp.uint32(0),
    )
    return pad_p32, pad_len.astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "K", "G", "Wb", "num_out_words", "p32t", "lent",
        "min_len", "max_len", "interpret", "gather_dmin", "nb",
    ),
)
def _encode_pipeline(
    syms_padded_u32,  # u32[G*1024*K4] little-endian packed symbols
    nsym,             # i32[G*1024] valid symbols per block
    eos_padding,      # u32 scalar (traced: avoids a recompile per value)
    K, G, Wb, num_out_words,
    p32t, lent, min_len, max_len, interpret,
    gather_dmin=0,    # static: >0 = gather stitch tail (gather_tail_plan)
    nb=0,             # static: content blocks (ceil(n/K)); gather tail only
    nb_t=None,        # traced: real content blocks <= nb. Shard bodies
                      # (shard.py) have a data-dependent valid count, so
                      # nb is their static upper bound and this masks the
                      # empty tail blocks out of the gather-tail row-width
                      # scatter (their r0 aliases the last real row).
):
    """Full fused encode: pack kernel + hierarchical offsets + stitch.

    Returns (words u32[num_out_words], total_bits, padded_bits, bad_any
    — any unknown symbol, ovf_any — any block overflowed a span-adaptive
    Wb (caller re-plans with the static bound; with the gather tail this
    flag also covers a block advancing fewer than gather_dmin output rows),
    offs_sub i32[B*nsub] — the absolute starting bit of every S-symbol
    sub-block (S = _sub_block(K, ...)), free from the prefix sum; callers
    derive coarser decode indexes from it).
    """
    K4 = K // 4
    B = G * LANES
    S = _sub_block(K, min_len, max_len)
    nsub = K // S
    staged = syms_padded_u32.reshape(G, 8, 128, K4).transpose(0, 3, 1, 2)
    # Fused stitch (in-kernel offsets + funnel + barrel) whenever the f32
    # MXU row-cumsum envelope holds — the same guard as mxu_inner below.
    fuse_sw = STITCH_SW if (128 * K * max_len <= 1 << 24) else 0
    if gather_dmin and fuse_sw:
        nrows_g = -(-(Wb + fuse_sw) // fuse_sw)
        merge_jmax = (nrows_g - 1) // gather_dmin
    else:
        gather_dmin = 0
        merge_jmax = 0
    out = _make_pack_call(
        p32t, lent, K, Wb, G, min_len, max_len, interpret, S, fuse_sw,
        merge_jmax, gather_dmin,
    )(staged, nsym.reshape(G, 8, 128))
    if fuse_sw:
        rows, bits, bad, offs_t = out
    else:
        rows, bits, bad = out
    flags = bad.reshape(B)
    bad_any = jnp.any((flags & 1) > 0)
    ovf_any = jnp.any((flags & 2) > 0)

    # Block offsets come from per-block totals in the kernel's native
    # (G, nsub, 8, 128) layout — no transpose on the hot path. The
    # sub-block offsets (the free index side output) are assembled in
    # stream order only at the end; when the caller drops them (the
    # fixed-shape bench/entry seam) XLA DCEs that minor-dim-16 transpose,
    # which measured ~160 us at 8 MiB (scripts/prof/prof_true_stitch.py).
    bits4 = bits.reshape(G, nsub, 8, 128)
    bt = bits4.sum(axis=1).reshape(B)  # per-block bit totals, b-order
    if fuse_sw:
        offs = offs_t.reshape(B)
        total_bits = offs[B - 1] + bt[B - 1]
    else:
        # f32 MXU cumsum is exact only while a 128-block row sum stays
        # < 2^24; each block is <= K*max_len bits, so guard on
        # 128*K*max_len. Beyond that (huge public K on a deep table)
        # take the exact int32 path.
        offs, total_bits = _exclusive_cumsum_blocks(
            bt, mxu_inner=(128 * K * max_len <= 1 << 24)
        )
    # span-adaptive output cap (see _plan): never fires on a static plan
    # (num_out_words >= ceil(n*max_len/32)+2 there; n*max_len < 2^31).
    ovf_any = ovf_any | (
        total_bits >= jnp.int32(min(32 * (num_out_words - 1), 2**31 - 1))
    )
    if nsub > 1:
        # Sub-block inclusive chain feeds ONLY the returned index; when the
        # caller drops offs_sub (the fixed-shape bench/entry seam) XLA DCEs
        # the whole chain, including its minor-dim-16 transpose.
        incl = bits4
        k = 1
        while k < nsub:
            incl = incl + jnp.pad(
                incl, ((0, 0), (k, 0), (0, 0), (0, 0))
            )[:, :nsub]
            k *= 2
        excl4 = incl - bits4
        offs_sub = (
            (excl4 + offs.reshape(G, 1, 8, 128))
            .transpose(0, 2, 3, 1)
            .reshape(B * nsub)
        )
    else:
        offs_sub = offs
    # (A pair-merge halving the scatter's index count was tried here and
    # measured a net ~0.5 ms LOSS at 8 MiB: the merge's roll/funnel traffic
    # exceeds the scatter's savings once indices_are_sorted is set —
    # scripts/prof/prof_encode_prod.py, 11.5 ms merged vs 11.0 ms plain.)
    SW = fuse_sw if fuse_sw else STITCH_SW
    nrows = -(-(Wb + SW) // SW)  # Wb+1 words shifted right by up to SW-1
    Wtot = SW * nrows
    if fuse_sw:
        # Kernel rows are already funnel-shifted and barrel-rotated to
        # their global phase: relayout and scatter directly.
        buf = rows.reshape(G, Wtot, 8, 128).transpose(0, 2, 3, 1).reshape(B, Wtot)
    else:
        rows = rows.reshape(G, Wb, 8, 128).transpose(0, 2, 3, 1).reshape(B, Wb)
        rel = (offs & 31).astype(jnp.uint32)

        # Bit-level funnel: align each row to its global bit phase
        # (offs & 31).
        rows_ext = jnp.concatenate([rows, jnp.zeros((B, 1), jnp.uint32)], axis=1)
        prev = jnp.concatenate([jnp.zeros((B, 1), jnp.uint32), rows], axis=1)
        shifted = (rows_ext >> rel[:, None]) | (
            (prev << ((jnp.uint32(31) - rel[:, None]))) << jnp.uint32(1)
        )

        # Word-level barrel: place the Wb+1 words at column
        # (offs>>5)&(SW-1) of an nrows*SW-word buffer, so the scatter
        # becomes nrows SW-wide ROW scatters. Scatter cost is dominated by
        # index count (~19-29 ns/index, scripts/prof/prof_scatter.py /
        # prof_sorted_hints.py); fat rows amortize it. SW=128 beat 32
        # decisively under the honest in-loop protocol (full pipeline at
        # 8 MiB, K=256: 0.88 ms vs 1.25 ms —
        # scripts/prof/prof_true_scatter_variants.py): the wider barrel
        # roll's extra elementwise traffic costs less than the 4x
        # scatter-index reduction saves. Adds stay duplicate-tolerant (no
        # unique_indices): two blocks can share a SW-word row whenever
        # K*min_len < 32*SW bits.
        a = ((offs >> 5) & (SW - 1)).astype(jnp.int32)
        buf = jnp.concatenate(
            [shifted, jnp.zeros((B, Wtot - (Wb + 1)), jnp.uint32)], axis=1
        )
        k = SW // 2
        while k >= 1:
            rolled = jnp.pad(buf, ((0, 0), (k, 0)))[:, :Wtot]
            buf = jnp.where((a[:, None] & k) != 0, rolled, buf)
            k //= 2

    # SW-word output row index (offs is a cumsum => sorted, maybe w/ dups).
    r0 = offs >> (5 + SW.bit_length() - 1)
    Wr = num_out_words // SW
    if gather_dmin:
        # ---- gather tail: one sorted row-take instead of nrows scatter
        # passes (see gather_tail_plan). Owner of out row r is
        # hi(r) = max{b : r0_b <= r}; with W[r] = sum over those b of
        # (nrows - d_{b-1}) (d_{b-1} = r0_b - r0_{b-1}), the owner's
        # buffer row index collapses to src[r] = r + W[r] - nrows.
        r0c = r0[:nb]
        d_prev = jnp.concatenate(
            [jnp.zeros((1,), r0.dtype), r0c[1:] - r0c[:-1]]
        )
        # every FULL block must advance >= gather_dmin rows or the static
        # merge-case set in the kernel is too small: flag -> caller re-runs
        # with the static plan (same protocol as the wb_hint overflow).
        full = nsym[: nb - 1] >= K if nb > 1 else jnp.zeros((0,), jnp.bool_)
        ovf_any = ovf_any | jnp.any(full & (d_prev[1:] < gather_dmin))
        vals_w1 = (nrows - d_prev).astype(jnp.int32)
        uniq = True
        if nb_t is not None:
            # mask empty tail blocks (their r0 aliases the last real row,
            # which also voids the unique-indices promise)
            live = jax.lax.broadcasted_iota(jnp.int32, (nb,), 0) < nb_t
            vals_w1 = jnp.where(live, vals_w1, 0)
            uniq = False
        w1 = jnp.zeros((Wr,), jnp.int32).at[r0c].add(
            vals_w1, mode="drop",
            indices_are_sorted=True, unique_indices=uniq,
        )
        Wexcl, _ = _exclusive_cumsum_blocks(w1, mxu_inner=True)
        src = (
            jax.lax.iota(jnp.int32, Wr) + Wexcl + w1 - jnp.int32(nrows)
        )
        buf2 = buf.reshape(B * nrows, SW)
        out2d = buf2.at[src].get(mode="clip", indices_are_sorted=True)
        # Grid-step seams: the kernel's spill merge cannot see the previous
        # grid step's blocks (the lane roll stops at the step edge), so for
        # each step boundary b0 = g*LANES OR in the predecessor's merged
        # rows u >= d (they hold every contribution from blocks < b0 and
        # none of b0's own content, so add == OR and nothing double-counts).
        seams = [g * LANES for g in range(1, G) if g * LANES < nb]
        if seams and merge_jmax:
            seam_src = jnp.asarray(
                np.array(
                    [
                        (b0 - 1) * nrows + u
                        for b0 in seams
                        for u in range(1, nrows)
                    ],
                    np.int32,
                )
            )
            b0_arr = np.array(
                [b0 for b0 in seams for _ in range(1, nrows)], np.int32
            )
            u_arr = jnp.asarray(
                np.array(
                    [u for _ in seams for u in range(1, nrows)], np.int32
                )
            )
            d_at = (r0[b0_arr] - r0[b0_arr - 1]).astype(jnp.int32)
            dst = jnp.where(
                u_arr >= d_at,
                r0[b0_arr - 1].astype(jnp.int32) + u_arr,
                jnp.int32(Wr),
            )
            out2d = out2d.at[dst].add(buf2[seam_src], mode="drop")
        if nb_t is not None:
            # shard use: the clip-mode row gather can copy real rows past
            # the shard's stream end, and the mesh stitch ORs the WHOLE
            # window — zero everything past the last real output row
            # (in-row bits past total are already zero in the pack buffers)
            row_i = jax.lax.broadcasted_iota(jnp.int32, (Wr, 1), 0)
            r_last = total_bits >> (5 + SW.bit_length() - 1)
            out2d = jnp.where(row_i <= r_last, out2d, jnp.uint32(0))
    else:
        out2d = jnp.zeros((Wr, SW), dtype=jnp.uint32)
        for t in range(nrows):
            out2d = out2d.at[r0 + t].add(
                buf[:, SW * t : SW * (t + 1)], mode="drop",
                indices_are_sorted=True,
            )
    words = out2d.reshape(num_out_words)

    pad_p32, pad_len = _pad_code(total_bits, eos_padding)
    pw = total_bits >> 5
    psh = (total_bits & 31).astype(jnp.uint32)
    words = words.at[pw].add(pad_p32 >> psh, mode="drop")
    words = words.at[pw + 1].add(
        (pad_p32 << (jnp.uint32(31) - psh)) << jnp.uint32(1), mode="drop"
    )
    return words, total_bits, total_bits + pad_len, bad_any, ovf_any, offs_sub


def supports(table: HuffmanTable) -> bool:
    """Pallas pack path needs at least one coded symbol. Unlike the decode
    fast path it does NOT need the range-monotone structure: the direct
    per-symbol (pattern, length) gather tables work for any prefix-free
    table, including non-canonical generator output (reference:
    generator.c accepts arbitrary prefix codes)."""
    return int(table.lengths.max()) > 0


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _plan(table: HuffmanTable, n: int, K: int = 32, wb_cap: int | None = None,
          exact_out: bool = False, out_cap_bits: int | None = None,
          maxlen_cap: int | None = None):
    # Direct per-symbol tables (hashable tuples: they key the lru-cached
    # pallas_call): left-aligned pattern and code length, length 0 =
    # unknown symbol (the reference coder contract, huffman.h:34-36).
    #
    # maxlen_cap (round 5, split-plan encode): plan the kernel on the
    # DATA's code-length envelope instead of the table's worst case.
    # Symbols with codes longer than the cap become length-0 entries, so
    # the kernel's bad flag fires if one appears and the caller re-runs
    # with the full plan (exact-cap callers like _run never need to).
    # A real HPACK stream is ~all 5-10-bit codes while the RFC 7541 table
    # holds 30-bit codes for bytes that never occur in legal header text;
    # the cap restores the fused16 one-gather LUT, single-word pair
    # fusion, the fused stitch, and small windows — the whole shallow-
    # table kernel — on the production workload.
    lengths = table.lengths.astype(np.int64)
    eff_lens = lengths
    if maxlen_cap is not None:
        retained = lengths[(lengths > 0) & (lengths <= maxlen_cap)]
        if retained.size == 0 or maxlen_cap >= int(table.max_len):
            maxlen_cap = None
        else:
            eff_lens = np.where(lengths <= maxlen_cap, lengths, 0)
    eff_max = int(eff_lens.max()) if (eff_lens > 0).any() else int(table.max_len)
    if n * eff_max >= 1 << 31:
        # Device bit offsets are int32; a single call is bounded at 2^31
        # output bits (~256 MiB encoded). The reference's size_t has no
        # such bound — larger inputs go through the streaming protocol
        # (HuffmanEncoder.encode_chunk), whose chunks re-enter here.
        raise ValueError(
            f"input of {n} symbols may exceed 2^31 encoded bits "
            f"(max code length {eff_max}); feed it through "
            "HuffmanEncoder.encode_chunk in smaller pieces"
        )
    patterns = table.patterns.astype(np.uint64)
    shift = (32 - np.minimum(eff_lens, 32)).astype(np.uint64)
    p32 = np.where(eff_lens > 0, (patterns << shift) & 0xFFFFFFFF, 0)
    p32t = tuple(int(v) for v in p32)
    lent = tuple(int(v) for v in eff_lens)
    lens = eff_lens[eff_lens > 0]
    min_len = int(lens.min())
    max_len = int(lens.max())
    Wb = -(-(K * max_len) // 32)
    if wb_cap is not None:
        # Span-adaptive per-block buffer (see plan_wb_encode): real block
        # spans of compressible data sit far below the K*max_len worst
        # case, and the barrel + stitch-scatter stages scale with Wb
        # (prof_true_deep_stages.py: ~63% of the deep-table pipeline).
        # The pack kernel flags any block that overflows; callers re-run
        # with the static bound, so this is purely a fast path.
        Wb = min(Wb, max(-(-max(K * min_len, 256) // 32), -(-wb_cap // 8) * 8))
    B = -(-max(n, 1) // K)
    G = -(-B // LANES)
    # Bucket the output length to a power of two (>=128, the stitch's
    # scatter-row width SW) so nearby input sizes share one compilation;
    # extra words are zero and sliced off. Fixed-shape seams (encode_step)
    # pass exact_out=True: they re-trace per n anyway and the tail cost
    # scales with the output buffer.
    needed = -(-(n * max_len) // 32) + 2
    if out_cap_bits is not None:
        # Span-adaptive OUTPUT buffer (round 4): the worst-case n*max_len
        # sizing makes the stitch tail's zeros/scatter passes scale with
        # max_len instead of the real stream (31 MB vs ~7 MB on the 5-30
        # table's matched corpus). The pipeline flags total_bits running
        # past the buffer and callers re-run with the static bound, like
        # wb_cap. Gather/scatter modes clip/drop so nothing corrupts.
        needed = min(needed, -(-out_cap_bits // 32) + 2)
    if exact_out:
        num_out_words = max(1024, -(-needed // 1024) * 1024)
    else:
        num_out_words = max(128, 1 << (needed - 1).bit_length())
    return p32t, lent, min_len, max_len, Wb, G, num_out_words


def _eff_max_len(table: HuffmanTable, maxlen_cap: int | None) -> int:
    """The planning max code length: the table's, or the data envelope cap
    (split-plan encode) when one is given and attainable."""
    lens = table.lengths[table.lengths > 0]
    max_len = int(lens.max()) if lens.size else 1
    if maxlen_cap is not None and 0 < maxlen_cap < max_len:
        retained = lens[lens <= maxlen_cap]
        if retained.size:
            return int(retained.max())
    return max_len


def pack_k(table: HuffmanTable, maxlen_cap: int | None = None) -> int:
    """Kernel block size (symbols per lane) for this table.

    Targets Wb = ceil(K*max_len/32) ~= 320 VMEM words per lane. Under the
    honest in-loop protocol the final row scatter's per-index cost is the
    pipeline's dominant term (scripts/prof/prof_true_stitch.py: 266 us
    pack+mid vs ~520 us scatter at K=256), and its index count is 2*N/K,
    so bigger blocks win: the full-pipeline K sweep on the static table
    (max_len 10) measured 785 us @K=256, 670 @512, 562 @1024, 592 @2048,
    682 @4096 (scripts/prof/prof_true_encode_k.py). Non-power-of-two K
    (384, 768) hit a ~6x Mosaic layout cliff — stick to powers of two.
    Deep tables scale K down to keep the per-lane row buffer in VMEM.
    """
    if _use_interpret():
        # Off-TPU the kernel runs in the Pallas interpreter, where the
        # K-times-unrolled pack loop dominates wall time; the stitch
        # scatter this tuning amortizes is a TPU cost. Keep blocks small.
        return 32
    max_len = _eff_max_len(table, maxlen_cap)
    # Budget ~640 buffer words per lane: deep tables stay scatter-index
    # bound well past the old 320-word target (5-30-bit table at 8 MiB:
    # 1508 us @K=256 vs 1293 @512), and K=1024 keeps winning on shallow
    # ones. Cap at 1024 (the 8 MiB sweep's optimum; 2048 regressed).
    # This budget is also the STATIC-COMPILE-SAFE envelope: the
    # worst-case Wb = ceil(K*max_len/32) kernel must always compile
    # (deep K=1024/Wb=960 blows scoped VMEM, 27-39M vs the 16M limit),
    # so bigger K is only reachable through pack_k_fast + span hints.
    budget = max(32, 20480 // max_len)
    return min(1024, 1 << (budget.bit_length() - 1))


def pack_k_fast(table: HuffmanTable, maxlen_cap: int | None = None) -> int:
    """Preferred kernel block size when a span-adaptive wb_hint keeps the
    per-lane buffers small (round 4): K=1024 on tables up to 30-bit codes
    makes K*min_len >= 4096, i.e. gather-tail-eligible (min_len >= 4),
    and measured at or above the K=512 rate on the 5-30 table once the
    tail reworks landed. Callers MUST fall back to pack_k(table) when no
    hint is available — the worst-case buffer at this K may not compile."""
    if _use_interpret():
        return 32
    max_len = _eff_max_len(table, maxlen_cap)
    budget = max(32, (40960 if max_len <= 30 else 20480) // max_len)
    return min(1024, 1 << (budget.bit_length() - 1))


def offset_granularity(table: HuffmanTable) -> int:
    """Granularity (symbols) of the bit offsets the encode pipeline emits
    for free: one per pack-kernel re-anchor sub-block."""
    k = pack_k(table)
    lens = table.lengths[table.lengths > 0]
    if lens.size == 0:
        return k
    return _sub_block(k, int(lens.min()), int(lens.max()))


def plan_wb_encode(table: HuffmanTable, sample, K: int | None = None) -> int:
    """Per-block word-buffer size from a representative data sample.

    The encode pipeline's barrel + stitch stages scale with the per-block
    buffer Wb; the static bound assumes every code is maximal, while real
    blocks of compressible data are ~max_len/avg_len smaller. Plan Wb from
    the sample's actual max block span (x1.25 + slack); the kernel's
    overflow flag keeps other inputs correct (the wrapper re-runs with the
    static bound). Mirrors pallas_decode.plan_wb on the decode side.
    """
    if K is None:
        K = pack_k(table)
    arr = (
        np.frombuffer(bytes(sample), dtype=np.uint8)
        if isinstance(sample, (bytes, bytearray))
        else np.asarray(sample, dtype=np.uint8)
    )
    lens = table.lengths[arr].astype(np.int64)
    nb = lens.size // K
    if nb == 0:
        return -(-(K * int(table.max_len)) // 32)
    spans = lens[: nb * K].reshape(nb, K).sum(axis=1)
    max_span = int(spans.max())
    return (max_span + max_span // 4) // 32 + 4


def plan_dmin_encode(table: HuffmanTable, sample, K: int | None = None) -> int:
    """Sample-derived minimum output-row advance per block (gather tail).

    The gather stitch enumerates spill-merge cases D in [j*dmin, nrows);
    a larger dmin (real data packs far above the K*min_len worst case)
    shrinks that set. Derived like plan_wb_encode from the sample's block
    spans; the pipeline's d-check flag + static re-run keeps other inputs
    correct. Returns a rows count (>= the static floor; no margin needed —
    the check is exact and the re-run cheap/rare).
    """
    if K is None:
        K = pack_k(table)
    arr = (
        np.frombuffer(bytes(sample), dtype=np.uint8)
        if isinstance(sample, (bytes, bytearray))
        else np.asarray(sample, dtype=np.uint8)
    )
    lens = table.lengths[arr].astype(np.int64)
    nb = lens.size // K
    lens_pos = table.lengths[table.lengths > 0]
    static = (K * int(lens_pos.min())) // (32 * STITCH_SW) if lens_pos.size else 0
    if nb < 2:
        return static
    ends = np.cumsum(lens[: nb * K].reshape(nb, K).sum(axis=1))
    r0 = np.concatenate([[0], ends[:-1]]) >> np.int64(
        5 + STITCH_SW.bit_length() - 1
    )
    # exact min over adjacent full blocks: the pipeline's d-check flag
    # triggers a static re-run if other data packs tighter, so no margin.
    return max(static, int(np.diff(r0).min()))


def plan_out_encode(table: HuffmanTable, sample, n: int | None = None) -> int:
    """Span-adaptive output-buffer cap in BITS for an n-symbol encode,
    estimated from a representative sample's mean code length (x1.15 +
    slack). The pipeline's output-overflow flag + static re-run guards
    less compressible inputs, mirroring plan_wb_encode."""
    arr = (
        np.frombuffer(bytes(sample), dtype=np.uint8)
        if isinstance(sample, (bytes, bytearray))
        else np.asarray(sample, dtype=np.uint8)
    )
    if n is None:
        n = arr.size
    if arr.size == 0:
        return n * int(table.max_len)
    rate = float(table.lengths[arr].astype(np.int64).mean())
    return min(n * int(table.max_len), int(n * rate * 1.15) + 8192)


def encode_step(table: HuffmanTable, n: int, block_symbols: int = 192,
                eos_padding: int = 0xFF, K: int | None = None,
                wb_hint: int | None = None, dmin_hint: int | None = None,
                out_bits_hint: int | None = None,
                maxlen_cap: int | None = None):
    """Bench/entry seam: returns (encode_fn, finalize_fn) for fixed n.

    encode_fn(symbols u8[n] on device) -> (words, total_bits, padded_bits),
    jit-traceable. finalize_fn runs the same pipeline but checks the
    unknown-symbol and buffer-overflow flags eagerly (raises
    UnknownSymbolError / OverflowError) — used for post-timing
    verification. K=None picks pack_k(table); wb_hint (from
    plan_wb_encode) shrinks the per-block buffers to the sample's real
    span envelope; dmin_hint (plan_dmin_encode) tightens the gather
    stitch's spill-merge cases; maxlen_cap (the sample's max code length)
    plans the whole kernel on the data's length envelope — a symbol with
    a deeper code trips the bad flag, which finalize_fn resolves on host
    (OverflowError = re-plan without the cap; UnknownSymbolError = a
    genuinely uncoded symbol).
    """
    from ..errors import UnknownSymbolError

    if K is None:
        K = pack_k(table, maxlen_cap)
    p32t, lent, min_len, max_len, Wb, G, num_out_words = _plan(
        table, n, K, wb_cap=wb_hint, exact_out=True,
        out_cap_bits=out_bits_hint, maxlen_cap=maxlen_cap,
    )
    shallow = max_len < int(table.max_len)
    gather_dmin, _jm = gather_tail_plan(K, min_len, max_len, Wb, dmin_hint)
    nb = -(-n // K)
    B = G * LANES
    nsym_np = np.zeros(B, np.int32)
    full = n // K
    nsym_np[:full] = K
    if n % K:
        nsym_np[full] = n % K
    nsym = jnp.asarray(nsym_np)
    pad_to = B * K
    interpret = _use_interpret()

    def _pipeline(symbols):
        padded = jnp.pad(symbols, (0, pad_to - n))
        syms_u32 = jax.lax.bitcast_convert_type(
            padded.reshape(-1, 4), jnp.uint32
        ).reshape(-1)
        return _encode_pipeline(
            syms_u32, nsym, jnp.uint32(eos_padding), K, G, Wb, num_out_words,
            p32t, lent, min_len, max_len, interpret,
            gather_dmin=gather_dmin, nb=nb,
        )

    def encode_fn(symbols):
        words, total_bits, padded_bits, _bad, _ovf, _offs = _pipeline(symbols)
        return words, total_bits, padded_bits

    def finalize_fn(symbols):
        words, total_bits, padded_bits, bad, ovf, _offs = _pipeline(symbols)
        if bool(ovf):
            raise OverflowError(
                f"block overflowed the span-adaptive plan (wb_hint="
                f"{wb_hint}, dmin_hint={dmin_hint}); re-plan without hints"
            )
        if bool(bad):
            if shallow:
                # bad under a shallow plan = either a genuinely unknown
                # symbol or one whose code exceeds the cap; resolve on
                # host (post-timing, cost irrelevant).
                lens = table.lengths[np.asarray(symbols)]
                if (lens == 0).any():
                    raise UnknownSymbolError()
                raise OverflowError(
                    f"symbol code length exceeds maxlen_cap={maxlen_cap}; "
                    "re-plan without the cap"
                )
            raise UnknownSymbolError()
        return words, total_bits, padded_bits

    return encode_fn, finalize_fn


def _run(symbols: np.ndarray, table: HuffmanTable, eos_padding: int,
         need_every: int | None = None):
    """Shared one-shot driver: returns (words_dev, total_bits, padded_bits,
    offs_dev, offs_every — the offsets' symbol granularity). Raises
    UnknownSymbolError.

    Uses the table's adaptive span hint when one has been learned from a
    previous encode (the kernel's overflow flag triggers a safe re-run
    with the static bound when the data is less compressible than before).

    Split-plan (round 5): the EXACT code-length envelope of this call's
    data caps the whole plan — a host O(n) table gather, the same order as
    the staging copies this path already pays. Exact means no shallow-miss
    re-run can ever trigger, so the bad flag keeps its reference meaning
    (a genuinely unknown symbol, huffman.c:62-64). ``need_every`` (an
    index granularity the caller will slice at) vetoes a cap whose
    sub-block size would not divide it.
    """
    from ..errors import UnknownSymbolError

    n = symbols.size
    eff = int(table.lengths[symbols].max()) if n else 0
    cap = eff if 0 < eff < int(table.max_len) else None
    K = pack_k(table, cap)
    if cap is not None and need_every is not None:
        lens_r = table.lengths[(table.lengths > 0) & (table.lengths <= cap)]
        S_c = _sub_block(K, int(lens_r.min()), int(lens_r.max()))
        if need_every % S_c:
            cap = None
            K = pack_k(table)
    # Adaptive span hints live ON the table (object.__setattr__ pierces
    # the frozen dataclass): an id()-keyed dict can alias a recycled
    # address after the original table is collected. They are only valid
    # under the plan shape they were learned at (keyed by (K, cap)).
    nb = -(-n // K)
    hints_ok = getattr(table, "_hint_key", None) == (K, cap)
    rate = getattr(table, "_rate_hint", None) if hints_ok else None
    out_cap = (int(n * rate) + 8192) if rate is not None else None
    for wb_cap, dmin_hint, cap_bits in (
        (
            getattr(table, "_wb_hint", None) if hints_ok else None,
            getattr(table, "_dmin_hint", None) if hints_ok else None,
            out_cap,
        ),
        (None, None, None),
    ):
        p32t, lent, min_len, max_len, Wb, G, num_out_words = _plan(
            table, n, K, wb_cap=wb_cap, out_cap_bits=cap_bits,
            maxlen_cap=cap,
        )
        gather_dmin, _jm = gather_tail_plan(
            K, min_len, max_len, Wb, dmin_hint
        )
        B = G * LANES
        nsym_np = np.zeros(B, np.int32)
        full = n // K
        nsym_np[:full] = K
        if n % K:
            nsym_np[full] = n % K
        pad_to = B * K
        padded = np.zeros(pad_to, np.uint8)
        padded[:n] = symbols
        syms_u32 = padded.view("<u4")
        words, total_bits, padded_bits, bad, ovf, offs = _encode_pipeline(
            jnp.asarray(syms_u32), jnp.asarray(nsym_np),
            jnp.uint32(eos_padding),
            K, G, Wb, num_out_words,
            p32t, lent, min_len, max_len,
            _use_interpret(),
            gather_dmin=gather_dmin, nb=nb,
        )
        if (
            wb_cap is not None or dmin_hint is not None or cap_bits is not None
        ) and bool(ovf):
            continue  # data outgrew the learned hints: static-bound re-run
        break
    if bool(bad):
        lens = table.lengths[symbols]
        idx = int(np.argmax(lens == 0))
        raise UnknownSymbolError(index=idx, symbol=int(symbols[idx]))
    # Learn/refresh the span hints from this stream's sub-block offsets
    # (host work O(blocks)): max block span x1.25 + slack for Wb, min
    # output-row advance for the gather stitch's merge-case set.
    S = _sub_block(K, min_len, max_len)
    step = K // S
    offs_np = np.asarray(offs).astype(np.int64)
    blk = offs_np[::step]
    if blk.size > 1:
        spans = np.diff(blk, append=np.int64(int(total_bits)))
        ms = int(spans.max())
        object.__setattr__(table, "_hint_key", (K, cap))
        object.__setattr__(table, "_wb_hint", (ms + ms // 4) // 32 + 4)
        object.__setattr__(table, "_dmin_hint", None)
        nb_full = n // K
        if nb_full > 1:
            r0 = blk[:nb_full] >> np.int64(5 + STITCH_SW.bit_length() - 1)
            static = (K * min_len) // (32 * STITCH_SW)
            object.__setattr__(
                table, "_dmin_hint",
                max(static, int(np.diff(r0).min())),
            )
        object.__setattr__(
            table, "_rate_hint", 1.15 * int(total_bits) / max(1, n)
        )
    return words, total_bits, padded_bits, offs, S


def encode(data, table: HuffmanTable, eos_padding: int = 0xFF):
    """One-shot encode on the Pallas path; reference-bit-identical bytes.

    Returns (bytes, total_bits). Raises UnknownSymbolError like the
    reference (source/huffman.c:62-64).
    """
    from .bitpack import bytes_from_words_np

    symbols = (
        np.frombuffer(bytes(data), dtype=np.uint8)
        if isinstance(data, (bytes, bytearray))
        else np.asarray(data, dtype=np.uint8)
    )
    if symbols.size == 0:
        return b"", 0
    words, total_bits, padded_bits, _offs, _S = _run(symbols, table, eos_padding)
    nbytes = int(padded_bits) // 8
    return bytes_from_words_np(np.asarray(words), nbytes), int(total_bits)


def index_granularity(table: HuffmanTable) -> int:
    """Default BlockIndex granularity: the multiple of offset_granularity
    nearest 256 — the dual-chain decode pipeline pairs 256-entry blocks
    into 512-symbol lanes of two interleaved half-chains (round-3
    interleaved A/B at 8 MiB: dual-from-256 282 us vs single-512 324 us;
    the kernel is latency-bound on the inter-symbol chain). Staging cost
    matches the round-1 K=512 sweet spot because lanes still cover 512
    symbols."""
    g = offset_granularity(table)
    return max(g, min(256, round(256 / g) * g or g))


def encode_with_offsets(data, table: HuffmanTable, eos_padding: int = 0xFF,
                        every: int | None = None):
    """Encode and return (bytes, total_bits, bit_offsets every ``every``
    symbols). ``every`` must be a multiple of offset_granularity(table);
    None picks index_granularity(table). The offsets come free from the
    pack pipeline's prefix sum (cf. ops/encode.py encode_with_index, which
    pays a full scatter kernel for the same)."""
    from .bitpack import bytes_from_words_np

    k = offset_granularity(table)
    if every is None:
        every = index_granularity(table)
    assert every % k == 0
    symbols = (
        np.frombuffer(bytes(data), dtype=np.uint8)
        if isinstance(data, (bytes, bytearray))
        else np.asarray(data, dtype=np.uint8)
    )
    n = symbols.size
    if n == 0:
        return b"", 0, np.zeros(0, np.int32)
    # _run may re-plan on the data's length envelope (split plan); its
    # actual sub-block size S divides ``every`` by construction
    # (need_every vetoes any cap whose S would not).
    words, total_bits, padded_bits, offs, S = _run(
        symbols, table, eos_padding, need_every=every
    )
    n_idx = -(-n // every)
    offsets = np.asarray(offs)[:: every // S][:n_idx].astype(np.int32)
    nbytes = int(padded_bits) // 8
    return (
        bytes_from_words_np(np.asarray(words), nbytes),
        int(total_bits),
        offsets,
    )
