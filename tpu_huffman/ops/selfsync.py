"""Self-synchronizing parallel decode of foreign (un-indexed) streams.

SURVEY.md §7 "Plan B": streams produced by other encoders (e.g. the
reference C library) carry no block index, so the serial bit-offset chain
must be broken another way. Prefix codes self-synchronize: a decode started
at a wrong bit offset converges to the true codeword-boundary chain after a
short prefix (the classic property exploited by GPU Huffman decoders).

Algorithm (fixpoint over segment entry offsets):
  1. Split the stream into fixed SEG_BITS-bit segments. Segment windows are
     a *regular* reshape of the word stream — no gathers to build.
  2. Every pass, all segments decode in parallel (Pallas lane-tile kernel,
     same select-tree machinery as the indexed path) from their current
     entry-offset estimate, recording symbols, counts, and the exit offset
     (first codeword start >= segment end).
  3. entry[s+1] <- exit[s]; repeat until entries stop changing. Segment 0's
     entry is pinned at 0, so after pass k the first k+1 segments are
     exactly right; self-synchronization makes it converge in ~2 passes in
     practice. All passes chain on device (no host round trips).
  4. The final segment is finished by a host-side bit loop that applies the
     reference termination rules verbatim (need-more-input vs
     UNKNOWN_SYMBOL vs trailing padding, reference: source/huffman.c:240-255).

A lane that hits an invalid prefix mid-stream advances one bit and raises a
poison flag; if the flag survives on the *converged* chain (>= 32 bits from
stream end), the stream genuinely contains an unknown symbol and
UnknownSymbolError is raised — matching the reference's error condition.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..errors import UnknownSymbolError
from ..tables import HuffmanTable
from .bitpack import words_from_bytes_np
from .pallas_decode import LANES, _use_interpret, structure_for

SEG_WORDS = 32                  # 1024 bits per segment
SEG_BITS = SEG_WORDS * 32
SEG_SLACK = 2                   # neighbor words so straddling codes resolve


@functools.lru_cache(maxsize=32)
def _make_selfsync_call(intervals, p32_flat, max_syms: int, G: int, interpret: bool,
                        seg_words: int = SEG_WORDS):
    Wb = seg_words + SEG_SLACK
    K4 = -(-max_syms // 4)
    lens = [L for (_lo, _hi, L, _sub, _bias) in intervals]
    mx = max(lens)
    A = 16  # self-re-anchor interval (symbols), same trick as pallas_decode

    perm_np = np.zeros(256, np.int32)
    for m, word in enumerate(p32_flat):
        aq, wq = divmod(m, 4)
        for kk in range(4):
            perm_np[aq * 16 + wq * 4 + kk] = (word >> (8 * kk)) & 0xFF
    perm_tbl_np = np.stack(
        [
            np.broadcast_to(perm_np[:128], (8, 128)),
            np.broadcast_to(perm_np[128:], (8, 128)),
        ]
    )

    def kernel(win_ref, entry_ref, perm_ref, out_ref, exit_ref, bad_ref):
        from .pallas_decode import _interval_decode

        zero = jnp.zeros((8, 128), jnp.uint32)
        perm_lo = perm_ref[0]
        perm_hi = perm_ref[1]

        def perm_select(rank):
            idx = rank & 127
            return jnp.where(
                rank >= 128,
                jnp.take_along_axis(perm_hi, idx, axis=1),
                jnp.take_along_axis(perm_lo, idx, axis=1),
            ).astype(jnp.uint32)

        def decode_bounded(wl, off, lo, hi):
            widx = off >> 5
            sh = (off & 31).astype(jnp.uint32)
            width = hi - lo + 1
            nb = 1 << max(0, (width - 1).bit_length())
            p0 = [wl[lo + j] for j in range(width)] + [wl[hi]] * (nb - width)
            p1 = [wl[lo + j + 1] for j in range(width)] + [wl[hi + 1]] * (nb - width)
            d = widx - lo
            for b in range(max(0, (width - 1).bit_length())):
                t = ((d >> b) & 1) == 1
                p0 = [jnp.where(t, p0[2 * i + 1], p0[2 * i]) for i in range(len(p0) // 2)]
                p1 = [jnp.where(t, p1[2 * i + 1], p1[2 * i]) for i in range(len(p1) // 2)]
            wv = (p0[0] << sh) | ((p1[0] >> jnp.uint32(1)) >> (jnp.uint32(31) - sh))
            rank, ln = _interval_decode(wv, intervals)
            return perm_select(rank), ln

        w = [win_ref[0, j] for j in range(Wb)] + [zero, zero]
        off0 = entry_ref[0]
        # Entry roll: the entry offset can be anywhere in the window.
        a = off0 >> 5
        for k in (32, 16, 8, 4, 2, 1):
            if k >= Wb + 2:
                continue
            t = (a & k) != 0
            w = [
                jnp.where(t, w[j + k] if j + k < len(w) else zero, w[j])
                for j in range(len(w))
            ]
        base = a
        off = off0 & 31
        bad = jnp.zeros((8, 128), jnp.int32)
        seg_end = jnp.int32(seg_words * 32)
        # Post-anchor roll distance: off <= 31 + A*mx (invalid steps only
        # shorten it).
        roll_ks = [k for k in (16, 8, 4, 2, 1) if k <= (31 + A * mx) >> 5]
        for s4 in range(K4):
            packed = jnp.zeros((8, 128), jnp.uint32)
            for u in range(4):
                i = s4 * 4 + u
                il = i % A
                # Window bound: invalid prefixes step 1 bit, so lo stays 0;
                # hi grows with the local (since-anchor) symbol index.
                hi = min((31 + il * mx) >> 5, len(w) - 2)
                sym, ln = decode_bounded(w, off, 0, hi)
                abs_off = off + (base << 5)
                active = abs_off < seg_end
                invalid = active & (ln == 0)
                # poison: remember the first invalid bit offset
                bad = jnp.where((bad == 0) & invalid, abs_off + 1, bad)
                step = jnp.where(invalid, 1, ln)
                packed = packed | (
                    jnp.where(active, sym, jnp.uint32(0)) << jnp.uint32(8 * u)
                )
                off = jnp.where(active, off + step, off)
                if il == A - 1 and i != max_syms - 1:
                    d = off >> 5
                    for k in roll_ks:
                        t = (d & k) != 0
                        w = [
                            jnp.where(t, w[j + k] if j + k < len(w) else zero, w[j])
                            for j in range(len(w))
                        ]
                    base = base + d
                    off = off - (d << 5)
            out_ref[s4] = packed
        exit_ref[0] = off + (base << 5)
        bad_ref[0] = bad

    grid_spec = pl.GridSpec(
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, Wb, 8, 128), lambda g: (g, 0, 0, 0), memory_space=pltpu.VMEM),
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

    def run(win, entries):
        # perm_tbl_np stays a host constant; materializing it per trace
        # avoids caching a tracer in this lru-cached closure.
        return call(win, entries, jnp.asarray(perm_tbl_np))

    return run


@functools.partial(
    jax.jit,
    static_argnames=(
        "G", "max_syms", "passes", "intervals", "p32_flat", "interpret", "seg_words",
    ),
)
def _selfsync_passes(win, S, G, max_syms, passes, intervals, p32_flat, interpret,
                     seg_words=SEG_WORDS, entry0=0):
    """Fixpoint iterations fully on device, dynamic pass count.

    A `lax.while_loop` drives the Pallas call until the entry offsets stop
    changing or `passes` iterations elapse — ONE compile regardless of how
    many passes a stream needs (self-sync usually converges in 2-3).

    win: [G*LANES, Wb, ...] staged windows (padding segments decode garbage
    harmlessly: their entries never feed a real segment).
    Returns (syms_packed, exits, bad, converged_flag, entries).
    """
    call = _make_selfsync_call(intervals, p32_flat, max_syms, G, interpret, seg_words)
    Bp = G * LANES
    K4 = -(-max_syms // 4)
    seg_idx = jnp.arange(Bp, dtype=jnp.int32)

    e0 = jnp.int32(entry0)
    entries0 = jnp.where(seg_idx == 0, e0, 0)  # pass 0: segment-aligned starts

    def one_pass(entries):
        out, exits, bad = call(win, entries.reshape(G, 8, 128))
        exits = exits.reshape(-1)
        # entry[s+1] = exit[s] - seg_bits (exit is relative to segment s's
        # window; segment s+1's window starts seg_bits later).
        new = jnp.concatenate([e0[None], exits[:-1] - seg_words * 32])
        # only real segments matter; keep padding entries at 0
        new = jnp.where(seg_idx < S, new, 0)
        return new, out, exits, bad.reshape(-1)

    def cond(carry):
        i, converged, *_ = carry
        return (~converged) & (i < passes)

    def body(carry):
        i, _, entries, _, _, _ = carry
        new, out, exits, bad = one_pass(entries)
        converged = jnp.all(new == entries)
        return (i + 1, converged, new, out, exits, bad)

    init = (
        jnp.int32(0),
        jnp.bool_(False),
        entries0,
        jnp.zeros((G * K4, 8, 128), jnp.uint32),
        jnp.zeros(Bp, jnp.int32),
        jnp.zeros(Bp, jnp.int32),
    )
    _, converged, entries, out, exits, bad = jax.lax.while_loop(cond, body, init)
    return out, exits, bad, converged, entries


def _decode_tail_host(table, stream_bits_value, nbits):
    """Decode the final partial segment with exact reference termination.

    stream_bits_value: int holding the remaining bits MSB-first; nbits: its
    length. Mirrors source/huffman.c:230-281 for the tail of a one-shot call.
    Returns (symbols bytearray) or raises UnknownSymbolError.
    """
    out = bytearray()
    pos = 0
    while True:
        left = nbits - pos
        if left <= 0:
            return out, pos
        frag = stream_bits_value & ((1 << left) - 1)  # bits from pos onward
        if left >= 32:
            window = frag >> (left - 32)
        else:
            window = (frag << (32 - left)) & 0xFFFFFFFF
        sym, bits_read = table.decode_window(window)
        if bits_read == 0:
            if left < 32:
                return out, pos  # need more input / done (huffman.c:240-244)
            raise UnknownSymbolError()  # huffman.c:246
        if bits_read > left:
            return out, pos  # trailing padding / partial code (huffman.c:248-255)
        out.append(sym)
        pos += bits_read


def supports(table: HuffmanTable) -> bool:
    return structure_for(table) is not None and table.max_len <= SEG_SLACK * 32


def selfsync_decode(data: bytes | np.ndarray, table: HuffmanTable,
                    seg_words: int = SEG_WORDS) -> bytes:
    """Parallel decode of a foreign stream; bit-exact with the reference."""
    return selfsync_decode_ex(data, table, seg_words)[0]


def selfsync_decode_ex(
    data: bytes | np.ndarray,
    table: HuffmanTable,
    seg_words: int = SEG_WORDS,
    start_bit: int = 0,
) -> tuple[bytes, int]:
    """Parallel decode returning (symbols, end_bit).

    ``end_bit`` is the absolute bit offset where decoding stopped: the start
    of the first code that does not complete within the input (mid-stream
    chunking) or the start of trailing padding (stream end) — exactly the
    resume point the reference decoder's window state encodes. ``start_bit``
    (< 8) lets a streaming caller resume mid-byte.

    Caller should check :func:`supports`. Falls back internally to more
    fixpoint passes if self-synchronization is slow; worst case degrades to
    S passes (pathological streams), still correct.
    """
    struct = structure_for(table)
    assert struct is not None
    assert 0 <= start_bit < 8
    raw = bytes(data) if isinstance(data, (bytes, bytearray)) else np.asarray(
        data, dtype=np.uint8
    ).tobytes()
    if not raw or len(raw) * 8 <= start_bit:
        return b"", start_bit
    seg_bits = seg_words * 32
    total_bits = len(raw) * 8

    def host_all():
        value = int.from_bytes(raw, "big") & ((1 << (total_bits - start_bit)) - 1)
        out, pos = _decode_tail_host(table, value, total_bits - start_bit)
        return bytes(out), start_bit + pos

    # Small streams: the host bit loop is cheaper than a kernel launch.
    if total_bits <= 4 * seg_bits:
        return host_all()

    words_np, _ = words_from_bytes_np(raw)
    # Full segments exclude the stream tail: the last (possibly partial)
    # segment plus one guard segment are finished on host with exact
    # termination rules.
    S_total = -(-total_bits // seg_bits)
    S = S_total - 1 if total_bits % seg_bits else S_total
    S -= 1  # guard segment before the tail
    if S <= 0:
        return host_all()

    # Bucket the grid to powers of two (floor 16 on hardware) so chunked
    # callers with varying stream sizes reuse one compiled pipeline per
    # bucket (S is traced; padding lanes decode garbage harmlessly).
    interp = _use_interpret()
    G = -(-S // LANES)
    G = 1 << (G - 1).bit_length() if G > 1 else 1
    if not interp:
        G = max(G, 16)
    Bp = G * LANES
    Wb = seg_words + SEG_SLACK
    need_words = Bp * seg_words + Wb
    padded = np.zeros(need_words, np.uint32)
    padded[: min(words_np.size, need_words)] = words_np[:need_words]
    # Regular window layout: win[s] = words[s*seg_words : s*seg_words+Wb]
    strided = np.lib.stride_tricks.as_strided(
        padded, shape=(Bp, Wb), strides=(4 * seg_words, 4)
    )
    win = np.ascontiguousarray(strided).reshape(G, 8, 128, Wb).transpose(0, 3, 1, 2)
    win = np.ascontiguousarray(win)

    p32_flat = tuple(x for row in struct.p32 for x in row)
    min_len = max(int(table.min_len), 1)
    max_syms = (seg_bits + table.max_len) // min_len + 1
    max_syms = -(-max_syms // 4) * 4

    jwin = jnp.asarray(win)
    # The while_loop inside stops as soon as entries converge (usually 2-3
    # passes); Bp+1 is the worst-case bound (degenerates to sequential).
    out, exits, bad, converged, entries = _selfsync_passes(
        jwin, S, G, max_syms, Bp + 1, struct.intervals, p32_flat, interp,
        seg_words, start_bit,
    )
    if not bool(converged):  # can't happen within S+1 passes, but be safe
        return host_all()

    entries_np = np.asarray(entries)[:S]
    exits_np = np.asarray(exits)[:S]
    bad_np = np.asarray(bad)[:S]
    # Unknown symbol on the converged chain? Reference raises only with
    # >= 32 bits left (huffman.c:246); all these segments are mid-stream.
    if (bad_np != 0).any():
        raise UnknownSymbolError()

    K4 = -(-max_syms // 4)
    syms = (
        np.ascontiguousarray(
            np.asarray(out).reshape(G, K4, 8, 128).transpose(0, 2, 3, 1).reshape(Bp, K4)
        )
        .view(np.uint8)
        .reshape(Bp, 4 * K4)[:S]
    )
    # Symbol counts: codes starting in [entry, SEG_BITS) — count = number of
    # active steps. Derive from lengths: we know entry and exit, and each
    # emitted symbol advanced by its code length; count isn't directly
    # stored, so reconstruct by decoding lengths? No: active steps emitted
    # exactly the symbols whose start < SEG_BITS. Count = index of first
    # inactive step = number of symbols with cumulative offset < SEG_BITS.
    # We recover it by re-walking lengths on host — cheap alternative:
    # count the symbols via the lengths table.
    lens_of = table.lengths[syms]  # [S, max_syms] code length per emitted sym
    starts = np.cumsum(lens_of, axis=1) - lens_of + entries_np[:, None]
    counts = (starts < seg_bits).sum(axis=1)

    mask = np.arange(syms.shape[1])[None, :] < counts[:, None]
    body = syms[mask]

    # Tail: everything from the last full segment's exit onward.
    tail_start_bit = S * seg_bits + int(exits_np[-1]) - seg_bits
    value = int.from_bytes(raw, "big")
    left = total_bits - tail_start_bit
    tail_value = value & ((1 << left) - 1)
    tail, pos = _decode_tail_host(table, tail_value, left)
    return body.tobytes() + bytes(tail), tail_start_bit + pos
