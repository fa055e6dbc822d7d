"""Streaming codec: the chunked, resumable protocol.

Python equivalents of the reference's persistent encoder/decoder objects
(reference: include/aws/compression/huffman.h:63-84) and their
SHORT_BUFFER resume protocol (reference README.md:110-174). The streaming
state *is* the checkpoint (SURVEY.md §5): both classes expose their state
as plain ints/bytes so callers can serialize and resume anywhere.

Protocol mapping (C -> Python):
  aws_huffman_encode raising AWS_ERROR_SHORT_BUFFER with partial output
    -> ``HuffmanEncoder.encode_chunk`` returning ``done=False`` with the
       partial bytes (Python can't both return data and raise).
  encoder overflow_bits (reference huffman.h:69, saved huffman.c:89-99)
    -> ``HuffmanEncoder`` carry state (pattern, nbits), bit-identical.
  decoder working_bits/num_bits window (reference huffman.h:82-83)
    -> ``HuffmanDecoder`` remainder bitstream. One deliberate internal
       difference: when output capacity stops a decode, the reference
       leaves unread bytes in the *caller's* cursor while we retain them
       internally — emitted bytes and error conditions are identical, the
       caller just never re-feeds consumed input.

Bulk bit-packing runs on device through the same kernels as the one-shot
path; only the protocol arithmetic (prefix-sum searches over code lengths)
runs on host.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from .errors import ShortBufferError, UnknownSymbolError
from .ops.bitpack import bytes_from_words_np, words_from_bytes_np
from .ops.decode import (
    STATUS_OUTPUT_FULL,
    STATUS_UNKNOWN_SYMBOL,
    decode_stream_kernel,
)
from .ops.encode import (
    DEFAULT_EOS_PADDING,
    DeviceTable,
    _bucket_size,
    encode_block_kernel,
)
from .tables import HuffmanTable


# Chunks above this byte count take the self-sync bulk path on TPU.
BULK_DECODE_THRESHOLD = 65536

# Symbol counts at or above this take the Pallas pack pipeline for
# streaming encode (below it, compile/dispatch overhead dominates and the
# single-block XLA kernel is fine).
BULK_ENCODE_THRESHOLD = 65536

# Test hook: run the one-dispatch bulk encode path under the Pallas
# interpreter (the CPU tier can then cover its device capacity cut).
_FORCE_BULK_ENCODE = False

# One device encode call is bounded by int32 bit offsets; larger one-shot
# calls are auto-segmented through the capacity protocol (the carry path
# never inserts mid-stream padding, so the result is bit-identical to a
# true one-shot — the reference's size_t never limits, huffman.c:107-129).
_ONE_SHOT_BIT_LIMIT = 1 << 31


@dataclasses.dataclass
class EncodeResult:
    data: bytes  # bytes produced by this call (always complete bytes)
    consumed: int  # input symbols consumed (reference: cursor advance)
    done: bool  # False == reference AWS_ERROR_SHORT_BUFFER


@dataclasses.dataclass
class DecodeResult:
    data: bytes  # symbols produced by this call
    done: bool  # False == reference AWS_ERROR_SHORT_BUFFER


def _as_u8(data) -> np.ndarray:
    if isinstance(data, (bytes, bytearray, memoryview)):
        return np.frombuffer(bytes(data), dtype=np.uint8)
    return np.asarray(data, dtype=np.uint8)


@functools.partial(
    jax.jit,
    static_argnames=(
        "K", "G", "Wb", "num_out_words", "p32t", "lent", "min_len",
        "max_len", "interpret", "gather_dmin", "nb", "S", "cap_words",
    ),
)
def _fused_encode_chunk(syms_u32, nsym, lengths, patterns, carry_len,
                        carry_pat, writable, n_valid, *, K, G, Wb,
                        num_out_words, p32t, lent, min_len, max_len,
                        interpret, gather_dmin, nb, S, cap_words):
    """Pack pipeline + carry funnel + device capacity cut + hint scalars
    in one program (see HuffmanEncoder._encode_chunk_bulk).

    The cut mirrors the reference's short-buffer protocol exactly
    (huffman.c:88-99): consumed = #codes whose end fits ``writable``
    bits, plus the straddling code whose low ``over`` bits become the
    next carry. The sub-block offsets the pipeline emits for free locate
    the cut sub-block; an S-symbol exact cumsum finds the symbol.
    """
    from .ops.pallas_encode import STITCH_SW, _encode_pipeline

    words, total0, _pb, bad, ovf, offs_sub = _encode_pipeline(
        syms_u32, nsym, jnp.uint32(0), K, G, Wb, num_out_words,
        p32t, lent, min_len, max_len, interpret,
        gather_dmin=gather_dmin, nb=nb,
    )
    # carry funnel: shift the packed stream right by carry_len and OR the
    # carry pattern into word 0 (double shifts keep cu == 0 defined)
    cu = carry_len.astype(jnp.uint32)
    w = jnp.concatenate([words, jnp.zeros(1, jnp.uint32)])
    prev = jnp.concatenate([jnp.zeros(1, jnp.uint32), words])
    shifted = (w >> cu) | ((prev << (jnp.uint32(31) - cu)) << jnp.uint32(1))
    shifted = shifted.at[0].set(
        shifted[0]
        | jnp.where(
            cu > 0,
            carry_pat << ((jnp.uint32(32) - cu) & jnp.uint32(31)),
            jnp.uint32(0),
        )
    )
    # capacity cut in the packed (pre-carry) frame
    wbp = writable - carry_len
    done = total0 <= wbp
    j = jnp.clip(
        jnp.sum((offs_sub <= wbp).astype(jnp.int32)) - 1,
        0, offs_sub.shape[0] - 1,
    )
    sym_flat = jax.lax.bitcast_convert_type(
        syms_u32[:, None], jnp.uint8
    ).reshape(-1)
    sym_lo = jax.lax.dynamic_slice(sym_flat, (j * S,), (S,)).astype(jnp.int32)
    lens_lo = jnp.take(lengths, sym_lo)
    off_j = offs_sub[j]
    ends_lo = jnp.cumsum(lens_lo) + off_j
    k_w = jnp.sum((ends_lo <= wbp).astype(jnp.int32))
    kc = jnp.clip(k_w, 0, S - 1)
    kg = j * jnp.int32(S) + k_w
    start_k = jnp.where(
        k_w > 0, ends_lo[jnp.clip(k_w - 1, 0, S - 1)], off_j
    )
    straddle = (kg < n_valid) & (start_k < wbp)
    over = jnp.where(straddle, ends_lo[kc] - wbp, 0)
    pat_k = jnp.take(patterns, sym_lo[kc])
    c_next_pat = jnp.where(
        straddle,
        pat_k & ((jnp.uint32(1) << over.astype(jnp.uint32)) - jnp.uint32(1)),
        jnp.uint32(0),
    )
    c_next_len = jnp.where(done, 0, over)
    consumed = jnp.where(done, n_valid, kg + straddle.astype(jnp.int32))
    # span-hint scalars (the one-shot driver derives these on host from
    # the offsets array; here they ride the same download as the words)
    nsub = K // S
    blk = offs_sub[::nsub]
    nxt = jnp.concatenate([blk[1:], total0[None]])
    bi = jnp.arange(blk.shape[0], dtype=jnp.int32)
    max_span = jnp.max(jnp.where(bi < nb, nxt - blk, 0))
    sw_shift = 5 + STITCH_SW.bit_length() - 1
    r0 = blk >> sw_shift
    d = r0[1:] - r0[:-1]
    di = jnp.arange(d.shape[0], dtype=jnp.int32)
    # adjacent FULL blocks only (like plan_dmin_encode); nfull is traced
    # via n_valid so one compile serves every chunk size in the bucket
    nfull1 = jnp.maximum(n_valid // jnp.int32(K) - 1, 0)
    dmin_obs = jnp.min(jnp.where(di < nfull1, d, jnp.int32(1 << 30)))
    return (
        shifted[:cap_words], total0, bad, ovf, consumed, c_next_pat,
        c_next_len, max_span, dmin_obs,
    )


class HuffmanEncoder:
    """Persistent streaming encoder (reference: aws_huffman_encoder).

    State between calls is the carry: the low bits of a code that crossed
    the last capacity boundary (== reference overflow_bits, huffman.h:69).
    Every call that finishes the stream pads the final partial byte with
    the low bits of ``eos_padding`` (reference huffman.c:178-184), so —
    exactly like the reference — chunking *input* across successful calls
    inserts padding at each chunk end, while chunking *output* via
    ``done=False`` resumes produce one continuous bitstream.
    """

    def __init__(self, table: HuffmanTable, eos_padding: int = DEFAULT_EOS_PADDING):
        self.table = table
        self.eos_padding = eos_padding
        self._carry_pattern = 0
        self._carry_len = 0

    def reset(self) -> None:
        """Clear resume state (reference: aws_huffman_encoder_reset,
        source/huffman.c:22-27)."""
        self._carry_pattern = 0
        self._carry_len = 0

    @property
    def overflow_bits(self) -> tuple[int, int]:
        """(pattern, num_bits) carry, bit-identical to the reference field."""
        return self._carry_pattern, self._carry_len

    def state(self) -> dict:
        """Serializable checkpoint of the stream state."""
        return {"carry_pattern": self._carry_pattern, "carry_len": self._carry_len}

    def load_state(self, state: dict) -> None:
        self._carry_pattern = int(state["carry_pattern"])
        self._carry_len = int(state["carry_len"])

    def encoded_length(self, data) -> int:
        """Dry-run byte length (reference: aws_huffman_get_encoded_length,
        source/huffman.c:107-129). Ignores carry, like the reference."""
        symbols = _as_u8(data)
        bits = int(self.table.lengths[symbols].sum())
        return (bits + 7) // 8

    def encode_chunk(self, data, capacity: int | None = None) -> EncodeResult:
        """Encode up to ``capacity`` output bytes; resume-safe.

        ``capacity=None`` means unbounded (always completes). Raises
        UnknownSymbolError on the first symbol without a code, matching
        reference behavior (huffman.c:62-64) except no partial bytes are
        emitted first.
        """
        symbols = _as_u8(data)
        n = symbols.size
        if capacity is not None:
            # Only ceil(8*capacity / min_len) symbols can fit; bound the
            # host prefix-sum to O(chunk) instead of O(remaining stream).
            limit = (8 * int(capacity)) // max(self.table.min_len, 1) + 2
            if n > limit:
                symbols = symbols[:limit]
                n = limit
        if capacity is None and n * int(self.table.max_len) >= _ONE_SHOT_BIT_LIMIT:
            eff = int(self.table.lengths[symbols].max()) if n else 0
            if n * max(eff, 1) >= _ONE_SHOT_BIT_LIMIT:
                # Auto-segment (round 5, VERDICT r4 #7): drive the
                # capacity protocol internally; each segment's symbol
                # budget stays inside the device pipeline's int32 bound.
                # half the int32 bound: each sub-call's truncated symbol
                # budget (8*cap/min_len) times the envelope stays well
                # inside the device pipeline's 2^31-bit offset range
                seg_cap = max(
                    1024,
                    (_ONE_SHOT_BIT_LIMIT // 16)
                    * max(int(self.table.min_len), 1) // max(eff, 1),
                )
                parts = []
                pending = symbols
                while True:
                    r = self.encode_chunk(pending, seg_cap)
                    parts.append(r.data)
                    pending = pending[r.consumed :]
                    if r.done:
                        return EncodeResult(b"".join(parts), n, True)
        from .ops import pallas_encode as _pe

        if (
            n >= BULK_ENCODE_THRESHOLD
            and _pe.supports(self.table)
            and (not _pe._use_interpret() or _FORCE_BULK_ENCODE)
            and (capacity is None or self._carry_len <= 8 * int(capacity))
        ):
            # One-dispatch bulk path (round 5): pipeline + capacity cut +
            # carry composition all in one device program.
            return self._encode_chunk_bulk(symbols, capacity)
        lens = self.table.lengths[symbols].astype(np.int64)
        bad = np.flatnonzero(lens == 0)
        if bad.size:
            i = int(bad[0])
            raise UnknownSymbolError(index=i, symbol=int(symbols[i]))

        # The per-symbol prefix sum is only needed to CUT at a capacity
        # boundary; unbounded bulk calls skip it (round 4: it was O(chunk)
        # host work on every streaming call).
        total_bits = int(lens.sum()) + self._carry_len
        if total_bits == 0:
            return EncodeResult(b"", 0, True)
        writable = None if capacity is None else 8 * int(capacity)

        if writable is None or total_bits <= writable:
            out = self._pack(symbols, pad=True)
            self._carry_pattern = 0
            self._carry_len = 0
            return EncodeResult(out, n, True)
        ends = np.cumsum(lens) + self._carry_len

        # Short-buffer path: emit exactly `capacity` full bytes.
        if writable == 0:
            return EncodeResult(b"", 0, False)
        if self._carry_len > writable:
            # The pending carry alone overflows the budget: re-overflow its
            # tail, consuming no input (reference: the overflow flush at
            # huffman.c:148-159 can itself hit the short-buffer path in
            # encode_write_bit_pattern, huffman.c:88-99).
            over = self._carry_len - writable
            out = self._pack(symbols[:0], pad=False, min_bytes=capacity)
            self._carry_pattern &= (1 << over) - 1
            self._carry_len = over
            return EncodeResult(out[:capacity], 0, False)
        k_full = int(np.searchsorted(ends, writable, side="right"))
        consumed = k_full
        new_carry = (0, 0)
        if k_full < n and int(ends[k_full] - lens[k_full]) < writable:
            # Code k_full straddles the boundary: its low bits carry over
            # (reference huffman.c:88-99).
            over = int(ends[k_full]) - writable
            pattern = int(self.table.patterns[symbols[k_full]])
            new_carry = (pattern & ((1 << over) - 1), over)
            consumed = k_full + 1
        out = self._pack(symbols[:consumed], pad=False, min_bytes=capacity)
        self._carry_pattern, self._carry_len = new_carry
        return EncodeResult(out[:capacity], consumed, False)

    def encode(self, data) -> bytes:
        """One-shot convenience; includes any pending carry."""
        return self.encode_chunk(data, None).data

    def _pack(self, symbols: np.ndarray, pad: bool, min_bytes: int | None = None) -> bytes:
        """Device bit-pack of ``symbols`` behind the current carry bits."""
        from .ops import pallas_encode as _pe

        n = symbols.size
        if (
            n >= BULK_ENCODE_THRESHOLD
            and _pe.supports(self.table)
            and not _pe._use_interpret()
        ):
            return self._pack_bulk(symbols, pad, min_bytes)
        bucket = _bucket_size(max(n, 1))
        padded = np.zeros(bucket, dtype=np.uint8)
        padded[:n] = symbols
        dt = DeviceTable.for_table(self.table)
        words, total_bits, padded_bits, _bad, _idx = encode_block_kernel(
            jnp.asarray(padded),
            jnp.int32(n),
            dt.patterns,
            dt.lengths,
            jnp.uint32(self.eos_padding if pad else 0),
            jnp.int32(self._carry_len),
            num_out_words=bucket + 2,
        )
        words_np = np.asarray(words).copy()
        if self._carry_len:
            words_np[0] |= np.uint32(
                (self._carry_pattern << (32 - self._carry_len)) & 0xFFFFFFFF
            )
        nbits = int(padded_bits) if pad else int(total_bits)
        nbytes = (nbits + 7) // 8
        if min_bytes is not None:
            nbytes = max(nbytes, min_bytes)
        return bytes_from_words_np(words_np, nbytes)

    def _encode_chunk_bulk(self, symbols: np.ndarray,
                           capacity: int | None) -> EncodeResult:
        """MB-scale encode_chunk as ONE device program + one download
        (round 5, VERDICT r4 #3): the pack pipeline, the capacity cut
        (sub-block search over the pipeline's free offsets + an S-symbol
        exact cumsum), the carry funnel shift, and the span-hint scalars
        all run on device. The host's only O(n) work is the code-length
        envelope max (the split plan's exact cap) and the byte staging.
        """
        from .errors import UnknownSymbolError
        from .ops import pallas_encode as _pe

        table = self.table
        n = symbols.size
        eff = int(table.lengths[symbols].max()) if n else 0
        cap_len = eff if 0 < eff < int(table.max_len) else None
        K = _pe.pack_k(table, cap_len)
        hints_ok = getattr(table, "_hint_key", None) == (K, cap_len)
        rate = getattr(table, "_rate_hint", None) if hints_ok else None
        out_cap = (int(n * rate) + 8192) if rate is not None else None
        writable = (1 << 31) - 1 if capacity is None else 8 * int(capacity)
        for wb_cap, dmin_hint, cap_bits in (
            (
                getattr(table, "_wb_hint", None) if hints_ok else None,
                getattr(table, "_dmin_hint", None) if hints_ok else None,
                out_cap,
            ),
            (None, None, None),
        ):
            p32t, lent, min_len, max_len, Wb, G, num_out_words = _pe._plan(
                table, n, K, wb_cap=wb_cap, out_cap_bits=cap_bits,
                maxlen_cap=cap_len,
            )
            gather_dmin, _jm = _pe.gather_tail_plan(
                K, min_len, max_len, Wb, dmin_hint
            )
            S = _pe._sub_block(K, min_len, max_len)
            nb = -(-n // K)
            B = G * _pe.LANES
            nsym_np = np.zeros(B, np.int32)
            nsym_np[: n // K] = K
            if n % K:
                nsym_np[n // K] = n % K
            padded = np.zeros(B * K, np.uint8)
            padded[:n] = symbols
            cap_words = (
                num_out_words if capacity is None
                else min(num_out_words, int(capacity) // 4 + 2)
            )
            (words_out, total0, bad, ovf, consumed, c_pat, c_len,
             max_span, dmin_obs) = _fused_encode_chunk(
                jnp.asarray(padded.view("<u4")), jnp.asarray(nsym_np),
                jnp.asarray(table.lengths.astype(np.int32)),
                jnp.asarray(table.patterns.astype(np.uint32)),
                jnp.int32(self._carry_len), jnp.uint32(self._carry_pattern),
                jnp.int32(writable), jnp.int32(n),
                K=K, G=G, Wb=Wb, num_out_words=num_out_words, p32t=p32t,
                lent=lent, min_len=min_len, max_len=max_len,
                interpret=_pe._use_interpret(), gather_dmin=gather_dmin,
                nb=nb, S=S, cap_words=cap_words,
            )
            (words_np, total0, bad, ovf, consumed, c_pat, c_len, max_span,
             dmin_obs) = jax.device_get(
                (words_out, total0, bad, ovf, consumed, c_pat, c_len,
                 max_span, dmin_obs)
            )
            if (
                wb_cap is not None or dmin_hint is not None
                or cap_bits is not None
            ) and bool(ovf):
                continue  # data outgrew the learned hints: static re-run
            break
        if bool(bad):
            lens = table.lengths[symbols]
            idx = int(np.argmax(lens == 0))
            raise UnknownSymbolError(index=idx, symbol=int(symbols[idx]))
        # learn span hints from the device-computed scalars — only when
        # none are valid yet (or the static re-run invalidated them):
        # re-learning every chunk wiggles Wb by a word and each distinct
        # Wb is a fresh kernel compile (observed as a per-chunk compile
        # storm in the 64 MiB streaming bench)
        if nb > 1 and (not hints_ok or wb_cap is None):
            object.__setattr__(table, "_hint_key", (K, cap_len))
            ms = int(max_span)
            object.__setattr__(table, "_wb_hint", (ms + ms // 4) // 32 + 4)
            static = (K * min_len) // (32 * _pe.STITCH_SW)
            object.__setattr__(
                table, "_dmin_hint",
                max(static, int(dmin_obs)) if n // K > 1 else None,
            )
            object.__setattr__(
                table, "_rate_hint", 1.15 * int(total0) / max(1, n)
            )
        total = int(total0) + self._carry_len
        done = total <= writable
        if done:
            nbits = total
            nbytes = (nbits + 7) // 8
            buf = bytearray(bytes_from_words_np(words_np, nbytes))
            if nbits & 7:
                buf[-1] |= self.eos_padding & ((1 << (8 - (nbits & 7))) - 1)
            self._carry_pattern = 0
            self._carry_len = 0
            return EncodeResult(bytes(buf), n, True)
        out = bytes_from_words_np(words_np, int(capacity))
        self._carry_pattern = int(c_pat)
        self._carry_len = int(c_len)
        return EncodeResult(out, int(consumed), False)

    def _pack_bulk(self, symbols: np.ndarray, pad: bool, min_bytes: int | None) -> bytes:
        """MB-scale chunks ride the Pallas pack pipeline (the single-block
        XLA kernel's elementwise gathers cost ~35 ms/MiB of true device
        time). The pipeline packs from bit 0; the carry composes as one
        elementwise funnel shift of the whole word stream by carry_len
        (< 32) bits, and EOS padding is a single host byte-OR at the end
        (reference semantics: low pad_len bits of eos_padding at
        total_bits, source/huffman.c:178-184)."""
        from .ops import pallas_encode as _pe

        words_dev, total0, _padded0, _offs, _S = _pe._run(symbols, self.table, 0)
        c = self._carry_len
        if c:
            w = jnp.concatenate([words_dev, jnp.zeros(1, jnp.uint32)])
            prev = jnp.concatenate([jnp.zeros(1, jnp.uint32), w[:-1]])
            cu = jnp.uint32(c)
            words_dev = (w >> cu) | ((prev << (jnp.uint32(31) - cu)) << jnp.uint32(1))
        words_np = np.asarray(words_dev).copy()
        total_bits = int(total0) + c
        if c:
            words_np[0] |= np.uint32(
                (self._carry_pattern << (32 - c)) & 0xFFFFFFFF
            )
        nbytes = (total_bits + 7) // 8
        buf = bytearray(bytes_from_words_np(words_np, nbytes))
        if pad and total_bits & 7:
            pad_len = 8 - (total_bits & 7)
            buf[-1] |= self.eos_padding & ((1 << pad_len) - 1)
        if min_bytes is not None and len(buf) < min_bytes:
            buf.extend(b"\0" * (min_bytes - len(buf)))
        return bytes(buf)


@functools.partial(jax.jit, donate_argnums=(0,), static_argnames=("sh",))
def _merge_words(buf, up, w0b, sh: int):
    """OR-merge shifted new words into ``buf`` at word ``w0b``.

    ``up`` is the new chunk packed from bit 0; ``sh`` = 8 * (nbytes % 4) is
    the byte phase of the append point. Bits past the valid stream are zero
    on both sides, so only the boundary word needs an OR; the rest
    overwrite zeros.
    """
    if sh:
        ext = jnp.concatenate([jnp.zeros(1, jnp.uint32), up])
        shifted = (ext[:-1] << jnp.uint32(32 - sh)) | (ext[1:] >> jnp.uint32(sh))
        up = jnp.concatenate([shifted, up[-1:] << jnp.uint32(32 - sh)])
    first = jax.lax.dynamic_index_in_dim(buf, w0b, keepdims=False)
    up = up.at[0].set(up[0] | first)
    return jax.lax.dynamic_update_slice(buf, up, (w0b,))


@functools.partial(jax.jit, donate_argnums=(0,))
def _slide_words(buf, cw):
    """Drop ``cw`` consumed words off the front (device compaction)."""
    n = buf.shape[0]
    padded = jnp.concatenate([buf, jnp.zeros(n, jnp.uint32)])
    return jax.lax.dynamic_slice(padded, (cw,), (n,))


class _DeviceRemainder:
    """Device-resident retained stream for the streaming decoder.

    The reference decoder's window state (working_bits/num_bits,
    huffman.h:82-83) generalizes here to (word buffer, consumed_bit): the
    buffer holds the stream since the last compaction, the cursor marks the
    resume point. Feeds upload only the NEW bytes; drains download only the
    emitted symbols — the remainder is never re-uploaded (VERDICT r2 #4:
    the host twin re-concatenated and re-uploaded the retained stream on
    every chunked call).
    """

    def __init__(self):
        self.buf = None  # jnp.uint32[cap]; bits past nbytes*8 are zero
        self.nbytes = 0
        self.consumed_bit = 0

    @property
    def active(self) -> bool:
        return self.buf is not None

    def _ensure_capacity(self, need_words: int) -> None:
        # 2x headroom: covers the selfsync grid's pow2 bucketing overshoot
        # and the sliced-view slack without per-call repads.
        cap = max(2 << max(need_words - 1, 1).bit_length(), 1 << 12)
        if self.buf is None:
            self.buf = jnp.zeros(cap, jnp.uint32)
        elif self.buf.shape[0] < need_words:
            grown = jnp.zeros(cap, jnp.uint32)
            self.buf = jax.lax.dynamic_update_slice(grown, self.buf, (0,))

    def append(self, new: np.ndarray) -> None:
        if new.size == 0:
            if self.buf is None:
                self._ensure_capacity(1)
            return
        nb = self.nbytes
        w_new, _ = words_from_bytes_np(new.tobytes())
        sh = (nb % 4) * 8
        # +1 word for the shift spill; bucket the upload to limit compiles.
        n_up = w_new.size + 1
        n_up = 1 << (n_up - 1).bit_length()
        up_np = np.zeros(n_up, np.uint32)
        up_np[: w_new.size] = w_new
        w0b = nb // 4
        self._ensure_capacity(w0b + n_up)
        self.buf = _merge_words(self.buf, jnp.asarray(up_np), w0b, sh)
        self.nbytes = nb + new.size

    def compact(self) -> None:
        """Slide consumed whole words off the front when they dominate."""
        cw = self.consumed_bit >> 5
        if self.buf is None or cw < 1024 or cw < self.buf.shape[0] // 4:
            return
        self.buf = _slide_words(self.buf, cw)
        self.consumed_bit -= cw * 32
        self.nbytes -= cw * 4

    def to_host(self) -> tuple[np.ndarray, int]:
        """Materialize the unconsumed remainder as (bytes u8, start_bit<8).

        One D2H of the remainder — used when leaving device residency
        (small feeds, state(), leftover_bits)."""
        start_byte = self.consumed_bit >> 3
        nwords = -(-self.nbytes // 4)
        if self.buf is None or nwords == 0:
            return np.zeros(0, np.uint8), 0
        words = np.asarray(self.buf[:nwords])
        data = np.frombuffer(
            words.astype(">u4").tobytes(), dtype=np.uint8
        )[start_byte : self.nbytes]
        return data.copy(), self.consumed_bit & 7

    def clear(self) -> None:
        self.buf = None
        self.nbytes = 0
        self.consumed_bit = 0


class HuffmanDecoder:
    """Persistent streaming decoder (reference: aws_huffman_decoder).

    ``allow_growth=True`` makes plain :meth:`decode` ignore capacity and
    always finish (reference: aws_huffman_decoder_allow_growth,
    source/huffman.c:44-46 — growth is internal here since Python bytes
    aren't fixed buffers).
    """

    def __init__(self, table: HuffmanTable, allow_growth: bool = False):
        self.table = table
        self.allow_growth = allow_growth
        self._rem = np.zeros(0, dtype=np.uint8)  # unread stream bytes
        self._rem_start_bit = 0  # bit offset into _rem[0]
        self._dev = _DeviceRemainder()  # device-resident twin (bulk path)

    def _host_state(self) -> None:
        """Leave device residency: one D2H of the remainder into _rem."""
        if self._dev.active:
            self._rem, self._rem_start_bit = self._dev.to_host()
            self._dev.clear()

    def reset(self) -> None:
        """Reference: aws_huffman_decoder_reset (source/huffman.c:38-42)."""
        self._rem = np.zeros(0, dtype=np.uint8)
        self._rem_start_bit = 0
        self._dev.clear()

    def state(self) -> dict:
        self._host_state()
        return {"rem": self._rem.tobytes(), "rem_start_bit": self._rem_start_bit}

    def load_state(self, state: dict) -> None:
        self._rem = np.frombuffer(state["rem"], dtype=np.uint8).copy()
        self._rem_start_bit = int(state["rem_start_bit"])
        self._dev.clear()

    @property
    def leftover_bits(self) -> tuple[int, int]:
        """(value, num_bits) of unconsumed tail bits, MSB-first.

        The reference leaves trailing padding in working_bits for caller
        inspection — e.g. HPACK's all-1s padding check
        (reference README.md:176-183).
        """
        self._host_state()
        total = self._rem.size * 8 - self._rem_start_bit
        value = int.from_bytes(self._rem.tobytes(), "big")
        value &= (1 << total) - 1 if total else 0
        return value, total

    def padding_is_all_ones(self) -> bool:
        """HPACK-style validity check of trailing padding (RFC 7541 §5.2).

        The reference leaves padding in ``working_bits`` and documents this
        exact check as the caller's job (reference README.md:176-183); here
        it is a method. True iff every unconsumed tail bit is 1 (also true
        for a fully-consumed stream with no tail).
        """
        value, total = self.leftover_bits
        return total < 8 and value == (1 << total) - 1

    def decode_chunk(self, data, capacity: int | None = None) -> DecodeResult:
        """Decode; stops after ``capacity`` symbols (done=False) or when the
        input is exhausted (done=True). Consumes all of ``data`` into
        internal state either way."""
        new = _as_u8(data)

        # Bulk fast path: big chunks ride the self-sync parallel kernel on
        # TPU (the scan kernel below runs one symbol per step — unusable at
        # MB sizes). Capacity-bounded calls use the capped variant, which
        # decodes only a capacity-sized prefix and retains the remainder —
        # the SHORT_BUFFER resume protocol at device speed
        # (reference contract: huffman.c:257-268, huffman_testing.c:75-173).
        # The retained stream is DEVICE-RESIDENT across calls: feeds upload
        # only the new bytes, drains download only the emitted symbols; the
        # remainder is never rebuilt on host or re-uploaded.
        from .ops import pallas_decode, selfsync

        bulk_ok = pallas_decode._on_tpu() and selfsync.supports(self.table)
        # Engagement needs a big stream and a non-tiny capacity; once
        # device-resident, stay there for ANY capacity (the words-capped
        # path is O(capacity) regardless; leaving would re-download the
        # whole remainder).
        if bulk_ok and (
            self._dev.active
            or (
                self._rem.size + new.size > BULK_DECODE_THRESHOLD
                and (capacity is None or capacity >= 64)
            )
        ):
            if not self._dev.active and (self._rem.size or new.size):
                # Migrate the host remainder once; start_bit < 8 becomes
                # the device cursor.
                self._dev.append(self._rem)
                self._dev.consumed_bit = self._rem_start_bit
                self._rem = np.zeros(0, dtype=np.uint8)
                self._rem_start_bit = 0
            # Fused one-dispatch drain (round 5): compact slide + feed
            # append + decode + tail window ride ONE device program with
            # one batched download — the chunked protocol was dispatch-
            # count bound at the rig's 40-80 ms tunnel floor per call.
            res = self._drain_fused(new, capacity)
            if res is not None:
                return res
            self._dev.append(new)
            if capacity is None:
                out, end = selfsync.selfsync_decode_words(
                    self._dev.buf, self._dev.nbytes, self._dev.consumed_bit,
                    self.table,
                )
                more = False
            else:
                out, end, more = selfsync.selfsync_decode_capped_words(
                    self._dev.buf, self._dev.nbytes, self._dev.consumed_bit,
                    self.table, int(capacity),
                )
            self._dev.consumed_bit = end
            self._dev.compact()
            return DecodeResult(out, not more)

        # Host/scan paths below: leave device residency first (small feeds,
        # unsupported tables, non-TPU backends).
        self._host_state()
        stream = np.concatenate([self._rem, new]) if self._rem.size else new
        start_bit = self._rem_start_bit
        total_bits = stream.size * 8
        if total_bits - start_bit <= 0:
            return DecodeResult(b"", True)

        words_np, _ = words_from_bytes_np(stream)
        words = jnp.concatenate([jnp.asarray(words_np), jnp.zeros(2, dtype=jnp.uint32)])
        max_possible = (total_bits - start_bit) // max(self.table.min_len, 1) + 1
        cap = max_possible if capacity is None else min(int(capacity), max_possible)
        steps = 1 << max(4, int(min(cap + 1, max_possible + 1) - 1).bit_length())
        dt = DeviceTable.for_table(self.table)
        syms, _valid, n_decoded, end_bit, status = decode_stream_kernel(
            words,
            jnp.int32(start_bit),
            jnp.int32(total_bits),
            jnp.int32(cap),
            dt.l0_bits, dt.l0_val, dt.l1_bits, dt.l1_val,
            root_bits=self.table.root_bits,
            steps=steps,
        )
        status = int(status)
        if status == STATUS_UNKNOWN_SYMBOL:
            raise UnknownSymbolError()
        n = int(n_decoded)
        end = int(end_bit)
        self._rem = stream[end // 8 :].copy()
        self._rem_start_bit = end % 8
        out = np.asarray(syms)[:n].tobytes()
        return DecodeResult(out, status != STATUS_OUTPUT_FULL)

    def _drain_fused(self, new: np.ndarray, capacity) -> "DecodeResult | None":
        """One-dispatch bulk drain; None = shape unsuited (classic path).

        Host-side mirror of the device mutation: the compact decision and
        the append point are computed here BEFORE the fused call, so the
        remainder's (nbytes, consumed_bit) bookkeeping never needs a
        device read. A rare unresolved/corrupt stream raises
        _FusedFallback carrying the already-mutated buffer; the classic
        path then re-runs over it with exact error semantics.
        """
        from .ops import selfsync

        dev = self._dev
        if dev.buf is None:
            dev._ensure_capacity(1)
        # compact slide, applied pre-merge (same rule as compact())
        cw = 0
        cwc = dev.consumed_bit >> 5
        if cwc >= 1024 and cwc >= dev.buf.shape[0] // 4:
            cw = cwc
        up = None
        up_bytes = 0
        if new.size:
            w_new, _ = words_from_bytes_np(new.tobytes())
            # floor the bucket at 256 words: sub-KB upload waste is free,
            # and every distinct bucket is a fused-graph variant whose
            # per-process compile-cache load costs seconds
            n_up = max(256, 1 << max(0, (w_new.size + 1 - 1).bit_length()))
            up = np.zeros(n_up, np.uint32)
            up[: w_new.size] = w_new
            up_bytes = int(new.size)
        try:
            res = selfsync.fused_drain_words(
                dev.buf, dev.nbytes, dev.consumed_bit, self.table,
                None if capacity is None else int(capacity),
                up=up, up_bytes=up_bytes, cw=cw,
            )
        except selfsync._FusedFallback as fb:
            dev.buf = fb.new_buf
            dev.nbytes = dev.nbytes - 4 * cw + up_bytes
            dev.consumed_bit -= 32 * cw
            if fb.error is not None:
                raise fb.error
            if capacity is None:
                out, end = selfsync.selfsync_decode_words(
                    dev.buf, dev.nbytes, dev.consumed_bit, self.table
                )
                more = False
            else:
                out, end, more = selfsync.selfsync_decode_capped_words(
                    dev.buf, dev.nbytes, dev.consumed_bit, self.table,
                    int(capacity),
                )
            dev.consumed_bit = end
            return DecodeResult(out, not more)
        if res is None:
            return None
        out, end, more, new_buf = res
        dev.buf = new_buf
        dev.nbytes = dev.nbytes - 4 * cw + up_bytes
        dev.consumed_bit = end
        return DecodeResult(out, not more)

    def decode(self, data, capacity: int | None = None) -> bytes:
        """Reference-shaped decode: raises ShortBufferError when capacity
        stops the decode and growth is off (reference huffman.c:257-266)."""
        if capacity is None or self.allow_growth:
            return self.decode_chunk(data, None).data
        res = self.decode_chunk(data, capacity)
        if not res.done:
            # State already advanced; caller can call again with b"".
            raise ShortBufferError(res.data)
        return res.data
