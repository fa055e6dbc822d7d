"""Data-parallel codec over a JAX device mesh.

The reference is single-process and strictly sequential; its only scaling
axis is streaming in time (SURVEY.md §2.2). This module adds the scaling
axis the TPU build needs: **block data parallelism** over a
`jax.sharding.Mesh`, with XLA collectives on ICI/DCN doing the global
coordination the reference never had:

  encode:  each device packs its contiguous symbol shard locally;
           the global bit offset of every shard is an `all_gather` of the
           per-shard bit totals + exclusive cumsum (the NCCL-equivalent
           layer is just this one collective); a final scatter-OR stitches
           the shard word-arrays into one stream, bit-identical to the
           single-chip / reference encoding of the whole buffer.
  decode:  blocks from a BlockIndex are striped contiguously across
           devices; each device receives only the word-range its blocks
           touch (no replicated input), runs the LUT scan kernel, and the
           outputs concatenate in order (fixed symbols per block).

Mesh shape is caller-chosen; a 2-D ('dcn', 'ici') mesh flattens to one
data axis here because block DP is the honest mapping for a codec
(SURVEY.md §2.2) — the collectives ride ICI within a host and DCN across.
"""

from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .errors import UnknownSymbolError
from .ops.bitpack import bytes_from_words_np, words_from_bytes_np
from .ops.decode import BlockIndex, decode_blocks_kernel, lut_lookup, _LutView
from .ops.encode import DEFAULT_EOS_PADDING, DeviceTable
from .tables import HuffmanTable


def _bucket_pow2(per_dev: int, block_symbols: int) -> int:
    """Round a shard size up to (pow2 multiple of block_symbols): nearby
    input sizes then share one compiled shard program; excess lanes are
    zero-padded and masked by n_valid."""
    units = -(-per_dev // block_symbols)
    return block_symbols * (1 << (units - 1).bit_length() if units > 1 else 1)


def default_mesh(devices=None, axis: str = "data") -> Mesh:
    """A 1-D data mesh over all local devices (or the given ones)."""
    devices = jax.devices() if devices is None else devices
    return Mesh(np.asarray(devices), (axis,))


def _flat_axes(mesh: Mesh) -> tuple[str, ...]:
    return tuple(mesh.axis_names)


# --------------------------------------------------------------- encode ----


def _global_phase_base(local_bits, axes):
    """(phase, word_base) of this shard's exclusive global bit offset.

    TPU jit has no int64 and an int32 cumsum of shard bit totals silently
    wraps past 2^31 bits (~256 MiB encoded). Each total is split into
    (hi = bits >> 16, lo = bits & 0xFFFF) int32 halves and the halves are
    cumsummed independently; offset = csum_hi * 2^16 + csum_lo exactly, so
      phase     = offset & 31  = csum_lo & 31          (2^16 ≡ 0 mod 32)
      word_base = offset >> 5  = (csum_hi << 11) + (csum_lo >> 5)
    with no wrap while word_base < 2^31, i.e. streams up to 2^36 bits
    (8 GiB). csum_lo < ndev * 2^16 and csum_hi < 2^20 stay far inside
    int32. Callers guard the 2^36 ceiling host-side.

    Gather innermost axis first so dims stack [a0, a1, ...]; flattening is
    then majority-ordered like the P((a0, a1, ...)) shard assignment.
    """
    totals = local_bits
    for ax in reversed(axes):
        totals = jax.lax.all_gather(totals, ax, axis=0)
    totals = totals.reshape(-1)
    my_idx = jax.lax.axis_index(axes[0])
    for ax in axes[1:]:
        my_idx = my_idx * jax.lax.axis_size(ax) + jax.lax.axis_index(ax)
    csum_hi = jnp.cumsum(totals >> 16)
    csum_lo = jnp.cumsum(totals & 0xFFFF)
    pre_hi = csum_hi[my_idx] - (local_bits >> 16)  # exclusive prefix
    pre_lo = csum_lo[my_idx] - (local_bits & 0xFFFF)
    phase = pre_lo & 31
    word_base = (pre_hi << 11) + (pre_lo >> 5)
    return phase, word_base


def _shard_encode_body(symbols, n_valid, patterns, lengths, axes,
                       offs_every: int = 0):
    """Per-shard bit packing; runs under shard_map.

    symbols: uint8[local_n] this shard's symbols
    n_valid: int32[1]       valid symbols in this shard
    Returns (words uint32[local_n+2] local bit-packed stream aligned to the
    shard's *global* intra-word phase, bit_total int32[1], word_base int32[1],
    bad int32[1][, LOCAL bit offsets of every offs_every-th symbol —
    device-side, O(local); the caller adds the shard's int64 global base
    on host, so block offsets never wrap]).
    """
    n = symbols.shape[0]
    nv = n_valid[0]
    pos = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    valid = pos < nv
    lens_raw = lengths[symbols]
    lens = jnp.where(valid, lens_raw, 0)
    bad = jnp.any(valid & (lens_raw == 0))

    ends = jnp.cumsum(lens, dtype=jnp.int32)
    local_bits = ends[-1]

    # Pack local bits phase-aligned: local bit j sits at global bit offset+j,
    # i.e. at bit (offset%32 + j) of local words starting at word offset//32.
    phase, word_base = _global_phase_base(local_bits, axes)
    starts = ends - lens + phase
    pats = patterns[symbols].astype(jnp.uint32)
    shift_left = jnp.uint32(32) - lens.astype(jnp.uint32)
    p32 = jnp.where(lens > 0, pats << (shift_left & jnp.uint32(31)), jnp.uint32(0))
    widx = (starts >> 5).astype(jnp.int32)
    sh = (starts & 31).astype(jnp.uint32)
    hi = p32 >> sh
    lo = (p32 << (jnp.uint32(31) - sh)) << jnp.uint32(1)
    words = jnp.zeros(n + 2, dtype=jnp.uint32)
    words = words.at[widx].add(hi, mode="drop", indices_are_sorted=True)
    words = words.at[widx + 1].add(lo, mode="drop", indices_are_sorted=True)
    outs = (
        words,
        local_bits[None],
        word_base[None],
        bad.astype(jnp.int32)[None],
    )
    if offs_every:
        offs_blk = (ends - lens)[::offs_every][: n // offs_every]
        outs = outs + (offs_blk,)
    return outs


def _shard_encode_body_pallas(symbols, n_valid, *, K, G, Wb, num_out_words,
                              p32t, lent, min_len, max_len, interpret, axes,
                              offs_every: int = 0, gather_dmin: int = 0):
    """Per-shard Pallas pack + funnel to the global phase; under shard_map.

    Same contract as _shard_encode_body but the local pack is the
    single-chip Pallas pipeline (ops/pallas_encode.py) instead of the
    elementwise gather+cumsum+scatter kernel — the mesh layer is just the
    one all_gather of shard bit totals plus an elementwise funnel shift.

    ``offs_every`` > 0 additionally returns the GLOBAL bit offset of every
    ``offs_every``-th symbol of this shard (must be a multiple of the pack
    pipeline's sub-block granularity) — the BlockIndex comes free from the
    pipeline's own prefix sums instead of a host O(N) cumsum
    (VERDICT r1 item 5).
    """
    from .ops.pallas_encode import (
        LANES as PACK_LANES,
        _encode_pipeline,
        _sub_block,
    )

    n = symbols.shape[0]
    nv = n_valid[0]
    B = G * PACK_LANES
    nsym = jnp.clip(
        nv - jax.lax.broadcasted_iota(jnp.int32, (B,), 0) * K, 0, K
    ).astype(jnp.int32)
    padded = jnp.pad(symbols, (0, B * K - n))
    syms_u32 = jax.lax.bitcast_convert_type(
        padded.reshape(-1, 4), jnp.uint32
    ).reshape(-1)
    # eos_padding=0: shard streams must NOT pad (only the global stream
    # end gets eos bits, applied by the caller); a zero pad ORs nothing.
    # Static Wb (no span hint) -> the overflow flag can never fire here.
    # gather_dmin (round 5): the gather stitch tail at its STATIC floor —
    # the shard's content-block count is data-dependent (nb_t), so nb is
    # the static bound and the pipeline masks the empty tail blocks.
    words0, local_bits, _padded_bits, bad, _ovf, offs_sub = _encode_pipeline(
        syms_u32, nsym, jnp.uint32(0), K, G, Wb, num_out_words,
        p32t, lent, min_len, max_len, interpret,
        gather_dmin=gather_dmin, nb=-(-n // K),
        nb_t=(nv + K - 1) // K if gather_dmin else None,
    )

    # Funnel the phase-0 local stream to its global intra-word phase.
    phase_i, word_base = _global_phase_base(local_bits, axes)
    phase = phase_i.astype(jnp.uint32)
    ext = jnp.concatenate([words0, jnp.zeros(1, jnp.uint32)])
    prev = jnp.concatenate([jnp.zeros(1, jnp.uint32), words0])
    words = (ext >> phase) | ((prev << (jnp.uint32(31) - phase)) << jnp.uint32(1))
    outs = (
        words,
        local_bits[None],
        word_base[None],
        bad.astype(jnp.int32)[None],
    )
    if offs_every:
        S = _sub_block(K, min_len, max_len)
        assert offs_every % S == 0
        offs_blk = offs_sub[:: offs_every // S][: n // offs_every]
        outs = outs + (offs_blk,)
    return outs


@functools.partial(jax.jit, static_argnames=("num_out_words",))
def _stitch_kernel(words, word_bases, num_out_words: int):
    """OR every shard's word window into the global stream.

    Bits are disjoint across shards (each owns a bit range; the slack words
    past a shard's last bit are zero), so only the boundary word of each
    window genuinely ORs. One read-OR-write dynamic window per shard:
    the old elementwise scatter-add cost ~8 ns per scattered WORD (~20 ms
    for an 8 MiB stream — round 5, prof_r5_mesh_encode.py), while the
    window form is plain slice traffic. The +w over-allocation keeps
    dynamic_slice from clamp-shifting the last shard's window; bits past
    num_out_words are slack zeros and are trimmed on return.
    """
    ndev, w = words.shape
    out = jnp.zeros(num_out_words + w, dtype=jnp.uint32)
    for d in range(ndev):
        base = word_bases[d]
        cur = jax.lax.dynamic_slice(out, (base,), (w,))
        out = jax.lax.dynamic_update_slice(out, cur | words[d], (base,))
    return out[:num_out_words]


@dataclasses.dataclass
class MeshCodec:
    """Data-parallel encoder/decoder bound to a mesh and a table.

    Produces byte streams bit-identical to the single-chip path (and thus to
    the reference); emits/consumes the same BlockIndex metadata.
    """

    table: HuffmanTable
    mesh: Mesh
    block_symbols: int = 256  # BlockIndex granularity for decode striping
    eos_padding: int = DEFAULT_EOS_PADDING  # reference: huffman.h:66

    def __post_init__(self):
        from .ops import pallas_encode as _pe

        self._dt = DeviceTable.for_table(self.table)
        self._ndev = math.prod(self.mesh.devices.shape)
        # The Pallas shard bodies are TPU-only: in interpret mode (CPU
        # tests, driver dryrun) the kernel expands into the XLA graph and
        # the CPU backend's algebraic simplifier spins on it ("circular
        # simplification loop"); the gather/scan bodies stay the CPU path.
        self._pallas_encode_ok = (
            _pe.supports(self.table) and not _pe._use_interpret()
        )
        # Can the BlockIndex ride the encode pipeline's free offsets?
        # (Pallas path: block_symbols must align with the pack sub-blocks;
        # the XLA body samples its own cumsum, any granularity works.)
        self._offsets_ok = (
            not self._pallas_encode_ok
            or self.block_symbols % _pe.offset_granularity(self.table) == 0
        )
        self._penc_cache = {}
        self._pdec_cache = {}
        axes = _flat_axes(self.mesh)
        spec_in = P(axes[0] if len(axes) == 1 else axes)
        self._decode_sharded = jax.jit(
            jax.shard_map(
                functools.partial(
                    _shard_decode_body,
                    l0_bits=self._dt.l0_bits,
                    l0_val=self._dt.l0_val,
                    l1_bits=self._dt.l1_bits,
                    l1_val=self._dt.l1_val,
                    root_bits=self.table.root_bits,
                    steps=self.block_symbols,
                ),
                mesh=self.mesh,
                in_specs=(spec_in, spec_in, spec_in),
                out_specs=spec_in,
                check_vma=False,
            )
        )

    # ---- encode ----

    def _encode_sharded_fn(self, per_dev: int, with_offsets: bool):
        """shard_map'd per-shard encode for a fixed shard size.

        Pallas pack pipeline on TPU, XLA gather+cumsum+scatter elsewhere;
        with_offsets adds a 6th output: global bit offsets of every
        block_symbols-th symbol, device-computed (no host cumsum).
        """
        key = (per_dev, with_offsets)
        if key in self._penc_cache:
            return self._penc_cache[key]
        from .ops import pallas_encode as pe

        axes = _flat_axes(self.mesh)
        spec = P(axes[0] if len(axes) == 1 else axes)
        offs_every = self.block_symbols if with_offsets else 0
        if self._pallas_encode_ok:
            K = pe.pack_k(self.table)
            p32t, lent, mn, mx, Wb, G, now = pe._plan(self.table, per_dev, K)
            gdmin, _jm = pe.gather_tail_plan(K, mn, mx, Wb, None)
            body = functools.partial(
                _shard_encode_body_pallas,
                K=K, G=G, Wb=Wb, num_out_words=now,
                p32t=p32t, lent=lent, min_len=mn, max_len=mx,
                interpret=pe._use_interpret(), axes=axes,
                offs_every=offs_every, gather_dmin=gdmin,
            )
        else:
            body = functools.partial(
                _shard_encode_body,
                patterns=self._dt.patterns,
                lengths=self._dt.lengths,
                axes=axes,
                offs_every=offs_every,
            )
        nouts = 5 if with_offsets else 4
        fn = jax.jit(
            jax.shard_map(
                body, mesh=self.mesh, in_specs=(spec, spec),
                out_specs=(spec,) * nouts, check_vma=False,
            )
        )
        self._penc_cache[key] = fn
        return fn

    def encode(self, data: bytes | np.ndarray, with_index: bool = True):
        """Returns (encoded_bytes, BlockIndex | None).

        Output bytes == tpu_huffman.encode(data) == the reference encoding.
        """
        symbols = (
            np.frombuffer(bytes(data), dtype=np.uint8)
            if isinstance(data, (bytes, bytearray))
            else np.asarray(data, dtype=np.uint8)
        )
        n = symbols.size
        if n == 0:
            empty = BlockIndex(self.block_symbols, np.zeros(0, np.int64),
                               np.zeros(0, np.int32), 0, 0)
            return b"", (empty if with_index else None)

        ndev = self._ndev
        # Shard size: multiple of block_symbols so decode striping aligns,
        # bucketed to a power of two so nearby input sizes reuse one
        # compiled shard program (round 4: the per-size retrace showed up
        # as a recompile on every odd length).
        per_dev = -(-n // ndev)
        per_dev = _bucket_pow2(per_dev, self.block_symbols)
        total_padded = per_dev * ndev
        padded = np.zeros(total_padded, dtype=np.uint8)
        padded[:n] = symbols
        n_valid = np.minimum(
            np.maximum(n - per_dev * np.arange(ndev, dtype=np.int64), 0), per_dev
        ).astype(np.int32)

        # Wrap guards (the device offset math is exact to 2^36 bits; local
        # per-shard cumsums are int32): raise instead of wrapping, matching
        # the single-chip _plan guard (ops/pallas_encode.py).
        if per_dev * int(self.table.max_len) >= 1 << 31:
            raise ValueError(
                "per-device shard would exceed 2^31 bits encoded; use more "
                "devices or the chunked streaming protocol"
            )

        use_offs = with_index and self._offsets_ok
        outs = self._encode_sharded_fn(per_dev, use_offs)(
            jnp.asarray(padded), jnp.asarray(n_valid)
        )
        words, local_bits, word_bases, bad = outs[:4]
        if bool(jnp.any(bad > 0)):
            lens = self.table.lengths[symbols]
            idx = int(np.flatnonzero(lens == 0)[0])
            raise UnknownSymbolError(index=idx, symbol=int(symbols[idx]))

        # Host-side int64 view of the shard bit layout (never wraps).
        totals64 = np.asarray(local_bits).astype(np.int64).reshape(-1)
        bases64 = np.cumsum(totals64) - totals64
        total_bits = int(totals64.sum())
        if total_bits >= 1 << 36:
            raise ValueError(
                "encoded stream exceeds 2^36 bits (8 GiB): int32 word "
                "indices would wrap; use the chunked streaming protocol"
            )
        num_words = total_bits // 32 + 2
        out_words = _stitch_kernel(
            words.reshape(ndev, -1), word_bases.reshape(-1).astype(jnp.int32),
            num_out_words=num_words,
        )
        out_np = np.asarray(out_words)
        # EOS padding on the final partial byte (host-side: one byte).
        out = bytearray(bytes_from_words_np(out_np, (total_bits + 7) // 8))
        tail = total_bits & 7
        if tail:
            pad = 8 - tail
            out[-1] |= self.eos_padding & ((1 << pad) - 1)
        if not with_index:
            return bytes(out), None

        n_blocks = -(-n // self.block_symbols)
        if use_offs:
            # Block offsets straight from the encode pipeline's own prefix
            # sums (free side output, LOCAL to each shard) plus the shard's
            # int64 global base — host work O(blocks), not O(N), and the
            # absolute offsets never wrap (they are int64 end-to-end).
            local_offs = np.asarray(outs[4]).astype(np.int64).reshape(ndev, -1)
            offsets = (local_offs + bases64[:, None]).reshape(-1)[:n_blocks]
        else:
            # Fallback (misaligned block_symbols): host cumsum over lengths.
            lens64 = self.table.lengths[symbols].astype(np.int64)
            ends = np.cumsum(lens64)
            starts_idx = np.arange(n_blocks) * self.block_symbols
            offsets = np.zeros(n_blocks, dtype=np.int64)
            offsets[1:] = ends[starts_idx[1:] - 1]
        n_sym = np.full(n_blocks, self.block_symbols, dtype=np.int32)
        n_sym[-1] = n - (n_blocks - 1) * self.block_symbols
        index = BlockIndex(
            symbols_per_block=self.block_symbols,
            bit_offsets=offsets.astype(np.int64),
            n_symbols=n_sym,
            total_symbols=n,
            total_bits=total_bits,
            max_code_len=int(self.table.lengths[symbols].max()) if n else 0,
        )
        return bytes(out), index

    # ---- multi-host collective encode ----

    def encode_sharded(self, local_data: bytes | np.ndarray,
                       with_index: bool = True):
        """Collective encode where each process contributes only ITS bytes.

        All processes must call this together; every process returns the
        same (encoded_bytes, BlockIndex) — bit-identical to the
        single-stream encoding of the processes' bytes concatenated in
        process order (the reference's chunked == one-shot contract,
        huffman_testing.c:75-173). No host ever materializes the full
        input: each process feeds its local shard via
        jax.make_array_from_process_local_data; the only host-side global
        arrays are the (compressed-size) output words, the per-shard bit
        totals and the O(blocks) offset index. Shard lengths may differ
        across processes (interior padding is masked out of the stream by
        per-block valid counts; padding blocks appear in the index with
        n_symbols == 0).

        Requires ``self.mesh`` to enumerate devices in process order
        (e.g. distributed.global_data_mesh / dcn_ici_mesh).
        """
        local = (
            np.frombuffer(bytes(local_data), dtype=np.uint8)
            if isinstance(local_data, (bytes, bytearray))
            else np.asarray(local_data, dtype=np.uint8)
        )
        nproc = jax.process_count()
        if nproc == 1:
            return self.encode(local.tobytes(), with_index=with_index)
        from jax.experimental import multihost_utils

        ld = jax.local_device_count()
        bs = self.block_symbols
        axes = _flat_axes(self.mesh)
        spec = P(axes[0] if len(axes) == 1 else axes)
        sh1 = NamedSharding(self.mesh, spec)

        lens = np.asarray(
            multihost_utils.process_allgather(
                np.array([local.size], np.int64)
            )
        ).reshape(-1)
        per_dev = max(bs, -(-int(lens.max()) // ld))
        per_dev = _bucket_pow2(per_dev, bs)
        slab = np.zeros(ld * per_dev, np.uint8)
        slab[: local.size] = local
        nv_local = np.clip(
            local.size - per_dev * np.arange(ld, dtype=np.int64), 0, per_dev
        ).astype(np.int32)
        ndev = nproc * ld
        arr = jax.make_array_from_process_local_data(
            sh1, slab, (ndev * per_dev,)
        )
        nv = jax.make_array_from_process_local_data(sh1, nv_local, (ndev,))

        if with_index and not self._offsets_ok:
            from .ops import pallas_encode as pe

            raise ValueError(
                "encode_sharded needs block_symbols aligned to the pack "
                f"pipeline's offset granularity "
                f"({pe.offset_granularity(self.table)}) so the index can "
                "come from device-side prefix sums (no host O(N) work)"
            )
        if per_dev * int(self.table.max_len) >= 1 << 31:
            raise ValueError(
                "per-device shard would exceed 2^31 bits encoded; use more "
                "devices or the chunked streaming protocol"
            )
        use_offs = with_index
        outs = self._encode_sharded_fn(per_dev, use_offs)(arr, nv)
        words, local_bits, _word_bases, bad = outs[:4]

        def gather(garr) -> np.ndarray:
            """Global sharded array -> full np array on every process, via
            allgather of each process's addressable rows (process order ==
            device order by the mesh requirement above)."""
            shards = sorted(garr.addressable_shards, key=lambda s: s.index)
            local_np = np.concatenate([np.asarray(s.data) for s in shards])
            return np.asarray(
                multihost_utils.process_allgather(local_np, tiled=True)
            )

        bad_np = gather(bad)  # small [ndev]
        if (bad_np > 0).any():
            # Report the first local offender if this process has one (each
            # process scans only its OWN bytes).
            bad_l = np.flatnonzero(self.table.lengths[local] == 0)
            if bad_l.size:
                i = int(bad_l[0])
                raise UnknownSymbolError(index=i, symbol=int(local[i]))
            raise UnknownSymbolError()
        totals = gather(local_bits).astype(np.int64).reshape(-1)
        offsets_dev = np.cumsum(totals) - totals
        total_bits = int(totals.sum())
        if total_bits >= 1 << 36:
            raise ValueError(
                "encoded stream exceeds 2^36 bits (8 GiB): int32 word "
                "indices would wrap; use the chunked streaming protocol"
            )

        # Output assembly: gather only the words each shard actually used
        # (~compressed size), then OR them in at their word bases on host.
        Wshard = words.shape[0] // ndev
        wmax = int(
            min(Wshard, (int(totals.max()) + 31) // 32 + 2)
        )
        w2d = words.reshape(ndev, Wshard)[:, :wmax]
        words_np = gather(w2d).reshape(ndev, wmax)
        out_words = np.zeros(total_bits // 32 + 2, np.uint32)
        for s in range(ndev):
            if totals[s] == 0:
                continue
            base = int(offsets_dev[s]) >> 5
            nw = min(wmax, out_words.size - base)
            out_words[base : base + nw] |= words_np[s, :nw]
        out = bytearray(bytes_from_words_np(out_words, (total_bits + 7) // 8))
        tail = total_bits & 7
        if tail:
            out[-1] |= self.eos_padding & ((1 << (8 - tail)) - 1)

        n_total = int(lens.sum())
        if not with_index:
            return bytes(out), None

        # Index over the padded global positions: per-device block counts
        # from the gathered lengths; offsets from the pipeline (or the
        # device-side cumsum fallback at foreign granularities).
        blocks_per_dev = per_dev // bs
        n_blocks = ndev * blocks_per_dev
        counts_dev = np.clip(
            np.repeat(lens, ld)
            - per_dev * np.tile(np.arange(ld, dtype=np.int64), nproc),
            0,
            per_dev,
        )
        n_sym = np.clip(
            counts_dev[:, None] - bs * np.arange(blocks_per_dev)[None, :],
            0,
            bs,
        ).astype(np.int32).reshape(-1)
        # Local pipeline offsets + each shard's int64 global base: absolute
        # block offsets are int64 end-to-end and never wrap.
        local_offs = gather(outs[4]).astype(np.int64).reshape(ndev, -1)
        offsets = (local_offs + offsets_dev[:, None]).reshape(-1)[:n_blocks]
        index = BlockIndex(
            symbols_per_block=bs,
            bit_offsets=offsets.astype(np.int64),
            n_symbols=n_sym,
            total_symbols=n_total,
            total_bits=total_bits,
        )
        return bytes(out), index

    # ---- decode ----

    def _pallas_decode_sharded(self, Kh: int, Wb: int, Wbh: int, G: int):
        key = (Kh, Wb, Wbh, G)
        if key in self._pdec_cache:
            return self._pdec_cache[key]
        from .ops import pallas_decode as pd

        intervals, aux = pd.decode_dispatch(self.table)
        axes = _flat_axes(self.mesh)
        spec = P(axes[0] if len(axes) == 1 else axes)
        body = functools.partial(
            _shard_decode_body_pallas_dual,
            Kh=Kh, Wb=Wb, Wbh=Wbh, G=G,
            intervals=intervals,
            p32_flat=aux,
            interpret=pd._use_interpret(),
        )
        fn = jax.jit(
            jax.shard_map(
                body, mesh=self.mesh, in_specs=(spec,) * 5,
                out_specs=(spec, spec), check_vma=False,
            )
        )
        self._pdec_cache[key] = fn
        return fn

    def _decode_pallas(self, words_np: np.ndarray, index: BlockIndex) -> bytes:
        """Stripe index-block PAIRS over shards; each shard runs the
        dual-chain Pallas pipeline (round 4, VERDICT r3 #7: the mesh path
        previously drove the single-chain kernel — each lane now decodes
        two interleaved Kh-symbol half-chains, the round-3 latency-bound
        kernel win, reusing the same pairing plan as bench.py)."""
        from .ops import pallas_decode as pd

        ndev = self._ndev
        Kh = index.symbols_per_block
        off64 = index.bit_offsets.astype(np.int64)
        baseg, relg, relmg, nsymg, nb, Wb, Wbh, _Gg = pd.pair_dual_inputs(
            off64, index.n_symbols, index.total_bits, self.table, Kh
        )
        lpd = -(-nb // ndev)  # lanes (pairs) per device
        G = max(1, -(-lpd // pd.LANES))
        Bp = G * pd.LANES
        NR = pd._rows_for(Wb)

        lane_first = np.minimum(np.arange(ndev) * lpd, nb - 1)
        word_base = baseg[lane_first].astype(np.int64)
        lane_last = np.minimum((np.arange(ndev) + 1) * lpd, nb) - 1
        rel_last = baseg[lane_last].astype(np.int64) - word_base
        wmax = int(rel_last.max()) + NR * pd.STAGE_RW + pd.STAGE_RW
        win = np.zeros((ndev, wmax), dtype=np.uint32)
        for s in range(ndev):
            lo = int(word_base[s])
            hi = min(lo + wmax, words_np.size)
            win[s, : hi - lo] = words_np[lo:hi]

        base = np.zeros((ndev, Bp), np.int32)
        rel = np.zeros((ndev, Bp), np.int32)
        relm = np.zeros((ndev, Bp), np.int32)
        nsym = np.zeros((ndev, Bp), np.int32)
        l_idx = np.arange(nb)
        s_of_l = np.minimum(l_idx // lpd, ndev - 1)
        flatpos = s_of_l * Bp + (l_idx - s_of_l * lpd)
        # rel/relm are word-relative to the pair's own base, so only base
        # needs the shard-frame shift.
        base.reshape(-1)[flatpos] = (
            baseg[:nb].astype(np.int64) - word_base[s_of_l]
        ).astype(np.int32)
        rel.reshape(-1)[flatpos] = relg[:nb]
        relm.reshape(-1)[flatpos] = relmg[:nb]
        nsym.reshape(-1)[flatpos] = nsymg[:nb]

        out, bad = self._pallas_decode_sharded(Kh, Wb, Wbh, G)(
            jnp.asarray(win).reshape(-1),
            jnp.asarray(base).reshape(-1),
            jnp.asarray(rel).reshape(-1),
            jnp.asarray(relm).reshape(-1),
            jnp.asarray(nsym).reshape(-1),
        )
        if bool(jnp.any(bad > 0)):
            raise UnknownSymbolError()
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            out_np = multihost_utils.process_allgather(out, tiled=True)
        else:
            out_np = np.asarray(out)
        flat = (
            np.ascontiguousarray(out_np.reshape(ndev, Bp, Kh // 2))
            .view(np.uint8)
            .reshape(ndev, Bp, 2 * Kh)[:, :lpd]
            .reshape(ndev * lpd, 2 * Kh)[:nb]
        )
        if (nsymg[: nb - 1] == 2 * Kh).all():
            return flat.reshape(-1)[: index.total_symbols].tobytes()
        mask = np.arange(2 * Kh)[None, :] < nsymg[:nb, None]
        return flat[mask].tobytes()

    def decode(self, data: bytes | np.ndarray, index: BlockIndex) -> bytes:
        """Block-parallel decode striped over the mesh."""
        raw = bytes(data) if isinstance(data, (bytes, bytearray)) else bytes(
            np.asarray(data, dtype=np.uint8).tobytes()
        )
        if index.total_symbols == 0:
            return b""
        words_np, _ = words_from_bytes_np(raw)
        words_np = np.concatenate([words_np, np.zeros(2, dtype=np.uint32)])

        from .ops import pallas_decode as pd

        if pd.supports(self.table, index.symbols_per_block) and not pd._use_interpret():
            return self._decode_pallas(words_np, index)

        ndev = self._ndev
        B = index.bit_offsets.size
        bpd = -(-B // ndev)  # blocks per device
        # Per-shard word windows: shard s covers blocks [s*bpd, (s+1)*bpd).
        first = np.minimum(np.arange(ndev) * bpd, B - 1)
        word_base = (index.bit_offsets[first].astype(np.int64) // 32).astype(np.int64)
        # Window size: max words any shard touches.
        ends_bits = np.empty(ndev, dtype=np.int64)
        for s in range(ndev):
            last_b = min((s + 1) * bpd, B) - 1
            if last_b < s * bpd:
                ends_bits[s] = word_base[s] * 32
            else:
                ends_bits[s] = int(index.bit_offsets[last_b]) + int(
                    index.n_symbols[last_b]
                ) * self.table.max_len
        wmax = int(np.max(-(-(ends_bits - word_base * 32) // 32))) + 2
        win = np.zeros((ndev, wmax), dtype=np.uint32)
        for s in range(ndev):
            lo = int(word_base[s])
            hi = min(lo + wmax, words_np.size)
            win[s, : hi - lo] = words_np[lo:hi]

        rel_offsets = np.zeros((ndev, bpd), dtype=np.int32)
        n_sym = np.zeros((ndev, bpd), dtype=np.int32)
        b_idx = np.arange(B)
        s_of_b = b_idx // bpd
        rel_offsets.reshape(-1)[:B] = (
            index.bit_offsets.astype(np.int64) - 32 * word_base[s_of_b]
        ).astype(np.int32)
        n_sym.reshape(-1)[:B] = index.n_symbols

        syms = self._decode_sharded(
            jnp.asarray(win).reshape(-1),
            jnp.asarray(rel_offsets).reshape(-1),
            jnp.asarray(n_sym).reshape(-1),
        )
        if jax.process_count() > 1:
            # Sharded output isn't fully addressable per process: gather the
            # global value (DCN collective) so every host returns the stream.
            from jax.experimental import multihost_utils

            syms_np = multihost_utils.process_allgather(syms, tiled=True)
        else:
            syms_np = np.asarray(syms)
        out = syms_np.reshape(ndev * bpd, self.block_symbols)[:B]
        if (index.n_symbols[:-1] == self.block_symbols).all():
            # Blocks are full except possibly the last: flatten then cut.
            return out.reshape(-1)[: index.total_symbols].tobytes()
        mask = (
            np.arange(self.block_symbols)[None, :] < index.n_symbols[:, None]
        )
        return out[mask].tobytes()


def _shard_decode_body_pallas_dual(win, base, rel, relm, nsym, *, Kh, Wb,
                                   Wbh, G, intervals, p32_flat, interpret):
    """Per-shard dual-chain Pallas decode; under shard_map.

    win: uint32[wmax] this shard's word window; base/rel/relm/nsym:
    int32[G*1024] per-LANE-PAIR (word index, half-0 bit, half-1 bit,
    pair symbol count). Returns (packed symbol tile flattened
    uint32[G*1024*Kh/2], bad int32[1] poison flag)."""
    from .ops.pallas_decode import _decode_pipeline_dual

    out, _end, bad = _decode_pipeline_dual(
        win.reshape(-1), base.reshape(-1), rel.reshape(-1),
        relm.reshape(-1), nsym.reshape(-1),
        Kh, Wb, Wbh, G, intervals, p32_flat, interpret,
    )
    return out.reshape(-1), bad.astype(jnp.int32)[None]


def _shard_decode_body(win, rel_offsets, n_sym, l0_bits, l0_val, l1_bits, l1_val,
                       root_bits, steps):
    """Per-shard block decode; runs under shard_map (flat 1-D inputs)."""
    win = win.reshape(-1)
    offs = rel_offsets.reshape(-1)
    ns = n_sym.reshape(-1)
    dt = _LutView(l0_bits, l0_val, l1_bits, l1_val)

    def step(off, i):
        from .ops.bitpack import extract_windows

        w = extract_windows(win, off)
        sym, nbits = lut_lookup(w, dt, root_bits)
        active = i < ns
        return jnp.where(active, off + nbits, off), sym.astype(jnp.uint8)

    _, syms = jax.lax.scan(step, offs.astype(jnp.int32),
                           jnp.arange(steps, dtype=jnp.int32))
    return syms.T.reshape(-1)
