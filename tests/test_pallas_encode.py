"""Pallas pack-encode kernel: bit-exactness vs the host oracle.

Covers the same contract as the reference encoder tests
(reference: tests/huffman_test.c:62-115 golden vectors; huffman.c:131-187
single-call semantics incl. eos padding at stream end).
"""

import numpy as np
import pytest

import tpu_huffman as th
from tpu_huffman.ops import pallas_encode
from tpu_huffman.stream import HuffmanEncoder


@pytest.fixture(scope="module")
def table():
    return th.load_static_test_table()


def _host_encode(data, table, eos_padding=0xFF):
    enc = HuffmanEncoder(table, eos_padding=eos_padding)
    res = enc.encode(bytes(data))
    return res


@pytest.mark.slow
@pytest.mark.parametrize("n", [1, 33, 1000, 40000])
def test_matches_host_encoder_random(table, n):
    rng = np.random.default_rng(n)
    data = rng.integers(0, 256, size=n, dtype=np.uint8).tobytes()
    got, total_bits = pallas_encode.encode(data, table)
    want = _host_encode(data, table)
    assert got == want
    assert total_bits == int(table.lengths[np.frombuffer(data, np.uint8)].sum())


def test_golden_www_example_com(table):
    # reference: tests/huffman_test.c:20-24
    data = b"www.example.com"
    got, _ = pallas_encode.encode(data, table)
    assert got == _host_encode(data, table)


def test_eos_padding_variants(table):
    data = b"hello, eos padding"
    for pad in (0xFF, 0x00, 0xA5):
        got, _ = pallas_encode.encode(data, table, eos_padding=pad)
        assert got == _host_encode(data, table, eos_padding=pad)


def test_even_byte_no_padding(table):
    # "cdfh" packs to an even number of bytes (reference: huffman_test.c:401-412)
    data = b"cdfh"
    got, _ = pallas_encode.encode(data, table)
    assert got == _host_encode(data, table)


def test_empty(table):
    out, total = pallas_encode.encode(b"", table)
    assert out == b"" and total == 0


@pytest.mark.slow
def test_unknown_symbol_raises():
    tbl = th.tables.make_canonical({i: 5 for i in range(65, 97)})
    with pytest.raises(th.UnknownSymbolError):
        pallas_encode.encode(b"ABC\x00", tbl)


def test_encode_step_seam(table):
    import jax.numpy as jnp

    n = 1000
    rng = np.random.default_rng(7)
    data = rng.integers(0, 256, size=n, dtype=np.uint8)
    fn, fin = pallas_encode.encode_step(table, n)
    words, total_bits, padded_bits = fn(jnp.asarray(data))
    from tpu_huffman.ops.bitpack import bytes_from_words_np

    got = bytes_from_words_np(np.asarray(words), int(padded_bits) // 8)
    assert got == _host_encode(data.tobytes(), table)


def test_best_encode_step_dispatch(table):
    from tpu_huffman.ops.encode import best_encode_step

    fn, fin = best_encode_step(table, 256)
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    data = rng.integers(0, 256, size=256, dtype=np.uint8)
    words, total_bits, padded_bits = fn(jnp.asarray(data))
    from tpu_huffman.ops.bitpack import bytes_from_words_np

    got = bytes_from_words_np(np.asarray(words), int(padded_bits) // 8)
    assert got == _host_encode(data.tobytes(), table)


def test_fused_stitch_multi_grid_carry(table):
    """The fused-stitch kernel carries block offsets across grid steps in a
    VMEM scratch tile (sequential grid); K=4 forces G >= 4 so a bug in the
    carry (or in grid ordering) shifts every block after the first 1024."""
    import jax.numpy as jnp

    n = 20000
    rng = np.random.default_rng(5)
    data = rng.integers(0, 256, size=n, dtype=np.uint8)
    want = _host_encode(data.tobytes(), table)
    from tpu_huffman.ops.bitpack import bytes_from_words_np

    enc, fin = pallas_encode.encode_step(table, n, K=4)
    words, total_bits, padded_bits = fin(jnp.asarray(data))
    got = bytes_from_words_np(np.asarray(words), (int(padded_bits) + 7) // 8)
    assert got == want


@pytest.mark.slow
def test_fused_matches_classic_pipeline(table):
    """Force the classic XLA funnel/barrel/cumsum path (fuse_sw=0 via a
    huge synthetic max_len guard breach is awkward; instead call the
    kernel builder directly) and compare whole-pipeline outputs."""
    import jax
    import jax.numpy as jnp

    n = 8192
    K = 8
    rng = np.random.default_rng(11)
    data = rng.integers(0, 256, size=n, dtype=np.uint8)
    want = _host_encode(data.tobytes(), table)
    from tpu_huffman.ops.bitpack import bytes_from_words_np

    p32t, lent, mn, mx, Wb, G, now = pallas_encode._plan(table, n, K)
    B = G * pallas_encode.LANES
    nsym_np = np.zeros(B, np.int32)
    nsym_np[: n // K] = K
    if n % K:
        nsym_np[n // K] = n % K
    padded = np.zeros(B * K, np.uint8)
    padded[:n] = data
    syms_u32 = jnp.asarray(padded.view("<u4"))
    nsym = jnp.asarray(nsym_np)

    outs = {}
    for fuse in (0, pallas_encode.STITCH_SW):
        out = pallas_encode._make_pack_call(
            p32t, lent, K, Wb, G, mn, mx,
            pallas_encode._use_interpret(), None, fuse,
        )(
            syms_u32.reshape(G, 8, 128, K // 4).transpose(0, 3, 1, 2),
            nsym.reshape(G, 8, 128),
        )
        outs[fuse] = out
    # Classic: rows anchored at bit 0 per block. Fused: pre-barreled rows
    # + offsets. Compare at the whole-stream level via the public seam.
    words, total_bits, _pb, bad, ovf, offs_sub = pallas_encode._encode_pipeline(
        syms_u32, nsym, jnp.uint32(0xFF), K, G, Wb, now,
        p32t, lent, mn, mx, pallas_encode._use_interpret(),
    )
    got = bytes_from_words_np(
        np.asarray(words), (int(total_bits) + 7 + (-int(total_bits)) % 8) // 8
    )
    # padded_bits rounding: use the host result length directly.
    got = got[: len(want)]
    assert got == want
    assert not bool(bad) and not bool(ovf)
    # The fused offsets equal an exclusive cumsum of per-block bit totals.
    _rows, bits, _bad, offs_t = outs[pallas_encode.STITCH_SW]
    nsub = K // pallas_encode._sub_block(K, mn, mx)
    bt = np.asarray(bits).reshape(G, nsub, 8, 128).sum(axis=1).reshape(B)
    offs = np.asarray(offs_t).reshape(B)
    want_offs = np.concatenate([[0], np.cumsum(bt)[:-1]]).astype(np.int64)
    assert (offs == want_offs).all()


@pytest.mark.slow
def test_fused_tiny_and_exact_fit(table):
    """n < K (single partial block) and n exactly filling all blocks."""
    import jax.numpy as jnp
    from tpu_huffman.ops.bitpack import bytes_from_words_np

    for n, K in ((3, 8), (4096, 4)):
        rng = np.random.default_rng(n)
        data = rng.integers(0, 256, size=n, dtype=np.uint8)
        want = _host_encode(data.tobytes(), table)
        enc, fin = pallas_encode.encode_step(table, n, K=K)
        words, total_bits, padded_bits = fin(jnp.asarray(data))
        got = bytes_from_words_np(np.asarray(words), (int(padded_bits) + 7) // 8)
        assert got == want


def test_int32_bit_budget_guard(table):
    """One call is bounded at 2^31 output bits (int32 device offsets); a
    too-large input must raise with guidance instead of silently
    overflowing (the reference's size_t arithmetic has no such bound,
    huffman.c:107-129, so the bound must be loud)."""
    big_n = (1 << 31) // int(table.max_len) + 1
    with pytest.raises(ValueError, match="2\\^31"):
        pallas_encode._plan(table, big_n, K=1024)


def test_gather_tail_plan_eligibility(table):
    """Gather stitch requires every full block to advance >= 1 output row
    (K*min_len >= 32*SW); below that the scatter tail stays."""
    dmin, jmax = pallas_encode.gather_tail_plan(1024, 5, 10, 320)
    assert dmin == 1 and jmax == 3
    dmin2, _ = pallas_encode.gather_tail_plan(1024, 5, 10, 320, dmin_hint=2)
    assert dmin2 == 2
    assert pallas_encode.gather_tail_plan(32, 5, 10, 10) == (0, 0)
    assert pallas_encode.gather_tail_plan(512, 5, 30, 480) == (0, 0)


def test_gather_tail_spill_merge_matches_host(monkeypatch):
    """Round-4 gather stitch (one sorted row-take instead of scatter
    passes) incl. the in-kernel spill merge. Narrowing the stitch row to
    8 words makes K=32 gather-eligible (K*min_len = 256 >= 32*SW), so the
    real code path runs at interpret-tier cost: canonical 8-10-bit codes
    span 1-2 output rows per block, producing real cross-row spills and
    jmax=2 merge cases. Bit-exact vs the host encoder at full, partial,
    and sub-block sizes. (Cross-GRID-step seams need n > 32Ki symbols —
    interpret-hostile; covered on TPU by the bench's bit-exactness
    assert.)"""
    import jax.numpy as jnp

    from tpu_huffman import tables as T
    from tpu_huffman.ops.bitpack import bytes_from_words_np

    monkeypatch.setattr(pallas_encode, "STITCH_SW", 8)
    lens = {s: 8 + (s % 3) for s in range(256)}
    tbl = T.make_canonical(lens)
    dmin, jmax = pallas_encode.gather_tail_plan(32, 8, 10, 10)
    assert dmin == 1 and jmax == 2
    rng = np.random.default_rng(42)
    for n in (1, 129, 1000):
        data = rng.integers(0, 256, size=n, dtype=np.uint8)
        want = _host_encode(data.tobytes(), tbl)
        enc, fin = pallas_encode.encode_step(tbl, n, K=32)
        words, total_bits, padded_bits = fin(jnp.asarray(data))
        got = bytes_from_words_np(
            np.asarray(words), (int(padded_bits) + 7) // 8
        )
        assert got == want, n


def test_gather_tail_dmin_hint_violation_reruns(monkeypatch):
    """An over-tight dmin hint (learned from other data) must trip the
    d-check flag and re-run with the static plan, still bit-exact; the
    hint is then re-learned from the stream's own offsets."""
    from tpu_huffman import tables as T

    monkeypatch.setattr(pallas_encode, "STITCH_SW", 8)
    lens = {s: 8 + (s % 3) for s in range(256)}
    tbl = T.make_canonical(lens)
    rng = np.random.default_rng(43)
    data = rng.integers(0, 256, size=700, dtype=np.uint8)
    want = _host_encode(data.tobytes(), tbl)
    object.__setattr__(tbl, "_dmin_hint", 99)
    got, _bits = pallas_encode.encode(data.tobytes(), tbl)
    assert got == want
    assert getattr(tbl, "_dmin_hint") < 99


def test_out_cap_hint_violation_reruns():
    """A too-small learned output-rate hint (from more compressible data)
    must trip the output-overflow flag and re-run with the static buffer,
    still bit-exact (round 4: span-adaptive output buffer)."""
    table = th.load_static_test_table()
    rng = np.random.default_rng(51)
    data = rng.integers(0, 256, size=1000, dtype=np.uint8).tobytes()
    want = _host_encode(data, table)
    object.__setattr__(table, "_rate_hint", 0.01)  # absurd: ~0 bits/symbol
    object.__setattr__(table, "_wb_hint", None)
    object.__setattr__(table, "_dmin_hint", None)
    try:
        got, _bits = pallas_encode.encode(data, table)
    finally:
        object.__setattr__(table, "_rate_hint", None)
    assert got == want
