"""Split-plan encode (round 5): kernels planned on the DATA's code-length
envelope, not the table's worst case.

The RFC 7541 HPACK table holds 30-bit codes for bytes that never appear
in legal header text; a real header stream is ~all 5-10-bit codes. The
split plan caps the pack kernel at the data's max code length — deeper
symbols become length-0 entries whose bad flag forces a full-plan re-run
— while the one-shot driver computes the exact envelope per call so no
re-run can trigger there. Reference semantics are unchanged throughout
(bit-identical streams, source/huffman.c:131-187; unknown-symbol raise,
source/huffman.c:62-64).
"""

import numpy as np
import pytest

import tpu_huffman as th
from tpu_huffman.errors import UnknownSymbolError
from tpu_huffman.ops import pallas_encode
from tpu_huffman.ops.encode import best_encode_step
from tpu_huffman.stream import HuffmanEncoder


@pytest.fixture(scope="module")
def hpack():
    return th.load_hpack_table()


@pytest.fixture(scope="module")
def partial_table():
    # 5..18-bit canonical table covering only 40 symbols: symbols >= 40
    # are UNKNOWN (length 0), exercising the unknown-vs-too-deep split.
    lens = {s: 6 for s in range(32)}
    lens.update({32 + i: 10 + i for i in range(8)})
    return th.make_canonical(lens, name="split_partial")


def _host_encode(data, table):
    return HuffmanEncoder(table).encode(bytes(data))


def test_plan_caps_deep_entries(hpack):
    p32t, lent, min_len, max_len, _wb, _g, _now = pallas_encode._plan(
        hpack, 1024, K=32, maxlen_cap=10
    )
    assert max_len == 10 and min_len == int(hpack.min_len)
    deep = np.asarray(lent) == 0
    assert deep.any()
    assert (np.asarray(p32t)[deep] == 0).all()
    # symbols at or under the cap keep their exact entries
    kept = ~deep
    assert (np.asarray(lent)[kept] == hpack.lengths[kept]).all()


def test_plan_cap_noop_when_unattainable(hpack):
    full = pallas_encode._plan(hpack, 1024, K=32)
    for cap in (int(hpack.max_len), 99):
        capped = pallas_encode._plan(hpack, 1024, K=32, maxlen_cap=cap)
        assert capped[:4] == full[:4]


def test_one_shot_exact_with_and_without_deep_codes(partial_table):
    # the partial table (max 17 bits) keeps the deep-plan interpret run
    # affordable in the default gate; the hpack-30 deep plan runs in the
    # slow twin below
    t = partial_table
    rng = np.random.default_rng(5)
    data = rng.integers(0, 32, size=2048, dtype=np.uint8)
    got, _ = pallas_encode.encode(data.tobytes(), t)
    assert got == _host_encode(data, t)
    # same data with one deep (17-bit) code spliced in: the exact
    # envelope re-plans deep and stays bit-identical
    deep_sym = int(np.argmax(t.lengths))
    data2 = data.copy()
    data2[137] = deep_sym
    got2, _ = pallas_encode.encode(data2.tobytes(), t)
    assert got2 == _host_encode(data2, t)


@pytest.mark.slow
def test_one_shot_exact_deep_hpack(hpack):
    rng = np.random.default_rng(5)
    shallow_syms = np.flatnonzero(hpack.lengths <= 8)
    data = rng.choice(shallow_syms, size=2048).astype(np.uint8)
    data[137] = int(np.argmax(hpack.lengths))  # one 30-bit code
    got, _ = pallas_encode.encode(data.tobytes(), hpack)
    assert got == _host_encode(data, hpack)


def test_encode_step_shallow_miss_raises_overflow(hpack):
    rng = np.random.default_rng(6)
    shallow_syms = np.flatnonzero(hpack.lengths <= 8)
    data = rng.choice(shallow_syms, size=2048).astype(np.uint8)
    _enc, fin = pallas_encode.encode_step(hpack, data.size, maxlen_cap=8)
    import jax.numpy as jnp

    w, total, padded = fin(jnp.asarray(data))
    ref = _host_encode(data, hpack)
    from tpu_huffman.ops.bitpack import bytes_from_words_np

    assert bytes_from_words_np(np.asarray(w), int(padded) // 8) == ref
    # a deeper-than-cap code trips the bad flag; finalize resolves it to
    # OverflowError (re-plan), NOT UnknownSymbolError
    data2 = data.copy()
    data2[0] = int(np.argmax(hpack.lengths))
    with pytest.raises(OverflowError):
        fin(jnp.asarray(data2))


def test_encode_step_shallow_unknown_still_raises(partial_table):
    rng = np.random.default_rng(7)
    data = rng.integers(0, 32, size=1024, dtype=np.uint8)
    _enc, fin = pallas_encode.encode_step(
        partial_table, data.size, maxlen_cap=6
    )
    import jax.numpy as jnp

    data2 = data.copy()
    data2[100] = 200  # no code at all
    with pytest.raises(UnknownSymbolError):
        fin(jnp.asarray(data2))


def test_best_encode_step_derives_cap_from_sample(hpack):
    rng = np.random.default_rng(8)
    shallow_syms = np.flatnonzero(hpack.lengths <= 8)
    data = rng.choice(shallow_syms, size=2048).astype(np.uint8)
    import jax.numpy as jnp

    enc, fin = best_encode_step(hpack, data.size, sample=data)
    w, total, padded = fin(jnp.asarray(data))
    from tpu_huffman.ops.bitpack import bytes_from_words_np

    assert bytes_from_words_np(np.asarray(w), int(padded) // 8) == \
        _host_encode(data, hpack)


def test_hint_key_invalidates_across_plans(partial_table):
    # learn hints under the shallow plan, then encode deep data: the
    # (K, cap) hint key must not leak shallow span hints into the deep
    # plan (they would be wrong for its K/S shape).
    t = partial_table
    rng = np.random.default_rng(9)
    d1 = rng.integers(0, 32, size=2048, dtype=np.uint8)  # all 6-bit codes
    pallas_encode.encode(d1.tobytes(), t)
    key1 = getattr(t, "_hint_key", None)
    d2 = rng.integers(0, 40, size=2048, dtype=np.uint8)  # up to 17-bit
    got, _ = pallas_encode.encode(d2.tobytes(), t)
    assert got == _host_encode(d2, t)
    key2 = getattr(t, "_hint_key", None)
    assert key1 != key2  # deeper envelope re-keyed the hints


def test_offsets_granularity_consistent_under_cap(hpack):
    rng = np.random.default_rng(10)
    shallow_syms = np.flatnonzero(hpack.lengths <= 8)
    data = rng.choice(shallow_syms, size=2048).astype(np.uint8)
    every = pallas_encode.index_granularity(hpack)
    out, total_bits, offsets = pallas_encode.encode_with_offsets(
        data.tobytes(), hpack, every=every
    )
    assert out == _host_encode(data, hpack)
    # offsets must be the true bit starts of every `every`-th symbol
    lens = hpack.lengths[data].astype(np.int64)
    starts = np.cumsum(lens) - lens
    assert (offsets.astype(np.int64) == starts[::every]).all()


def test_indexed_decode_split_plan():
    """The index carries the stream's code-length envelope and the decoder
    plans its interval kernel on it (gate tier: one small capped-kernel
    variant; the understated-cap re-run lives in the slow twin — every
    distinct interpret kernel costs tens of seconds of per-process
    tracing)."""
    t = th.load_static_test_table()
    rng = np.random.default_rng(11)
    shallow = np.flatnonzero(t.lengths <= 6)
    data = rng.choice(shallow, size=1024).astype(np.uint8)
    enc, idx = th.encode_with_index(data.tobytes(), t, block_symbols=16)
    assert idx.max_code_len == 6
    assert th.decode_indexed(enc, idx, t) == data.tobytes()


@pytest.mark.slow
def test_indexed_decode_understated_cap_reruns(partial_table):
    """A deliberately UNDERSTATED envelope (deeper codes in the stream)
    poisons the capped attempt and re-runs with the full structure —
    never a wrong decode."""
    import dataclasses

    t = partial_table
    rng = np.random.default_rng(11)
    data2 = rng.integers(0, 40, size=1024, dtype=np.uint8)
    enc2, idx2 = th.encode_with_index(data2.tobytes(), t, block_symbols=16)
    assert idx2.max_code_len == int(t.lengths[data2].max())
    idx3 = dataclasses.replace(idx2, max_code_len=6)
    assert th.decode_indexed(enc2, idx3, t) == data2.tobytes()
