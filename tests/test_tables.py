"""Table compiler tests: parsing, validation, LUT construction, symbol KATs.

Mirrors reference tiers 1 and 7 (SURVEY.md §4): every code point
encodes/decodes to the table value (reference tests/huffman_test.c:42-60 and
199-220), plus table-compiler checks the reference does in its generator.
"""

import numpy as np
import pytest

import tpu_huffman as th
from tpu_huffman.tables import CodeSpec, HuffmanTable, parse_def, parse_tsv


@pytest.fixture(scope="session")
def static_table():
    return th.load_static_test_table()


def test_symbol_encoder_kat(static_table):
    """Every one of the 256 code points encodes to its table value."""
    for spec in static_table.specs():
        pattern, nbits = static_table.encode_symbol(spec.symbol)
        assert pattern == spec.pattern
        assert nbits == spec.num_bits
    assert len(static_table.specs()) == 256


def test_symbol_decoder_kat(static_table):
    """Every code point decodes from its MSB-aligned window.

    Equivalent of reference tests/huffman_test.c:199-220.
    """
    for spec in static_table.specs():
        window = spec.pattern << (32 - spec.num_bits)
        symbol, bits_read = static_table.decode_window(window)
        assert symbol == spec.symbol
        assert bits_read == spec.num_bits


def test_length_histogram(static_table):
    """Structure check against the reference table (SURVEY.md §2.1)."""
    lens = static_table.lengths
    hist = {l: int((lens == l).sum()) for l in range(1, 11) if (lens == l).any()}
    assert hist == {5: 10, 6: 9, 7: 5, 8: 10, 9: 13, 10: 209}
    assert static_table.max_len == 10
    assert static_table.min_len == 5


def test_parse_def_format():
    text = """
# include-style directive to skip
/* block comment HUFFMAN_CODE(99, "1", 0x1, 1) must be ignored */
HUFFMAN_CODE(  0,      "00", 0x0, 2)
HUFFMAN_CODE(  1,      "01", 0x1, 2)
HUFFMAN_CODE(  2,      "1", 0x1, 1)
"""
    specs = parse_def(text)
    assert [(s.symbol, s.num_bits, s.pattern) for s in specs] == [
        (0, 2, 0),
        (1, 2, 1),
        (2, 1, 1),
    ]


def test_parse_def_matches_reference_table(static_table):
    """Our .def parser reads the reference's own table file identically."""
    ref = "/root/reference/tests/test_huffman_static_table.def"
    import os

    if not os.path.exists(ref):
        pytest.skip("reference not mounted")
    t = HuffmanTable.from_def_file(ref)
    np.testing.assert_array_equal(t.patterns, static_table.patterns)
    np.testing.assert_array_equal(t.lengths, static_table.lengths)


def test_def_bit_string_mismatch_rejected():
    with pytest.raises(th.TableError):
        parse_def('HUFFMAN_CODE(0, "01", 0x0, 2)')


def test_duplicate_symbol_rejected():
    with pytest.raises(th.TableError):
        HuffmanTable.from_specs([CodeSpec(0, 1, 0), CodeSpec(0, 2, 2)])


def test_non_prefix_free_rejected():
    # "0" is a prefix of "01"
    with pytest.raises(th.TableError):
        HuffmanTable.from_specs([CodeSpec(0, 1, 0), CodeSpec(1, 2, 1)])


def test_make_canonical_roundtrip():
    t = th.make_canonical({i: 8 for i in range(256)})
    for s in range(256):
        pat, n = t.encode_symbol(s)
        assert n == 8
        sym, bits = t.decode_window(pat << 24)
        assert (sym, bits) == (s, 8)


def test_make_canonical_kraft_violation():
    with pytest.raises(th.TableError):
        th.make_canonical({0: 1, 1: 1, 2: 1})


def test_long_codes_two_level_lut():
    """Codes longer than root_bits exercise the second LUT level (5-30 bits,
    BASELINE.json config 3)."""
    lens = {0: 5, 1: 5}
    lens.update({i: 14 for i in range(2, 10)})
    lens.update({i: 30 for i in range(10, 14)})
    # fill remaining Kraft mass with 10-bit codes
    used = 2 * 2**-5 + 8 * 2**-14 + 4 * 2**-30
    import math

    n10 = math.floor((1 - used) / 2**-10)
    lens.update({i + 14: 10 for i in range(min(n10, 242))})
    t = th.make_canonical(lens)
    assert t.max_len == 30
    assert t.l1_bits.size > 1  # second level actually in use
    for spec in t.specs():
        window = spec.pattern << (32 - spec.num_bits)
        assert t.decode_window(window) == (spec.symbol, spec.num_bits)


def test_tsv_roundtrip(static_table, tmp_path):
    p = tmp_path / "t.tsv"
    p.write_text(static_table.to_tsv())
    t2 = HuffmanTable.from_tsv_file(str(p))
    np.testing.assert_array_equal(t2.patterns, static_table.patterns)
    np.testing.assert_array_equal(t2.lengths, static_table.lengths)


def test_npz_artifact_roundtrip(static_table, tmp_path):
    p = tmp_path / "t.npz"
    static_table.save(str(p))
    t2 = HuffmanTable.load(str(p))
    np.testing.assert_array_equal(t2.patterns, static_table.patterns)
    np.testing.assert_array_equal(t2.l0_bits, static_table.l0_bits)
    np.testing.assert_array_equal(t2.l1_bits, static_table.l1_bits)
    assert t2.root_bits == static_table.root_bits


def test_library_init():
    """Parity with reference tests/library_test.c:9-22."""
    th.library_init()
    assert th.library_is_initialized()
    th.library_init()  # idempotent
    assert th.library_is_initialized()
    th.library_clean_up()
    assert not th.library_is_initialized()


def test_max_pattern_bits_32_roundtrip():
    """Codes up to the reference's MAX_PATTERN_BITS=32 (huffman.c:10) must
    round-trip through every host path (encode/decode/streaming)."""
    import numpy as np

    import tpu_huffman as th

    # Kraft-complete assignment with two 32-bit codes: symbol 0 at 1 bit,
    # symbols 1..30 at lengths 2..31, symbols 31,32 at 32 bits.
    lens = {0: 1}
    for i in range(1, 31):
        lens[i] = i + 1
    lens[31] = 32
    lens[32] = 32
    t = th.make_canonical(lens, name="deep32")
    assert int(t.lengths.max()) == 32
    rng = np.random.default_rng(0)
    # skewed toward short codes, with the 32-bit symbols present
    data = bytes(rng.choice(33, p=[2.0 ** -lens[i] for i in range(33)],
                            size=4096).astype(np.uint8))
    enc = th.encode(data, t)
    assert th.decode(enc, t) == data
    enc2, idx = th.encode_with_index(data, t)
    assert enc2 == enc
    assert th.decode_indexed(enc2, idx, t) == data
    from tpu_huffman.oracle import oracle_available, oracle_encode

    if oracle_available():
        assert oracle_encode(data, t) == enc
