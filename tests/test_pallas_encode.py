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
