"""Streaming protocol tests: reference tier 3 (SURVEY.md §4).

Ports the partial-I/O property tests (reference tests/huffman_test.c:117-197
encoder partial/exact output; 275-363 decoder partial input/output; 365-385
allow-growth) and the chunked transitive oracle
(reference tests/huffman_test.c:429-446).
"""

import numpy as np
import pytest

import tpu_huffman as th
from tpu_huffman import testing as oracle

from golden import ALL_CODES, ALL_CODES_ENCODED, STEP_SIZES, URL, URL_ENCODED


@pytest.fixture(scope="session")
def table():
    return th.load_static_test_table()


# --- encoder streaming -----------------------------------------------------


@pytest.mark.parametrize("step", STEP_SIZES)
def test_encoder_partial_output(table, step):
    """Grow output budget step bytes at a time; concatenation must equal the
    one-shot golden bytes (reference tests/huffman_test.c:117-165)."""
    enc = th.HuffmanEncoder(table)
    out = bytearray()
    remaining = ALL_CODES
    guard = 0
    while True:
        budget = min(step, len(ALL_CODES_ENCODED) - len(out))
        res = enc.encode_chunk(remaining, budget)
        assert res.data, "encode wrote no data"
        out.extend(res.data)
        remaining = remaining[res.consumed :]
        assert bytes(out) == ALL_CODES_ENCODED[: len(out)]
        if res.done:
            break
        guard += 1
        assert guard < 1000
    assert bytes(out) == ALL_CODES_ENCODED
    assert not remaining


def test_encoder_exact_output(table):
    """Exact-fit buffers complete without SHORT_BUFFER
    (reference tests/huffman_test.c:167-197)."""
    enc = th.HuffmanEncoder(table)
    res = enc.encode_chunk(b"?", 1)
    assert res.done and res.data == bytes([0xBA])
    res = enc.encode_chunk(b"yz", 2)
    assert res.done and res.data == bytes([0xA3, 0x79])


def test_encoder_zero_capacity(table):
    enc = th.HuffmanEncoder(table)
    res = enc.encode_chunk(URL, 0)
    assert res == th.EncodeResult(b"", 0, False)


def test_encoder_carry_state_roundtrip(table):
    """The carry (overflow_bits) is serializable mid-stream."""
    enc = th.HuffmanEncoder(table)
    res = enc.encode_chunk(ALL_CODES, 10)
    assert not res.done
    state = enc.state()

    enc2 = th.HuffmanEncoder(table)
    enc2.load_state(state)
    res2 = enc2.encode_chunk(ALL_CODES[res.consumed :], None)
    assert res.data + res2.data == ALL_CODES_ENCODED


def test_encoder_input_chunking_pads_each_chunk(table):
    """Chunking *input* across successful calls inserts padding per chunk,
    exactly like the reference (SURVEY.md §3.2 key semantic)."""
    enc = th.HuffmanEncoder(table)
    a = enc.encode(b"w")
    b = enc.encode(b"w")
    assert a == b == th.encode(b"w", table)  # each padded independently


def test_encoder_unknown_symbol_mid_stream():
    t = th.make_canonical({65: 1, 66: 2, 67: 3, 68: 3})
    enc = th.HuffmanEncoder(t)
    with pytest.raises(th.UnknownSymbolError):
        enc.encode_chunk(b"AAZA", None)


# --- decoder streaming -----------------------------------------------------


@pytest.mark.parametrize("step", STEP_SIZES)
def test_decoder_partial_input(table, step):
    """Feed encoded bytes in chunks (reference tests/huffman_test.c:275-314)."""
    dec = th.HuffmanDecoder(table)
    out = bytearray()
    for i in range(0, len(ALL_CODES_ENCODED), step):
        res = dec.decode_chunk(ALL_CODES_ENCODED[i : i + step], None)
        out.extend(res.data)
        assert bytes(out) == ALL_CODES[: len(out)]
    assert bytes(out) == ALL_CODES


@pytest.mark.parametrize("step", STEP_SIZES)
def test_decoder_partial_output(table, step):
    """Limit output budget per call (reference tests/huffman_test.c:316-363)."""
    dec = th.HuffmanDecoder(table)
    out = bytearray()
    feed: bytes = ALL_CODES_ENCODED
    guard = 0
    while True:
        budget = min(step, len(ALL_CODES) - len(out))
        res = dec.decode_chunk(feed, budget)
        feed = b""
        assert res.data, "decode wrote no data"
        out.extend(res.data)
        assert bytes(out) == ALL_CODES[: len(out)]
        if res.done:
            break
        guard += 1
        assert guard < 1000
    assert bytes(out) == ALL_CODES


def test_decoder_allow_growth(table):
    """reference tests/huffman_test.c:365-385."""
    dec = th.HuffmanDecoder(table, allow_growth=True)
    assert dec.decode(URL_ENCODED, capacity=1) == URL


def test_decoder_short_buffer_raises(table):
    dec = th.HuffmanDecoder(table)
    with pytest.raises(th.ShortBufferError):
        dec.decode(URL_ENCODED, capacity=1)


def test_decoder_state_roundtrip(table):
    dec = th.HuffmanDecoder(table)
    res = dec.decode_chunk(ALL_CODES_ENCODED, 10)
    assert not res.done
    state = dec.state()

    dec2 = th.HuffmanDecoder(table)
    dec2.load_state(state)
    rest = dec2.decode_chunk(b"", None)
    assert res.data + rest.data == ALL_CODES


def test_decoder_reset(table):
    dec = th.HuffmanDecoder(table)
    dec.decode_chunk(ALL_CODES_ENCODED[:5], None)
    dec.reset()
    assert dec.decode_chunk(URL_ENCODED, None).data == URL


def test_decoder_leftover_padding_bits(table):
    """Trailing padding is exposed for inspection (HPACK all-1s check,
    reference README.md:176-183)."""
    dec = th.HuffmanDecoder(table)
    res = dec.decode_chunk(th.encode(b"w", table), None)
    assert res.done and res.data == b"w"
    value, nbits = dec.leftover_bits
    assert nbits == 2 and value == 0b11  # 0xFF padding -> all ones


# --- oracles (tier 4 chunked) ----------------------------------------------


@pytest.mark.parametrize("step", STEP_SIZES)
def test_transitive_chunked(table, step):
    oracle.transitive_chunked(table, ALL_CODES, len(ALL_CODES_ENCODED), step)


def test_transitive_oracle(table):
    oracle.transitive(table, URL, len(URL_ENCODED))
    oracle.transitive(table, b"cdfh", 3)


@pytest.mark.parametrize("step", (1, 3, 7, 64))
def test_transitive_chunked_input(table, step):
    oracle.transitive_chunked_input(table, ALL_CODES, step)


def test_chunked_random_data(table):
    rng = np.random.default_rng(5)
    data = rng.integers(0, 256, size=3000, dtype=np.uint8).tobytes()
    oracle.transitive_chunked(table, data, None, 17)
