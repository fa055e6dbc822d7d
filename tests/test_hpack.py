"""HPACK-consumer tier: trailing-padding inspection (reference README.md:176-183).

The reference documents that decoders must be able to inspect leftover
padding bits (HPACK requires the EOS-prefix / all-ones check, RFC 7541
§5.2). This is the downstream-consumer (aws-c-http) usage pattern."""

import pytest

import tpu_huffman as th


@pytest.fixture(scope="module")
def table():
    return th.load_static_test_table()


def test_default_padding_is_valid_hpack(table):
    for payload in (b"www.example.com", b"GET", b"a"):
        enc = th.encode(payload, table)  # eos_padding=0xFF
        dec = th.HuffmanDecoder(table)
        assert dec.decode_chunk(enc).data == payload
        assert dec.padding_is_all_ones()


def test_zero_padding_detected(table):
    # Find a payload whose encoding has a nonzero tail, pad with zeros.
    for payload in (b"a", b"x", b"ab", b"abc"):
        bits = int(table.lengths[list(payload)].sum())
        if bits % 8:
            enc = th.encode(payload, table, eos_padding=0x00)
            dec = th.HuffmanDecoder(table)
            assert dec.decode_chunk(enc).data == payload
            assert not dec.padding_is_all_ones()
            return
    pytest.fail("no test payload with partial final byte")


def test_even_byte_stream_has_valid_padding(table):
    # "cdfh" -> exactly 3 bytes, no padding at all (huffman_test.c:401-412).
    enc = th.encode(b"cdfh", table)
    dec = th.HuffmanDecoder(table)
    assert dec.decode_chunk(enc).data == b"cdfh"
    assert dec.padding_is_all_ones()  # vacuously: zero tail bits


def test_example_script_runs():
    import subprocess, sys, os
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, os.path.join(root, "examples", "hpack_headers.py")],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr
    assert "rejected" in proc.stdout


# ---------------------------------------------------------------------------
# The real RFC 7541 Appendix B table (the code aws-c-http ships as generated
# C) as a data artifact, validated against every Huffman-coded string
# example in RFC 7541 Appendix C.

RFC7541_GOLDENS = [
    (b"www.example.com", "f1e3c2e5f23a6ba0ab90f4ff"),          # C.4.1
    (b"no-cache", "a8eb10649cbf"),                               # C.4.2
    (b"custom-key", "25a849e95ba97d7f"),                         # C.4.3
    (b"custom-value", "25a849e95bb8e8b4bf"),                     # C.4.3
    (b"302", "6402"),                                            # C.6.1
    (b"private", "aec3771a4b"),                                  # C.6.1
    (b"Mon, 21 Oct 2013 20:13:21 GMT",
     "d07abe941054d444a8200595040b8166e082a62d1bff"),            # C.6.1
    (b"https://www.example.com", "9d29ad171863c78f0b97c8e9ae82ae43d3"),
    (b"307", "640eff"),                                          # C.6.2
    (b"Mon, 21 Oct 2013 20:13:22 GMT",
     "d07abe941054d444a8200595040b8166e084a62d1bff"),            # C.6.3
    (b"gzip", "9bd9ab"),                                         # C.6.3
    (b"foo=ASDJKHQKBZXOQWEOPIUAXQWEOIU; max-age=3600; version=1",
     "94e7821dd7f2e6c7b335dfdfcd5b3960d5af27087f3672c1ab270fb5291f9587"
     "316065c003ed4ee5b1063d5007"),                              # C.6.3
]


@pytest.fixture(scope="module")
def hpack():
    return th.load_hpack_table()


def test_rfc7541_golden_vectors(hpack):
    for payload, hexpect in RFC7541_GOLDENS:
        assert th.encode(payload, hpack).hex() == hexpect, payload


def test_rfc7541_roundtrip_and_padding(hpack):
    import numpy as np

    rng = np.random.default_rng(42)
    data = rng.integers(0, 256, size=8192, dtype=np.uint8).tobytes()
    enc = th.encode(data, hpack)
    dec = th.HuffmanDecoder(hpack)
    assert dec.decode_chunk(enc).data == data
    assert dec.padding_is_all_ones()  # RFC 7541 §5.2 EOS-prefix padding


def test_rfc7541_indexed_roundtrip(hpack):
    import numpy as np

    rng = np.random.default_rng(43)
    data = rng.integers(0, 256, size=200_000, dtype=np.uint8).tobytes()
    enc, idx = th.encode_with_index(data, hpack)
    assert th.decode_indexed(enc, idx, hpack) == data


def test_rfc7541_matches_cpp_oracle(hpack):
    from tpu_huffman.oracle import oracle_available, oracle_encode

    if not oracle_available():
        pytest.skip("C++ oracle not built")
    import numpy as np

    rng = np.random.default_rng(44)
    data = rng.integers(0, 256, size=65536, dtype=np.uint8).tobytes()
    assert oracle_encode(data, hpack) == th.encode(data, hpack)
