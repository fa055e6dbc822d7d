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
