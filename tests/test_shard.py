"""Mesh data-parallel codec: the "fake pod" tier (SURVEY.md §4).

Runs on the conftest-forced 8-virtual-CPU-device backend. The contract:
MeshCodec output bytes are bit-identical to the single-chip path (and hence
to the reference), on 1-D and 2-D ('dcn','ici') meshes, at every shard
split, including ragged tails and empty shards.
"""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

import tpu_huffman as th
from tpu_huffman.shard import MeshCodec, default_mesh


@pytest.fixture(scope="module")
def table():
    return th.load_static_test_table()


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(42)
    return rng.integers(0, 256, size=50_000, dtype=np.uint8).tobytes()


def test_mesh_encode_bit_identical(table, corpus):
    mc = MeshCodec(table, default_mesh(), block_symbols=512)
    enc, idx = mc.encode(corpus)
    assert enc == th.encode(corpus, table)
    assert mc.decode(enc, idx) == corpus


def test_mesh_2d_dcn_ici(table, corpus):
    """2-D (hosts × chips) mesh: collectives across both axes."""
    devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("dcn", "ici"))
    mc = MeshCodec(table, mesh, block_symbols=512)
    enc, idx = mc.encode(corpus)
    assert enc == th.encode(corpus, table)
    assert mc.decode(enc, idx) == corpus


@pytest.mark.parametrize("n", [1, 7, 255, 4096, 12345])
def test_mesh_ragged_sizes(table, n):
    """Sizes that leave shards partially or fully empty."""
    rng = np.random.default_rng(n)
    data = rng.integers(0, 256, size=n, dtype=np.uint8).tobytes()
    mc = MeshCodec(table, default_mesh(), block_symbols=256)
    enc, idx = mc.encode(data)
    assert enc == th.encode(data, table)
    assert mc.decode(enc, idx) == data


def test_mesh_empty(table):
    mc = MeshCodec(table, default_mesh())
    enc, idx = mc.encode(b"")
    assert enc == b""
    assert mc.decode(enc, idx) == b""


def test_mesh_eos_padding(table):
    data = b"a"  # partial final byte guaranteed (5-10 bit code)
    for pad in (0x00, 0x5A, 0xFF):
        mc = MeshCodec(table, default_mesh(), block_symbols=256, eos_padding=pad)
        enc, _ = mc.encode(data)
        assert enc == th.encode(data, table, eos_padding=pad), hex(pad)


def test_mesh_unknown_symbol(table):
    sparse = th.make_canonical({65: 1, 66: 1}, name="ab")
    mc = MeshCodec(sparse, default_mesh(), block_symbols=256)
    with pytest.raises(th.UnknownSymbolError):
        mc.encode(b"ABC")
