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


@pytest.mark.skipif(
    len(jax.devices()) < 8,
    reason="needs the 8-device fake pod (CPU tier); the real rig has 1 chip",
)
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


@pytest.mark.skipif(
    len(jax.devices()) < 8,
    reason="needs the 8-device fake pod (CPU tier); the real rig has 1 chip",
)
def test_global_offsets_past_2_31_bits(table):
    """The cross-shard offset math must not wrap at 2^31 bits.

    VERDICT r2 weak #6: the mesh-layer int32 cumsum wrapped silently past
    ~256 MiB encoded. The fix computes the exclusive prefix in split
    (hi, lo) int32 halves (shard._global_phase_base). Mock per-shard bit
    totals summing past 2^31 (no giant buffer needed) and check
    (phase, word_base) against int64 host arithmetic.
    """
    import functools

    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from tpu_huffman.shard import _global_phase_base

    mesh = default_mesh()
    ndev = 8
    rng = np.random.default_rng(7)
    # ~400 Mbit per shard with odd low bits: cumsum crosses 2^31 at shard 5.
    totals = (rng.integers(380_000_000, 430_000_000, size=ndev)).astype(
        np.int64
    ) | 1

    def body(lb):
        ph, wb = _global_phase_base(lb[0], axes=("data",))
        return jnp.stack([ph, wb])[None]

    fn = jax.jit(
        jax.shard_map(
            body, mesh=mesh, in_specs=(P("data"),), out_specs=P("data"),
            check_vma=False,
        )
    )
    out = np.asarray(fn(jnp.asarray(totals, dtype=jnp.int32))).reshape(ndev, 2)
    offs64 = np.cumsum(totals) - totals  # exclusive prefix, int64
    assert offs64[-1] > (1 << 31)  # the regression actually exercises wrap
    np.testing.assert_array_equal(out[:, 0], offs64 & 31)
    np.testing.assert_array_equal(out[:, 1], offs64 >> 5)


def test_block_index_offsets_are_int64(table, corpus):
    """Absolute block offsets are int64 end-to-end (single-chip and mesh)."""
    _, idx1 = th.encode_with_index(corpus, table, block_symbols=512)
    assert idx1.bit_offsets.dtype == np.int64
    mc = MeshCodec(table, default_mesh(), block_symbols=512)
    _, idx2 = mc.encode(corpus)
    assert idx2.bit_offsets.dtype == np.int64
    np.testing.assert_array_equal(idx1.bit_offsets, idx2.bit_offsets)


@pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="dual-chain mesh decode is the compiled-TPU path (interpret-mode "
    "fake pods run the scan body); run with TPU_HUFFMAN_TEST_TPU=1",
)
def test_mesh_dual_chain_decode_tpu(table):
    """Round 4 (VERDICT r3 #7): the mesh decode stripes index-block PAIRS
    and drives the dual-chain kernel. Bit-exact on the real-chip mesh,
    including odd block counts (tail half-chain) and partial tails."""
    mc = MeshCodec(table, default_mesh())
    rng = np.random.default_rng(77)
    for n in (300_000, 1_048_577):
        data = rng.integers(0, 256, size=n, dtype=np.uint8).tobytes()
        enc, idx = mc.encode(data)
        assert enc == th.encode(data, table)
        assert mc.decode(enc, idx) == data
