"""Scale-out example: data-parallel mesh codec + device-speed streaming.

Demonstrates the capabilities the C reference has no analog for
(reference is a single-threaded state machine, source/huffman.c:161-173):

  1. MeshCodec — block-data-parallel encode/decode over a
     jax.sharding.Mesh (here a virtual 8-device CPU mesh, the same
     topology the test suite and the driver's multi-chip dryrun use;
     on a pod the identical code runs over ICI/DCN).
  2. Capacity-bounded streaming decode (the reference's SHORT_BUFFER
     resume protocol, source/huffman.c:257-268) riding the bulk
     self-sync fast path instead of a symbol-at-a-time loop.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     JAX_PLATFORMS=cpu python examples/mesh_pipeline.py
"""

import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

if os.environ.get("JAX_PLATFORMS", "cpu") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

import tpu_huffman as th
from tpu_huffman.shard import MeshCodec, default_mesh


def main() -> None:
    table = th.load_static_test_table()
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, size=200_000, dtype=np.uint8).tobytes()

    # --- 1. mesh-parallel encode/decode ---------------------------------
    codec = MeshCodec(table, default_mesh())  # 1-D mesh, all local devices
    encoded, index = codec.encode(data)
    assert encoded == th.encode(data, table)  # bit-identical to single-chip
    assert codec.decode(encoded, index) == data
    print(f"mesh encode/decode ok: {len(data)} -> {len(encoded)} bytes "
          f"on {codec.mesh.devices.size} devices")

    # --- 2. capacity-bounded streaming decode ----------------------------
    dec = th.HuffmanDecoder(table)
    out, rounds = [], 0
    res = dec.decode_chunk(encoded, capacity=32_768)
    out.append(res.data)
    while not res.done:
        res = dec.decode_chunk(b"", capacity=32_768)
        out.append(res.data)
        rounds += 1
    assert b"".join(out) == data
    print(f"capped streaming decode ok: {rounds + 1} SHORT_BUFFER rounds "
          f"of 32 KiB each")


if __name__ == "__main__":
    main()
