"""Multi-host bring-up and global-array plumbing for MeshCodec.

The reference has no distribution layer at all (single process, SURVEY.md
§2.2); this module is the framework's NCCL-equivalent seam, built on JAX's
native runtime: `jax.distributed.initialize` for process bring-up, a global
device mesh spanning all hosts (ICI inside a slice, DCN across), and
process-local ↔ global array conversion so each host feeds only its shard
of the byte stream.

Usage on an N-host pod slice (same program on every host):

    import tpu_huffman as th
    from tpu_huffman import distributed as dist

    dist.initialize()                      # env-driven on Cloud TPU
    mesh = dist.global_data_mesh()         # 1-D mesh over all chips
    codec = th.MeshCodec(table, mesh)

    encoded, index = dist.encode_global(codec, my_host_bytes)
    # encoded/index are replicated to every host (small relative to input
    # when used for storage; for pure compression pipelines keep outputs
    # device-resident instead).

Testing without a cluster: tests/test_distributed.py launches two CPU
processes with 4 virtual devices each (the "fake pod" tier from
SURVEY.md §4 that the reference lacks).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None,
               local_device_ids=None) -> None:
    """Bring up the JAX distributed runtime (idempotent).

    With no arguments, relies on the environment (Cloud TPU metadata or
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID).
    """
    if jax.process_count() > 1 or getattr(initialize, "_done", False):
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kwargs)
    initialize._done = True


def global_data_mesh(axis: str = "data") -> Mesh:
    """1-D mesh over every device of every process."""
    return Mesh(np.asarray(jax.devices()), (axis,))


def dcn_ici_mesh() -> Mesh:
    """2-D (hosts × local-chips) mesh: collectives ride DCN on axis 0 and
    ICI on axis 1 — the layout SURVEY.md §2.2 prescribes."""
    n_proc = jax.process_count()
    per = jax.local_device_count()
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    return Mesh(np.asarray(devs).reshape(n_proc, per), ("dcn", "ici"))


def encode_global(codec, local_data: bytes):
    """Data-parallel encode where each process contributes its own bytes.

    All processes must call this collectively. The raw input is NEVER
    gathered: each host feeds only its local shard via
    ``jax.make_array_from_process_local_data``; the only cross-host
    traffic is the per-shard bit totals (tiny), the compressed output
    words, and the O(blocks) offset index (see MeshCodec.encode_sharded).
    Shard lengths may differ across hosts. Returns (encoded_bytes,
    BlockIndex) replicated on every process; the bytes are bit-identical
    to the single-stream encoding of the hosts' data concatenated in
    process order.
    """
    return codec.encode_sharded(local_data)


def decode_global(codec, encoded: bytes, index):
    """Collective decode; every process returns the full plaintext."""
    return codec.decode(encoded, index)
