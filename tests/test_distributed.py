"""Multi-process "fake pod" tier (SURVEY.md §4: a tier the reference lacks).

Two CPU processes × 4 virtual devices, coordinated through
jax.distributed.initialize; MeshCodec runs over the global 8-device mesh
and every process must produce reference-identical bytes.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

pid = int(sys.argv[1]); nproc = int(sys.argv[2]); coord = sys.argv[3]
try:  # cross-process CPU collectives need an explicit implementation
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception:
    pass
jax.distributed.initialize(coordinator_address=coord, num_processes=nproc,
                           process_id=pid)
sys.path.insert(0, os.getcwd())  # launched with cwd = repo root
import tpu_huffman as th
from tpu_huffman import distributed as dist

assert jax.process_count() == nproc
assert len(jax.devices()) == 8, jax.devices()

table = th.load_static_test_table()
mesh = dist.global_data_mesh()
codec = th.MeshCodec(table, mesh, block_symbols=256)

rng = np.random.default_rng(77)
full = rng.integers(0, 256, size=20_000, dtype=np.uint8).tobytes()
half = len(full) // nproc
mine = full[pid * half : (pid + 1) * half]

encoded, index = dist.encode_global(codec, mine)
expected = th.encode(full, table)
assert encoded == expected, "multi-process encode != single-process bytes"
assert dist.decode_global(codec, encoded, index) == full
print(f"proc {pid} OK", flush=True)
"""


@pytest.mark.skipif(os.environ.get("TPU_HUFFMAN_TEST_TPU"), reason="CPU-only tier")
def test_two_process_fake_pod(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_PLATFORMS", None)
    here = os.path.dirname(os.path.abspath(__file__))

    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), "2", coord],
            env=env, cwd=os.path.dirname(here),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("multi-process CPU bring-up timed out on this machine")
    for i, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0 and "UNIMPLEMENTED" in out + "":
            pytest.skip("multi-process CPU backend unsupported here")
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"proc {i} OK" in out
