import sys, time
sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])
import numpy as np, jax
import tpu_huffman as th
from tpu_huffman import oracle
from tpu_huffman.ops import selfsync

table = th.load_static_test_table()
rng = np.random.default_rng(2024)
N = 8 * 1024 * 1024
data = rng.integers(0, 256, size=N, dtype=np.uint8).tobytes()
ot = oracle.OracleTable(table)
enc = oracle.OracleEncoder(ot).encode(data)

sw = [None]
for rep in range(4):
    t0 = time.perf_counter()
    out = selfsync.selfsync_decode(enc, table)
    dt = time.perf_counter() - t0
    assert out == data
    sw.append(dt)
    print(f"selfsync rep{rep}: {dt:.2f} s wall", flush=True)

enc3, idx = th.encode_with_index(data, table)
assert enc3 == enc
iw = []
for rep in range(4):
    t0 = time.perf_counter()
    out3 = th.decode_indexed(enc3, idx, table)
    dt = time.perf_counter() - t0
    assert out3 == data
    iw.append(dt)
    print(f"indexed rep{rep}: {dt:.2f} s wall", flush=True)
print(f"ratio (best warm): {min(sw[2:]):.2f}/{min(iw[1:]):.2f} = {min(sw[2:])/min(iw[1:]):.2f}x", flush=True)
