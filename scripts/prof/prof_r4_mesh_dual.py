import sys, time
from functools import partial
sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])
import numpy as np, jax, jax.numpy as jnp
import tpu_huffman as th
from tpu_huffman.shard import MeshCodec, default_mesh
from tpu_huffman.ops import pallas_decode as pd
from tpu_huffman import oracle
from tpu_huffman.ops.bitpack import words_from_bytes_np

WINDOW = float(sys.argv[1]) if len(sys.argv) > 1 else 90.0
table = th.load_static_test_table()
rng = np.random.default_rng(2024)
N = 8 * 1024 * 1024
data_np = rng.integers(0, 256, size=N, dtype=np.uint8)
data = data_np.tobytes()
encoded = oracle.OracleEncoder(oracle.OracleTable(table)).encode(data)
words_np, _ = words_from_bytes_np(encoded)
words_np = np.concatenate([words_np, np.zeros(2, np.uint32)])

# non-mesh dual (bench path)
Kh = 256
lens64 = table.lengths[data_np].astype(np.int64)
ends = np.cumsum(lens64)
nb_ = -(-N // Kh)
offsets = np.zeros(nb_, np.int64); offsets[1:] = ends[np.arange(1, nb_) * Kh - 1]
n_sym = np.full(nb_, Kh, np.int32); n_sym[-1] = N - (nb_ - 1) * Kh
struct = pd.structure_for(table)
p32_flat = tuple(x for row in struct.p32 for x in row)
base, rel, relm, nsm, nbp, Wb, Wbh, G = pd.pair_dual_inputs(offsets, n_sym, int(ends[-1]), table, Kh)
jw, jb, jr, jm, jn = map(jnp.asarray, (words_np, base, rel, relm, nsm))

def body_direct(i, carry):
    w = jw ^ carry
    out, end, bad = pd._decode_pipeline_dual(w, jb, jr, jm, jn, Kh, Wb, Wbh, G,
                                             struct.intervals, p32_flat, False)
    return carry ^ out.sum(dtype=jnp.uint32) ^ end.sum(dtype=jnp.int32).astype(jnp.uint32) ^ bad.astype(jnp.uint32)

# mesh path (1-device mesh): use the internal sharded fn on prebuilt inputs
from tpu_huffman.ops.decode import BlockIndex
idx = BlockIndex(Kh, offsets, n_sym, N, int(ends[-1]))
mc = MeshCodec(table, default_mesh(), block_symbols=Kh)
# build the shard inputs once (host), then loop-time the device program
ndev = 1
baseg, relg, relmg, nsymg, nb2, Wb2, Wbh2, _ = pd.pair_dual_inputs(offsets, n_sym, int(ends[-1]), table, Kh)
lpd = nb2; G2 = max(1, -(-lpd // pd.LANES)); Bp = G2 * pd.LANES
NR = pd._rows_for(Wb2)
wmax = int(baseg[nb2-1]) + NR * pd.STAGE_RW + pd.STAGE_RW
win = np.zeros((1, wmax), np.uint32); win[0, :min(wmax, words_np.size)] = words_np[:wmax]
b2 = np.zeros((1, Bp), np.int32); r2 = np.zeros((1, Bp), np.int32)
m2 = np.zeros((1, Bp), np.int32); s2 = np.zeros((1, Bp), np.int32)
b2[0, :nb2] = baseg[:nb2]; r2[0, :nb2] = relg[:nb2]; m2[0, :nb2] = relmg[:nb2]; s2[0, :nb2] = nsymg[:nb2]
fn = mc._pallas_decode_sharded(Kh, Wb2, Wbh2, G2)
jwin, jb2, jr2, jm2, js2 = map(lambda x: jnp.asarray(x).reshape(-1), (win, b2, r2, m2, s2))

def body_mesh(i, carry):
    w = jwin ^ carry
    out, bad = fn(w, jb2, jr2, jm2, js2)
    return carry ^ out.sum(dtype=jnp.uint32) ^ bad.sum(dtype=jnp.int32).astype(jnp.uint32)

runs = []
for nm, body in (("direct", body_direct), ("mesh", body_mesh)):
    @partial(jax.jit, static_argnames=("k",))
    def run(seed, k, body=body):
        return jax.lax.fori_loop(0, k, body, seed)
    runs.append((nm, run))
K_LO, K_HI = 9, 49
for nm, run in runs:
    for k in (K_LO, K_HI):
        t0=time.perf_counter(); int(run(jnp.uint32(1), k)); print(f"warm {nm}@{k}: {time.perf_counter()-t0:.1f}s", flush=True)
tl = [float("inf")]*2; thv=[float("inf")]*2
t_end = time.perf_counter() + WINDOW
while time.perf_counter() < t_end:
    for i, (nm, run) in enumerate(runs):
        t0=time.perf_counter(); int(run(jnp.uint32(1), K_HI)); h=time.perf_counter()-t0
        t0=time.perf_counter(); int(run(jnp.uint32(1), K_LO)); l=time.perf_counter()-t0
        thv[i]=min(thv[i],h); tl[i]=min(tl[i],l)
for (nm,_), h, l in zip(runs, thv, tl):
    us=(h-l)/(K_HI-K_LO)*1e6
    print(f"{nm}: {us:.0f} us ({N/(us/1e6)/1e9:.2f} GB/s)", flush=True)
