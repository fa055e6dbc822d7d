"""Benchmark harness: encode+decode GB/s on the static-table corpus.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "GB/s", "vs_baseline": N}

value        = combined codec throughput on the accelerator: plaintext bytes
               per second through (encode kernel + indexed Pallas decode),
               device-resident steady state.
vs_baseline  = ratio vs the C++ host oracle (cpp/, reference-semantics codec,
               single CPU core) on the same corpus — the comparator mandated
               by BASELINE.md (the reference publishes no numbers of its own).

Measurement protocol (shaped by this rig's axon tunnel, see MEASURING.md):
  1. ALL device timing happens before ANY device->host transfer — a D2H
     transfer permanently degrades subsequent dispatch latency in-process.
  2. Dispatch latency is contended and bursty; we take the MIN over many
     reps (the uncontended hardware time), not the median.
  3. Correctness (bit-exact round-trip vs the C++ oracle) is asserted
     AFTER the clocks stop.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def _min_time(fn, reps):
    import jax

    out = fn()
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return out, best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=float, default=8.0, help="corpus size in MiB")
    ap.add_argument("--oracle-mb", type=float, default=4.0)
    ap.add_argument("--block-symbols", type=int, default=128)
    ap.add_argument("--repeats", type=int, default=30)
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import tpu_huffman as th
    from tpu_huffman.ops.bitpack import words_from_bytes_np
    from tpu_huffman.ops.encode import DeviceTable, encode_block_kernel_indexed
    from tpu_huffman.ops.pallas_decode import (
        LANES,
        _decode_pipeline,
        _use_interpret,
        structure_for,
        supports,
    )

    table = th.load_static_test_table()
    K = args.block_symbols
    assert supports(table, K)
    struct = structure_for(table)
    p32_flat = tuple(x for row in struct.p32 for x in row)

    rng = np.random.default_rng(2024)
    n = int(args.mb * (1 << 20))
    data_np = rng.integers(0, 256, size=n, dtype=np.uint8)
    data = data_np.tobytes()

    dt = DeviceTable.for_table(table)
    symbols = jnp.asarray(data_np)

    # ---------------- phase 1: time everything, transfer nothing ----------
    def run_encode():
        return encode_block_kernel_indexed(
            symbols, jnp.int32(n), dt.patterns, dt.lengths,
            jnp.uint32(0xFF), jnp.int32(0),
            num_out_words=n + 2, block_symbols=K,
        )

    enc_out, enc_s = _min_time(run_encode, args.repeats)

    # Host-side stream/index prep for decode timing uses the HOST cumsum
    # (no transfer of device results before the clocks stop).
    lens64 = table.lengths[data_np].astype(np.int64)
    ends = np.cumsum(lens64)
    total_bits = int(ends[-1])
    n_blocks = -(-n // K)
    starts_idx = np.arange(n_blocks) * K
    offsets = np.zeros(n_blocks, dtype=np.int64)
    offsets[1:] = ends[starts_idx[1:] - 1]
    n_sym = np.full(n_blocks, K, dtype=np.int32)
    n_sym[-1] = n - (n_blocks - 1) * K

    # Reconstruct the encoded words on host via the C++ oracle (bit-exact)
    # so decode timing is independent of the encode output transfer.
    from tpu_huffman import oracle

    ot = oracle.OracleTable(table)
    encoded = oracle.OracleEncoder(ot).encode(data)
    words_np, _ = words_from_bytes_np(encoded)
    words_np = np.concatenate([words_np, np.zeros(2, np.uint32)])

    B = n_blocks
    G = -(-B // LANES)
    Bp = G * LANES
    Wb = (K * table.max_len + 31) // 32 + 2
    base = np.zeros(Bp, np.int32)
    rel = np.zeros(Bp, np.int32)
    nsym_arr = np.zeros(Bp, np.int32)
    base[:B] = offsets >> 5
    rel[:B] = offsets & 31
    nsym_arr[:B] = n_sym
    jw, jb, jr, jn = map(jnp.asarray, (words_np, base, rel, nsym_arr))
    interp = _use_interpret()

    def run_decode():
        return _decode_pipeline(
            jw, jb, jr, jn, K, Wb, G, struct.intervals, p32_flat, interp
        )

    dec_out, dec_s = _min_time(run_decode, args.repeats)

    # ---------------- phase 2: clocks stopped; verify + baseline ----------
    out_words, d_total, d_padded, _bad, _bi, _off = enc_out
    from tpu_huffman.ops.bitpack import bytes_from_words_np

    nbytes = int(d_padded) // 8
    enc_bytes = bytes_from_words_np(np.asarray(out_words), nbytes)
    assert enc_bytes == encoded, "device encode != C++ oracle bytes"

    flat = (
        np.ascontiguousarray(np.asarray(dec_out[0])).view(np.uint8).reshape(Bp, K)[:B]
    )
    assert flat.reshape(-1)[:n].tobytes() == data, "device decode mismatch"

    # CPU oracle baseline.
    n_or = int(args.oracle_mb * (1 << 20))
    data_or = data[:n_or]
    enc_o = oracle.OracleEncoder(ot)
    t0 = time.perf_counter()
    enc_bytes_o = enc_o.encode(data_or)
    o_enc = time.perf_counter() - t0
    dec_o = oracle.OracleDecoder(ot)
    t0 = time.perf_counter()
    out_o = dec_o.decode(enc_bytes_o)
    o_dec = time.perf_counter() - t0
    assert out_o == data_or

    gbps = 2 * n / (enc_s + dec_s) / 1e9 / 2
    oracle_gbps = 2 * n_or / (o_enc + o_dec) / 1e9 / 2
    if args.verbose:
        print(
            f"# tpu encode {n/enc_s/1e9:.3f} GB/s, decode {n/dec_s/1e9:.3f} GB/s | "
            f"oracle encode {n_or/o_enc/1e9:.3f}, decode {n_or/o_dec/1e9:.3f} GB/s",
            file=sys.stderr,
        )
    print(json.dumps({
        "metric": "codec_throughput_static_table",
        "value": round(gbps, 4),
        "unit": "GB/s",
        "vs_baseline": round(gbps / oracle_gbps, 3),
    }))


if __name__ == "__main__":
    main()
