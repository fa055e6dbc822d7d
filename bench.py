"""Benchmark harness: encode+decode GB/s on the static-table corpus.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "GB/s", "vs_baseline": N}

value        = combined codec throughput on the accelerator: bytes of
               plaintext processed / (encode time + indexed-decode time),
               device-resident steady state (median of repeats, after warmup).
vs_baseline  = ratio vs the C++ host oracle (cpp/, reference-semantics codec,
               single CPU core) on the same corpus — the comparator mandated
               by BASELINE.md (the reference publishes no numbers of its own).

Run `python bench.py --help` for knobs; defaults are driver-friendly.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def _bench_tpu(data: bytes, table, block_symbols: int, repeats: int):
    import jax
    import jax.numpy as jnp

    from tpu_huffman.ops.bitpack import words_from_bytes_np
    from tpu_huffman.ops.decode import decode_blocks_kernel
    from tpu_huffman.ops.encode import DeviceTable, encode_block_kernel_indexed
    import tpu_huffman as th

    n = len(data)
    symbols = jnp.asarray(np.frombuffer(data, dtype=np.uint8))
    dt = DeviceTable.for_table(table)

    # ---- encode: fused gather + prefix-scan + scatter pack ----
    def run_encode():
        out = encode_block_kernel_indexed(
            symbols, jnp.int32(n), dt.patterns, dt.lengths,
            jnp.uint32(0xFF), jnp.int32(0),
            num_out_words=n + 2, block_symbols=block_symbols,
        )
        jax.block_until_ready(out)
        return out

    out = run_encode()  # warmup/compile
    t_enc = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        run_encode()
        t_enc.append(time.perf_counter() - t0)

    # Build the index once (host) for the decode phase.
    encoded, index = th.encode_with_index(data, table, block_symbols=block_symbols)
    words_np, _ = words_from_bytes_np(encoded)
    words = jnp.concatenate([jnp.asarray(words_np), jnp.zeros(2, dtype=jnp.uint32)])
    offsets = jnp.asarray(index.bit_offsets, dtype=jnp.int32)
    counts = jnp.asarray(index.n_symbols, dtype=jnp.int32)

    def run_decode():
        out = decode_blocks_kernel(
            words, offsets, counts,
            dt.l0_bits, dt.l0_val, dt.l1_bits, dt.l1_val,
            root_bits=table.root_bits, steps=block_symbols,
        )
        jax.block_until_ready(out)
        return out

    syms, _ = run_decode()  # warmup/compile
    # correctness guard: decoded symbols must round-trip
    flat = np.asarray(syms).reshape(-1)[: index.total_symbols]
    assert flat.tobytes() == data, "bench round-trip mismatch"

    t_dec = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        run_decode()
        t_dec.append(time.perf_counter() - t0)

    enc_s = float(np.median(t_enc))
    dec_s = float(np.median(t_dec))
    return enc_s, dec_s


def _bench_oracle(data: bytes, table, repeats: int):
    """C++ reference-semantics codec on CPU (the baseline)."""
    from tpu_huffman import oracle

    ot = oracle.OracleTable(table)
    enc = oracle.OracleEncoder(ot)
    t_enc = []
    encoded = None
    for _ in range(repeats):
        enc.reset()
        t0 = time.perf_counter()
        encoded = enc.encode(data)
        t_enc.append(time.perf_counter() - t0)
    dec = oracle.OracleDecoder(ot)
    t_dec = []
    for _ in range(repeats):
        dec.reset()
        t0 = time.perf_counter()
        out = dec.decode(encoded)
        t_dec.append(time.perf_counter() - t0)
    assert out == data
    return float(np.median(t_enc)), float(np.median(t_dec))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=float, default=16.0, help="corpus size in MiB")
    ap.add_argument("--oracle-mb", type=float, default=4.0,
                    help="corpus size for the CPU oracle (scaled up)")
    ap.add_argument("--block-symbols", type=int, default=1024)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()

    import tpu_huffman as th

    table = th.load_static_test_table()
    rng = np.random.default_rng(2024)
    n = int(args.mb * (1 << 20))
    data = rng.integers(0, 256, size=n, dtype=np.uint8).tobytes()

    enc_s, dec_s = _bench_tpu(data, table, args.block_symbols, args.repeats)
    gbps = (2 * n) / (enc_s + dec_s) / 1e9 / 2  # bytes through each phase once

    # CPU oracle baseline on a smaller corpus (it's ~2 orders slower).
    n_or = int(args.oracle_mb * (1 << 20))
    data_or = data[:n_or]
    oenc_s, odec_s = _bench_oracle(data_or, table, max(2, args.repeats // 2))
    oracle_gbps = (2 * n_or) / (oenc_s + odec_s) / 1e9 / 2

    if args.verbose:
        print(
            f"# tpu encode {n/enc_s/1e9:.3f} GB/s decode {n/dec_s/1e9:.3f} GB/s | "
            f"oracle encode {n_or/oenc_s/1e9:.3f} GB/s decode {n_or/odec_s/1e9:.3f} GB/s",
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
