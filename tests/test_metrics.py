"""Thin observability layer (SURVEY.md §5: optional counters, keep it thin)."""

import tpu_huffman as th
from tpu_huffman import metrics


def test_counters_off_by_default():
    metrics.counters.reset()
    t = th.load_static_test_table()
    th.encode(b"no counting", t)
    assert metrics.counters.encode_calls == 0


def test_counters_record_when_enabled():
    metrics.counters.reset()
    metrics.enable(True)
    try:
        t = th.load_static_test_table()
        enc = th.encode(b"count me", t)
        th.decode(enc, t)
        snap = metrics.counters.snapshot()
        assert snap["encode_calls"] == 1
        assert snap["decode_calls"] == 1
        assert snap["bytes_in"] == len(b"count me") + len(enc)
        assert snap["bytes_out"] == len(enc) + len(b"count me")
        assert snap["encode_seconds"] > 0
    finally:
        metrics.enable(False)
        metrics.counters.reset()
