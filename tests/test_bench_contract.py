"""Bench output contract.

The bench consumer keeps only the last ~2000 chars of stdout and parses
the one JSON line out of that tail; a line ≥ 1800 chars is silently
truncated and the whole round's bench recording is lost (it happened in
rounds 2-3).  ``bench.py`` already degrades to an aggregate-only line at
the limit, but the per-query detail is the valuable part — this test
fails the build the moment the 50-query headline window plus the
registry metadata can no longer fit, so the registry change that breaks
it is caught at commit time, not at grading time.
"""

from __future__ import annotations

import importlib.util
import json
import os

from gather_datawarehouse_sync_spark.queries import REGISTRY

_spec = importlib.util.spec_from_file_location(
    "bench",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py"),
)
_bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_bench)


def _payload_line(per_query_value: float) -> str:
    # the REAL payload builder from bench.py — a hand-maintained copy
    # would silently stop guarding when the payload grows a field.
    # box = worst realistic widths (three-digit loads, full-width pcts)
    payload = _bench.build_payload(
        {k: per_query_value for k in REGISTRY},
        sf=0.1,
        runs=3,
        box={
            "load1_pre": 999.99,
            "load1_settled": 999.99,
            "settle_wait_s": 90.0,
            "iowait_pct": 99.99,
            "contended": False,
        },
        # worst case for the weather tripwire: the 5 longest names in
        # the registry all flagged noisy (the builder caps at 5)
        noisy=sorted(REGISTRY, key=len, reverse=True)[:8],
    )
    return json.dumps(payload, separators=(",", ":"))


def test_bench_line_fits_consumer_tail_window():
    # worst realistic per-query width: "999.99" (a query would have to
    # run 16+ minutes to exceed it, at which point the bench is lost to
    # the round timeout anyway).  Require >=15% headroom below the
    # 1800-char consumer tail, not just a squeak under it: the headline
    # window is fixed at 50 queries so the line grows only with key
    # length (rotations swap in longer names) — headroom means a future
    # rotation can't silently push the line past the tail.
    assert len(_payload_line(999.99)) < 1800 * 0.85


def test_headline_window_is_the_driver_window():
    names = list(REGISTRY)[:50]
    assert names[:44] == [f"q{i}" for i in range(1, 45)]
    # every extension slot in the driver's correctness window must carry
    # a full oracle — rows-only queries would waste a hash-check slot
    assert all(REGISTRY[n].oracle for n in names[44:])
