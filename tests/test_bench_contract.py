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

import json

from gather_datawarehouse_sync_spark.queries import REGISTRY


def _payload_line(per_query_value: float) -> str:
    headline = list(REGISTRY)[:50]
    payload = {
        "metric": "suite_seconds",
        "value": round(per_query_value * len(REGISTRY), 4),
        "unit": "sec",
        "queries": {k: round(per_query_value, 2) for k in sorted(headline)},
        "extensions_seconds": round(per_query_value * (len(REGISTRY) - 50), 2),
        "n_queries": len(REGISTRY),
        "sf": 0.1,
        "runs": 3,
    }
    return json.dumps(payload, separators=(",", ":"))


def test_bench_line_fits_consumer_tail_window():
    # worst realistic per-query width: "999.99" (a query would have to
    # run 16+ minutes to exceed it, at which point the bench is lost to
    # the round timeout anyway)
    assert len(_payload_line(999.99)) < 1800


def test_headline_window_is_the_driver_window():
    names = list(REGISTRY)[:50]
    assert names[:44] == [f"q{i}" for i in range(1, 45)]
    # every extension slot in the driver's correctness window must carry
    # a full oracle — rows-only queries would waste a hash-check slot
    assert all(REGISTRY[n].oracle for n in names[44:])
