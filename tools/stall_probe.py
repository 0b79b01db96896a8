"""Intra-run stall attribution probe (r16 verdict item 6).

The round-16 same-code closing runs showed single passes inside slow
runs hitting 10×+ their own median (x_simhash_neighbors 29.4 s max vs
2.8 s min WITHIN one run).  This probe re-runs the N heaviest registry
queries (by BENCH_DETAIL.json median) for several suite-major passes
and, around every pass, samples the three candidate culprits:

- JVM GC time (sum of CollectionTime over all GarbageCollectorMXBeans,
  via py4j — a stall spent in GC shows up as a large per-pass delta);
- live Python worker PIDs (``/proc`` cmdline scan for pyspark
  daemon/worker processes — a stall spent re-spawning workers shows up
  as PID-set churn between samples, i.e. ``spawned`` > 0 on a pass that
  should reuse warm workers);
- 1-min loadavg (external contention).

It also records the session's effective ``spark.python.worker.reuse``
so the "does reuse hold under the bench session?" question is answered
from the report itself.

Output: one JSON report (default /tmp/stall_probe.json) with per-query
per-pass rows ``{wall_s, gc_delta_ms, spawned, exited, load1}`` plus a
``stalls`` summary listing every pass whose wall exceeded 3× the
query's own min alongside its sampled deltas — the correlation the
verdict asked for, readable without re-deriving anything.

Usage:  python tools/stall_probe.py [n_queries] [passes] [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _worker_pids() -> set[int]:
    """Live pyspark daemon/worker PIDs via /proc cmdline scan."""
    pids: set[int] = set()
    for entry in os.listdir("/proc"):
        if not entry.isdigit():
            continue
        try:
            with open(f"/proc/{entry}/cmdline", "rb") as fh:
                cmd = fh.read().decode("utf-8", "replace")
        except OSError:
            continue
        if "pyspark.daemon" in cmd or "pyspark.worker" in cmd:
            pids.add(int(entry))
    return pids


def _gc_ms(spark) -> int:
    """Total JVM GC time in ms across all collectors (cumulative)."""
    beans = (
        spark._jvm.java.lang.management.ManagementFactory
        .getGarbageCollectorMXBeans()
    )
    return sum(
        beans.get(i).getCollectionTime() for i in range(beans.size())
    )


def main() -> int:
    n_queries = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    out_path = sys.argv[3] if len(sys.argv) > 3 else "/tmp/stall_probe.json"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    with open(os.path.join(REPO, "BENCH_DETAIL.json")) as fh:
        detail = json.load(fh)
    heavies = [
        name
        for name, _ in sorted(
            detail["queries"].items(), key=lambda kv: -kv[1]
        )[:n_queries]
    ]

    from gather_datawarehouse_sync_spark.queries import REGISTRY
    from gather_datawarehouse_sync_spark.session import get_spark

    spark = get_spark("stall_probe")
    reuse = spark.conf.get("spark.python.worker.reuse", "true")
    REGISTRY["q1"].spark(spark, sf_dir).count()  # warm-up, untimed
    warm_workers = os.environ.get("STALL_PROBE_WARM_WORKERS") == "1"
    if warm_workers:
        # pre-spawn the full Python worker fleet (one per core) and pay
        # each worker's pandas/numpy import OUTSIDE the timed region —
        # the A/B for the "pass-0 stalls are cold-worker spawn" theory
        import pandas as pd  # noqa: F401
        from pyspark.sql import functions as F

        @F.pandas_udf("double")
        def _warm(v):
            return v * 1.0

        ncores = os.cpu_count() or 8
        spark.range(0, ncores * 1024, 1, ncores).select(
            _warm(F.col("id").cast("double"))
        ).count()

    rows: dict[str, list[dict]] = {name: [] for name in heavies}
    gc_prev = _gc_ms(spark)
    pids_prev = _worker_pids()
    for p in range(passes):
        for name in heavies:
            t0 = time.perf_counter()
            REGISTRY[name].spark(spark, sf_dir).count()
            wall = time.perf_counter() - t0
            gc_now = _gc_ms(spark)
            pids_now = _worker_pids()
            rows[name].append(
                {
                    "pass": p,
                    "wall_s": round(wall, 3),
                    "gc_delta_ms": gc_now - gc_prev,
                    "spawned": len(pids_now - pids_prev),
                    "exited": len(pids_prev - pids_now),
                    "live_workers": len(pids_now),
                    "load1": round(os.getloadavg()[0], 2),
                }
            )
            gc_prev, pids_prev = gc_now, pids_now

    stalls = []
    for name, rs in rows.items():
        lo = min(r["wall_s"] for r in rs)
        for r in rs:
            if lo > 0 and r["wall_s"] / lo > 3.0 and r["wall_s"] - lo > 1.0:
                stalls.append({"query": name, "min_wall_s": lo, **r})
    report = {
        "sf_dir": sf_dir,
        "passes": passes,
        "python_worker_reuse": reuse,
        "warm_workers": warm_workers,
        "queries": rows,
        "stalls": sorted(stalls, key=lambda s: -s["wall_s"]),
    }
    with open(out_path, "w") as fh:
        json.dump(report, fh, indent=1, sort_keys=True)
    print(
        f"probed {len(heavies)} queries x {passes} passes; "
        f"worker.reuse={reuse}; {len(stalls)} stalled passes -> {out_path}"
    )
    for s in report["stalls"][:10]:
        print(
            f"  STALL {s['query']} pass {s['pass']}: {s['wall_s']}s "
            f"(min {s['min_wall_s']}s) gc+{s['gc_delta_ms']}ms "
            f"spawned={s['spawned']} exited={s['exited']} load1={s['load1']}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
