"""Vanilla-session driver-contract sweep — the real pre-driver check.

Loads ``__spark_entry__.py`` by file path (exactly how the driver does),
builds a VANILLA SparkSession (no repo configs), smoke-runs ``entry()``,
then diffs EVERY ``queries()`` entry against its DuckDB ``oracle_sql()``
at the given scale factor using the same normalize-sort-compare the
local oracle suite uses.  Rows-only queries (no oracle SQL) are run for
count + schema stability.

Run from OUTSIDE the repo cwd so repo-relative imports can't mask
driver-side failures:

    cd /tmp && python /root/repo/tools/vanilla_sweep.py [sf_dir] [only...]
"""

from __future__ import annotations

import importlib.util
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    sys.path.insert(0, os.path.join(REPO, "tests"))
    from oracle import compare, duck_connection

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "12g")
        .getOrCreate()
    )

    t0 = time.time()
    n_entry = mod.entry(spark).count()
    print(f"entry() smoke: {n_entry} rows in {time.time() - t0:.1f}s", flush=True)

    qs, osql = mod.queries(), mod.oracle_sql()
    con = duck_connection(sf_dir)
    names = [n for n in qs if not only or n in only]
    full = [n for n in names if n in osql]
    rows_only = [n for n in names if n not in osql]
    bad = []
    t0 = time.time()
    for i, name in enumerate(full):
        try:
            problems = compare(qs[name](spark, sf_dir), con, osql[name])
        except Exception as e:  # noqa: BLE001 - report, keep sweeping
            problems = [f"EXCEPTION: {type(e).__name__}: {e}"][:1]
        if problems:
            bad.append(name)
            print(f"[{i + 1}/{len(full)}] {name}: MISMATCH {problems[0][:400]}")
        if (i + 1) % 25 == 0:
            print(
                f"[{i + 1}/{len(full)}] ... {time.time() - t0:.0f}s,"
                f" {len(bad)} mismatches",
                flush=True,
            )
    print(
        f"FULL-oracle: {len(full) - len(bad)}/{len(full)} MATCH"
        f" in {time.time() - t0:.0f}s; mismatches: {bad or 'none'}",
        flush=True,
    )
    t0 = time.time()
    ro_bad = []
    for name in rows_only:
        try:
            df = qs[name](spark, sf_dir)
            _ = (df.schema, df.count())
        except Exception as e:  # noqa: BLE001
            ro_bad.append(name)
            print(f"{name}: ROWS-ONLY FAILED {type(e).__name__}: {e}")
    print(
        f"rows-only: {len(rows_only) - len(ro_bad)}/{len(rows_only)} ran clean"
        f" in {time.time() - t0:.0f}s; failures: {ro_bad or 'none'}",
        flush=True,
    )
    return 1 if (bad or ro_bad) else 0


if __name__ == "__main__":
    raise SystemExit(main())
