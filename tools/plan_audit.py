"""One-shot plan audit over the whole registry (r18 optimization round).

Builds every registry query (no execution beyond what builders do
eagerly) and counts plan features the optimization guide flags:
Exchange nodes, join strategies, Python-boundary nodes, scans without
pushed filters.  Output: one TSV line per query + a summary, written to
stdout (redirect to a file for the round log).

CAVEAT (r19): without ``--execute`` the audited plan is the INITIAL
adaptive plan (``executedPlan().toString()`` on an unexecuted frame
prints ``AdaptiveSparkPlan isFinalPlan=false``) — AQE's runtime
conversions (SMJ→BHJ, coalesced reads) are invisible, so join/exchange
counts can over- or under-state the executed shape.  ``--execute``
collects each frame first so the SAME QueryExecution re-prints with
``isFinalPlan=true`` and the counts reflect what actually ran.

Usage: python tools/plan_audit.py [--execute] [query ...]
"""

from __future__ import annotations

import os
import re
import sys
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gather_datawarehouse_sync_spark.queries import REGISTRY  # noqa: E402
from gather_datawarehouse_sync_spark.session import get_spark  # noqa: E402

FEATURES = {
    "exch": r"Exchange",
    "smj": r"SortMergeJoin",
    "shj": r"ShuffledHashJoin",
    "bhj": r"BroadcastHashJoin",
    "bnlj": r"BroadcastNestedLoopJoin",
    "cart": r"CartesianProduct",
    "pyrow": r"BatchEvalPython",
    "pyarrow": r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas",
    "sort": r"\bSort\b",
    "window": r"Window",
}


def main() -> None:
    args = sys.argv[1:]
    execute = "--execute" in args
    only = [a for a in args if a != "--execute"]
    spark = get_spark("plan_audit")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = only or sorted(REGISTRY)
    print("query\t" + "\t".join(FEATURES))
    totals = {k: 0 for k in FEATURES}
    for name in names:
        try:
            df = REGISTRY[name].spark(spark, sf_dir)
            if execute:
                # materialize THIS QueryExecution so the adaptive plan
                # finalizes (isFinalPlan=true) before it is printed —
                # registry results are bounded, so collect() is safe
                df.collect()
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception:
            print(f"{name}\tERROR: {traceback.format_exc(limit=1).splitlines()[-1]}")
            continue
        counts = {k: len(re.findall(p, plan)) for k, p in FEATURES.items()}
        for k, v in counts.items():
            totals[k] += v
        print(name + "\t" + "\t".join(str(counts[k]) for k in FEATURES))
    print("TOTAL\t" + "\t".join(str(totals[k]) for k in FEATURES))


if __name__ == "__main__":
    main()
