"""One-shot plan audit over the whole registry (r18 optimization round).

Builds every registry query (no execution beyond what builders do
eagerly) and counts plan features the optimization guide flags:
Exchange nodes, join strategies, Python-boundary nodes, scans without
pushed filters.  Output: one TSV line per query + a summary, written to
stdout (redirect to a file for the round log).

Usage: python tools/plan_audit.py [query ...]
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
    only = sys.argv[1:]
    spark = get_spark("plan_audit")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = only or sorted(REGISTRY)
    print("query\t" + "\t".join(FEATURES))
    totals = {k: 0 for k in FEATURES}
    for name in names:
        try:
            df = REGISTRY[name].spark(spark, sf_dir)
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
