"""Incremental aggregate maintenance (materialized-view delta merge).

The reference recomputes everything per sync (``src/DataWarehouse.js:67``
has no incremental path); a 100 TB warehouse cannot.  For ALGEBRAIC
aggregates (count/sum/min/max — anything forming a commutative monoid
over a fixed-size state) the maintenance identity

    state(old ∪ delta) = merge(state(old), state(delta))

means a nightly refresh touches ONLY the delta: one aggregate pass over
new data plus a merge keyed by the (tiny) group table, instead of a full
recompute.  AVG rides along as sum/count, finalized at read time.

Non-algebraic aggregates need sketch states instead: COUNT(DISTINCT) →
HLL sketches (``hll_sketch_agg``/``hll_union_agg``, exercised in
``tests/test_operators.py``), quantiles → a mergeable quantile sketch.
The state schema here is deliberately the same shape Spark's own
partial aggregation uses internally — this module just persists it
across runs.

Exactness contract: keep the summed metric INTEGER (e.g. cents via
``ROUND(price*100)``) and the merged state is bit-identical to the
from-scratch state under any split or merge order — which is what lets
x_agg_merge hash-compare a two-way merge against a full recompute
oracle.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def agg_state(
    df: DataFrame, keys: Sequence[str], metric_col: str
) -> DataFrame:
    """One aggregate pass → mergeable state (keys…, n, s, mn, mx)."""
    m = F.col(metric_col)
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(m).alias("s"),
        F.min(m).alias("mn"),
        F.max(m).alias("mx"),
    )


def merge_agg_states(states: Sequence[DataFrame], keys: Sequence[str]) -> DataFrame:
    """Fold any number of states into one: union (cheap — states are
    group-table-sized, not data-sized) then one re-aggregate.  Keys
    present in only some states merge correctly (no join, no null
    fiddling — absent groups simply contribute no rows)."""
    if not states:
        raise ValueError("merge_agg_states: need at least one state")
    u = reduce(lambda a, b: a.unionByName(b), states)
    return u.groupBy(*keys).agg(
        F.sum("n").alias("n"),
        F.sum("s").alias("s"),
        F.min("mn").alias("mn"),
        F.max("mx").alias("mx"),
    )


def finalize_agg(state: DataFrame) -> DataFrame:
    """Read-time finalization: derive AVG from the state (one exact
    double division — bit-stable when n and s are integers)."""
    return state.withColumn(
        "avg", F.col("s").cast("double") / F.col("n")
    )
