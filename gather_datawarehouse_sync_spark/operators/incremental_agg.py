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

from pyspark.sql import DataFrame, Window
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


def quantile_state(
    df: DataFrame,
    keys: Sequence[str],
    metric_col: str,
    lo: int,
    hi: int,
    bins: int = 256,
) -> DataFrame:
    """The mergeable QUANTILE state the module header promises: a
    fixed-bin integer histogram (keys…, bin, n) over ``metric_col``
    clamped to [``lo``, ``hi``) — the equi-width-histogram sketch.
    Counts form a commutative monoid under per-bin addition, so
    ``state(old ∪ delta) = merge(states)`` holds EXACTLY (not to sketch
    precision — the reason this engine's convention picks the histogram
    over GK/t-digest summaries: integer counts are bit-identical under
    any split/merge order, hence hash-oracle-able; the precision cost
    is the documented bin-width answer quantization below).

    Bin = ``(v − lo)·bins DIV (hi − lo)``, clamped into [0, bins−1] so
    out-of-range values land in the edge bins (they still count toward
    N; quantile answers at the edges then honestly say "≤ lo" / "≥ last
    bin edge").  State size is ≤ |groups|·bins rows — group-table-sized,
    never data-sized; at 100 TB the nightly delta pass is the whole
    cost, exactly like :func:`agg_state`.
    """
    if hi <= lo:
        raise ValueError(f"quantile_state: need hi > lo, got [{lo}, {hi})")
    # integral metric contract (the x_quality_int convention): the cast
    # truncates toward zero in both engines, and DIV requires integral
    # operands anyway — callers quantize floats to cents/micros first
    raw = F.expr(
        f"((CAST({metric_col} AS BIGINT) - {int(lo)}) * {int(bins)}) "
        f"DIV {int(hi - lo)}"
    )
    b = F.greatest(F.lit(0), F.least(F.lit(int(bins) - 1), raw)).cast("int")
    return df.groupBy(*keys, b.alias("bin")).agg(
        F.count(F.lit(1)).alias("n")
    )


def merge_quantile_states(
    states: Sequence[DataFrame], keys: Sequence[str]
) -> DataFrame:
    """Fold histogram states: union + per-(keys, bin) count sum — the
    same no-join monoid merge as :func:`merge_agg_states`."""
    if not states:
        raise ValueError("merge_quantile_states: need at least one state")
    u = reduce(lambda a, b: a.unionByName(b), states)
    return u.groupBy(*keys, "bin").agg(F.sum("n").alias("n"))


def quantiles_from_state(
    state: DataFrame,
    keys: Sequence[str],
    qs_bp: Sequence[int],
    lo: int,
    hi: int,
    bins: int = 256,
) -> DataFrame:
    """Read-time quantile finalization: for each group and each
    requested quantile (basis points, e.g. 5000 = P50), the UPPER EDGE
    of the first bin whose cumulative count reaches ``⌈q·N⌉`` — every
    step exact integer arithmetic (ceiling via ``(n·q + 9999) DIV
    10000``), so the answer is deterministic and cross-engine
    hash-comparable; its error vs the true quantile is bounded by one
    bin width (the documented sketch trade).  One window over the
    ≤ bins-row per-group state — never over data.

    Returns (keys…, q_bp, value) with ``value = lo + (bin+1)·(hi−lo)
    DIV bins``.
    """
    # a q_bp > 10000 can never satisfy cum >= ⌈q·N/10000⌉ (need > N),
    # so the group's row would silently VANISH — a caller typo like
    # 50000-for-P50 must be a loud error, not a missing row; q_bp <= 0
    # is equally meaningless (need ≤ 0 → always the first bin)
    bad = [q for q in qs_bp if not (0 < int(q) <= 10000)]
    if bad:
        raise ValueError(
            f"quantiles_from_state: q_bp values must be in (0, 10000] "
            f"basis points (5000 = P50); got {bad}"
        )
    w = (
        Window.partitionBy(*[F.col(k) for k in keys]) if keys else Window.partitionBy()
    ).orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    totals = state.groupBy(*keys).agg(F.sum("n").alias("__N"))
    cum = state.withColumn("__cum", F.sum("n").over(w))
    joined = cum.join(totals, list(keys)) if keys else cum.crossJoin(
        F.broadcast(totals)
    )
    # ONE aggregation for every requested quantile: explode the q list
    # as literals (|qs| copies of the ≤bins-row state — still
    # state-sized, never data-sized) instead of a per-q filter/agg/union
    # plan that re-evaluates the window+join subtree |qs| times
    qarr = F.array(*[F.lit(int(q)).cast("bigint") for q in qs_bp])
    exploded = joined.select(
        *keys, "bin", "__cum", "__N", F.explode(qarr).alias("q_bp")
    )
    need = F.expr("(__N * q_bp + 9999) DIV 10000")
    return (
        exploded.filter(F.col("__cum") >= need)
        .groupBy(*keys, "q_bp")
        .agg(F.min("bin").alias("__bin"))
        .select(
            *keys,
            "q_bp",
            (
                F.lit(int(lo))
                # CAST the span literal to BIGINT: a span that fits
                # int32 (e.g. [0, 2e9) micros) makes (__bin+1)*span an
                # INT product, which overflows for any bin ≥ span/2³¹
                # — the same unwidened-multiply class as quality_filter
                + F.expr(
                    f"(__bin + 1) * CAST({int(hi - lo)} AS BIGINT) "
                    f"DIV {int(bins)}"
                )
            ).cast("bigint").alias("value"),
        )
    )
