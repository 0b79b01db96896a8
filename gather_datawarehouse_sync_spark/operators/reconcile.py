"""CDC-style reconciliation (diff/merge), SURVEY §2.11.

The reference's top-level capability is making a remote table converge to
a source-of-truth snapshot: ``syncFilesystem`` (``src/DataWarehouse.js:
67-258``) and ``syncCategories`` (``:392-463``) both walk rows one at a
time, firing per-row RPCs with no backpressure (``:238-244``).

The Spark expression is a single full-outer join producing one *action*
DataFrame with an ``action`` column ∈ {insert, update, delete, keep} —
the classic MERGE classification — which a sink then applies in bulk.
One shuffle (or zero, when the dimension side broadcasts); actions are
data, so they can be audited, counted, and retried idempotently.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ACTION_COL = "action"


def reconcile(
    source: DataFrame,
    target: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
    source_prefix: str = "src_",
    target_prefix: str = "tgt_",
) -> DataFrame:
    """Full-outer diff of ``source`` (desired state) against ``target``
    (current state) on ``keys``.

    Classification (M1-M4 semantics):

    - key only in source            → ``insert``  (M2, ref ``:235-244``)
    - key only in target            → ``delete``  (M3/M4, ref ``:198-201``,
      ``:443-451`` — soft-delete/archive is the sink's choice)
    - key in both, compare differs  → ``update``  (M1, ref ``:260-291``;
      unlike the reference, which writes the *old* md5 back on rename
      (``:277``) and only logs content changes (``:282-284``), the new
      value is what lands — documented deviation, SURVEY §7)
    - key in both, compare equal    → ``keep``

    Output columns: keys + ``src_*``/``tgt_*`` for every non-key column
    of either side + ``action``.
    """
    compare_cols = list(
        compare_cols
        if compare_cols is not None
        else [c for c in source.columns if c not in keys and c in target.columns]
    )
    s = source.select(
        *[F.col(k) for k in keys],
        *[
            F.col(c).alias(f"{source_prefix}{c}")
            for c in source.columns
            if c not in keys
        ],
        F.lit(True).alias("__in_src"),
    )
    t = target.select(
        *[F.col(k) for k in keys],
        *[
            F.col(c).alias(f"{target_prefix}{c}")
            for c in target.columns
            if c not in keys
        ],
        F.lit(True).alias("__in_tgt"),
    )
    joined = s.join(t, list(keys), "full_outer")

    if compare_cols:
        # null-safe inequality on every compared column
        differs = None
        for c in compare_cols:
            d = ~F.col(f"{source_prefix}{c}").eqNullSafe(F.col(f"{target_prefix}{c}"))
            differs = d if differs is None else (differs | d)
    else:
        differs = F.lit(False)

    action = (
        F.when(F.col("__in_tgt").isNull(), F.lit("insert"))
        .when(F.col("__in_src").isNull(), F.lit("delete"))
        .when(differs, F.lit("update"))
        .otherwise(F.lit("keep"))
    )
    return joined.withColumn(ACTION_COL, action).drop("__in_src", "__in_tgt")


def assert_unique_keys(df: DataFrame, keys: Sequence[str]) -> None:
    """Reference J7 hard-errors on >1 category match
    (``src/DataWarehouse.js:432-434``).  Engine equivalent: assert key
    uniqueness up front with one aggregation instead of per-row throws."""
    dup = (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        raise ValueError(f"duplicate keys in reconcile input: {dup[0].asDict()}")


def action_counts(actions: DataFrame) -> DataFrame:
    """The reference's end-of-run report (``found/missing/updates``
    counters, ``src/DataWarehouse.js:230``) as one aggregation."""
    return actions.groupBy(ACTION_COL).agg(F.count(F.lit(1)).alias("c"))


def verify_applied(
    source: DataFrame,
    target_after: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """M5 write-back verification (ref ``:304-305`` logs expected vs
    actual per row).  Re-diff after the sink applied the plan: a
    converged target yields only ``keep`` rows, so anything returned
    here is a divergence to alert on.  One aggregation-free pass — run
    it as a post-MERGE assertion."""
    return reconcile(source, target_after, keys, compare_cols).filter(
        F.col(ACTION_COL) != "keep"
    )
