"""Skew-handling operators: salted join and two-stage salted aggregation.

The reference never meets skew — every "join" is a driver-side nested
loop over one Node heap (``src/DataWarehouse.js:544``, ``:473``).  At
cluster scale a hot key turns one shuffle partition into the straggler
that holds the whole stage; AQE's skew-join splitting
(``spark.sql.adaptive.skewJoin.enabled``, on in ``session.get_spark``)
handles the sort-merge-join case automatically, but two shapes still
need explicit salting:

- **aggregations** whose per-key state is expensive (``collect_list``,
  exact ``COUNT(DISTINCT)``) — AQE cannot split a single group;
- **joins forced through a non-SMJ path** (e.g. a shuffled-hash hint) or
  run on engines/configs without AQE.

Salting is semantics-preserving: results are asserted equal to the
unsalted plan in tests, and the salted aggregation runs inside the
oracle-differential gate (x_salted_agg).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _row_salt(df: DataFrame, n_salts: int) -> Column:
    """Deterministic per-row salt ∈ [0, n_salts): hash of the full row.

    Deterministic (re-evaluation under retries/speculation yields the
    same salt — ``F.rand`` would not) and uniform enough to spread a hot
    key across ``n_salts`` shuffle partitions.
    """
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join that spreads each hot left key over ``n_salts``
    partitions: the fact (left) side gets a deterministic row salt, the
    dimension (right) side is replicated once per salt value, and the
    join key becomes (keys..., salt) — so one hot key's rows land on
    ``n_salts`` reducers instead of one.

    Cost: right side is duplicated ``n_salts``× (choose the smaller side
    as ``right``); results are identical to the plain join (tested).

    Only left-preserving flavors are allowed: the right side's
    replication means a right/full join would return every unmatched
    right row ``n_salts`` times.
    """
    safe = {"inner", "left", "left_outer", "leftouter", "left_semi",
            "leftsemi", "left_anti", "leftanti", "cross"}
    if how.lower() not in safe:
        raise ValueError(
            f"salted_join: how={how!r} would duplicate unmatched right rows "
            f"{n_salts}x (right side is replicated per salt); use one of {sorted(safe)}"
        )
    on = list(on)
    lsalted = left.withColumn("__salt", _row_salt(left, n_salts))
    rsalted = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return lsalted.join(rsalted, [*on, "__salt"], how).drop("__salt")


def salted_distinct_count(
    df: DataFrame,
    group_cols: Sequence[str],
    distinct_col: str,
    n_salts: int = 16,
    out_col: str = "distinct_count",
) -> DataFrame:
    """Exact COUNT(DISTINCT) per group, skew-safe: stage 1 dedups
    (group, value) pairs within (group, salt-of-value) sub-partitions,
    stage 2 sums sub-counts per group.

    A plain ``countDistinct`` shuffles every row of a hot group to ONE
    reducer that must hold the group's whole distinct set; salting on the
    *distinct value's hash* keeps sub-groups disjoint (the same value
    always salts identically, so no double counting) and bounds any
    reducer's state to ~|distinct|/``n_salts``.
    """
    group_cols = list(group_cols)
    salt = F.pmod(F.xxhash64(F.col(distinct_col)), F.lit(n_salts))
    stage1 = (
        df.select(*group_cols, F.col(distinct_col), salt.alias("__salt"))
        .groupBy(*group_cols, "__salt")
        .agg(F.count_distinct(F.col(distinct_col)).alias("__partial"))
    )
    return stage1.groupBy(*group_cols).agg(F.sum("__partial").alias(out_col))


def salted_collect_list(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    n_salts: int = 16,
    out_col: str = "values",
) -> DataFrame:
    """Skew-safe ``collect_list`` (sorted for determinism): collect
    within (group, salt) sub-partitions, then flatten the sub-lists per
    group.  Bounds any single task's collected state to ~1/``n_salts``
    of the hottest group before the final (small) merge of per-salt
    lists.
    """
    group_cols = list(group_cols)
    stage1 = (
        df.withColumn("__salt", F.pmod(F.xxhash64(F.col(value_col)), F.lit(n_salts)))
        .groupBy(*group_cols, "__salt")
        .agg(F.collect_list(value_col).alias("__part"))
    )
    return (
        stage1.groupBy(*group_cols)
        .agg(F.array_sort(F.flatten(F.collect_list("__part"))).alias(out_col))
    )
