"""Join operators matching the reference's bespoke matching semantics.

The reference implements every join as a nested ``Array.filter`` scan —
O(n·m) nested loops on a single thread (``src/DataWarehouse.js:544``,
``:558``, ``:473``, ``:483``). Here each becomes a shuffle- or
broadcast-based Spark join, so cost is O(n/p) per partition and the
physical strategy (broadcast-hash vs sort-merge) is Catalyst/AQE's choice.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# A tier: (label, condition builder).  The builder receives the left
# DataFrame and the tier's (plan-aliased) right DataFrame and returns the
# join condition; reference columns via l["name"] / t["name"].
CondBuilder = Callable[[DataFrame, DataFrame], Column]


def cascading_join(
    left: DataFrame,
    right: DataFrame,
    tiers: Sequence[tuple[str, CondBuilder]],
    match_col: str = "match",
    no_match_label: str = "none",
) -> DataFrame:
    """Cascading-key left join (J1, ``src/DataWarehouse.js:538-572``).

    The reference's ``_getProjectMatch`` tries an exact path equi-match
    first (``:544-554``) and falls back to an md5 match (``:558-568``)
    only when the path tier found nothing; the winning tier is recorded in
    a ``match`` tag (``:551``, ``:565``).  Unmatched rows survive with
    nulls (left-join semantics).

    Spark expression: one left join per tier, all in a single lazy DAG;
    tier *k*'s columns are masked unless every tier < k missed, so the
    earliest tier wins exactly like the reference's early-return.  Each
    tier is an independent equi-join that Catalyst can plan as
    broadcast-hash when the right side is small — at 100 TB the dimension
    side broadcasts and the cascade costs zero extra shuffles of the fact
    side.

    Each tier must produce at most one right row per left row (the
    reference takes ``[0]`` of its filter scan): pre-apply
    :func:`pick_one_per_group` to the right side when keys are non-unique.

    Returns left columns + right columns (null when unmatched) +
    ``match_col`` ∈ {tier labels..., ``no_match_label``}.
    """
    if not tiers:
        raise ValueError("cascading_join needs at least one tier")

    right_cols = right.columns
    overlap = set(right_cols) & set(left.columns)
    if overlap:
        raise ValueError(f"rename right-side columns that collide with left: {overlap}")

    result = left
    probe = right_cols[0]  # non-null ⇔ the tier matched

    class _TierRef:
        """Maps original right-side names to the tier's renamed columns, so
        condition builders can say ``r["md5"]`` regardless of tier index."""

        def __init__(self, i: int):
            self._i = i

        def __getitem__(self, name: str) -> Column:
            if name not in right_cols:
                raise KeyError(name)
            return F.col(f"__t{self._i}__{name}")

    for i, (_, build) in enumerate(tiers):
        # column-level rename gives each tier fresh attribute ids — avoids
        # Spark's ambiguous-self-join trap when the same right frame feeds
        # multiple tiers
        tier_df = right.select(
            *[F.col(c).alias(f"__t{i}__{c}") for c in right_cols]
        )
        cond = build(result, _TierRef(i))
        result = result.join(tier_df, cond, "left")

    def tcol(i: int, c: str) -> Column:
        return F.col(f"__t{i}__{c}")

    def earlier_missed(i: int) -> Column:
        e = F.lit(True)
        for j in range(i):
            e = e & tcol(j, probe).isNull()
        return e

    picked = {
        c: F.coalesce(
            *[F.when(earlier_missed(i), tcol(i, c)) for i in range(len(tiers))]
        )
        for c in right_cols
    }
    match_expr = F.coalesce(
        *[
            F.when(earlier_missed(i) & tcol(i, probe).isNotNull(), F.lit(label))
            for i, (label, _) in enumerate(tiers)
        ],
        F.lit(no_match_label),
    )

    return result.select(
        *left.columns,
        *[picked[c].alias(c) for c in right_cols],
        match_expr.alias(match_col),
    )


def pick_one_per_group(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_cols: Sequence[Column | str],
) -> DataFrame:
    """Deterministic one-per-group pick (the core of J2's greedy
    assignment, ``src/DataWarehouse.js:465-536``, made deterministic).

    The reference's ``_getFileMatch`` walks projects in array order and
    greedily claims the first candidate file (mutating shared state at
    ``:528-531``) — the outcome depends on discovery order.  The engine
    defines a deterministic total order instead (SURVEY §4.3.1):
    ``row_number`` over the group, keep rank 1.  One shuffle on
    ``partition_cols``; no driver-side state; scales linearly.
    """
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def one_to_one_assign(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_order: Sequence[Column | str],
    right_order: Sequence[Column | str],
) -> DataFrame:
    """Deterministic one-to-one matching on a shared key (J2,
    ``src/DataWarehouse.js:465-536``).

    Rank both sides within each key group and join on (key, rank): the
    k-th left row pairs with the k-th right row.  This replaces the
    reference's order-dependent greedy claims with a stable pairing —
    each left row gets at most one right row and vice versa (documented
    deviation, SURVEY §7 watch-list).  Two shuffles (one per side), then
    an equi-join that AQE can turn into a broadcast if one side is small.
    """
    lw = Window.partitionBy(key).orderBy(*left_order)
    rw = Window.partitionBy(key).orderBy(*right_order)
    l_ranked = left.withColumn("__lrn", F.row_number().over(lw))
    r_ranked = right.alias("__r").withColumn("__rrn", F.row_number().over(rw))
    joined = l_ranked.alias("__l").join(
        r_ranked,
        (F.col(f"__l.{key}") == F.col(f"__r.{key}"))
        & (F.col("__lrn") == F.col("__rrn")),
        "inner",
    )
    return joined.select(
        *[F.col(f"__l.{c}") for c in left.columns],
        *[F.col(f"__r.{c}") for c in right.columns if c != key],
    )
