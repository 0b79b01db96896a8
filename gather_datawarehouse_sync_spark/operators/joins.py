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
    # match detection rides a SYNTHETIC always-true marker per tier (r16
    # review find): probing the right frame's first column misclassifies
    # a matched row whose first column is legitimately NULL as a miss —
    # unmasking later tiers and mislabeling match_col
    probe = "__hit"

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
            *[F.col(c).alias(f"__t{i}__{c}") for c in right_cols],
            F.lit(True).alias(f"__t{i}__{probe}"),
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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """As-of join: for each left row, the temporally nearest right row on
    the same key (``backward`` = latest right_ts ≤ left_ts, inclusive;
    ``forward`` = earliest right_ts ≥ left_ts).

    Absent from the reference (its joins are all exact-key,
    ``src/DataWarehouse.js:544``, ``:558``); standard time-series surface
    the new engine adds.

    Implementation is the union-and-window plan, *not* an inequality
    join: tag both sides, union on (key, ts), and window-fill ONE
    STRUCT of the whole right row with ``last(..., ignorenulls=True)``
    over ``ORDER BY ts, side ROWS UNBOUNDED PRECEDING``.  That is ONE
    shuffle of |L|+|R| rows on the key — no range-condition
    BroadcastNestedLoop blowup, no per-key cross product; at 100 TB it
    scales exactly like a groupBy on the key.  Right rows sort before
    left rows at equal ts, which makes the boundary inclusive.  Among
    right rows with the same (key, ts) the winner is the one sorting
    LAST by the remaining payload columns (deterministic).

    The struct fill is load-bearing for correctness (r16 review find):
    filling each payload column INDEPENDENTLY backfills a NULL field of
    the true as-of row from an older right row — emitting a "torn" row
    mixing columns of different right rows.  The struct is the whole
    row or nothing.  Two more equi-join-parity guards: a left row with
    a NULL key or NULL timestamp matches NOTHING (window partitioning
    groups NULL keys together and desc_nulls_last would hand NULL-ts
    rows the earliest right row under ``forward`` — both diverge from
    SQL join semantics and from the registered DuckDB oracle), so the
    filled match is masked to NULL there.

    ``tolerance_seconds`` voids matches farther than the given horizon
    (timestamp columns only).

    Returns all left columns + the right payload columns (right minus
    key), null where no match exists.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction: {direction}")
    payload = [c for c in right.columns if c != on]
    overlap = set(payload) & set(left.columns)
    if overlap:
        raise ValueError(f"rename right-side columns that collide with left: {overlap}")
    rtypes = dict(right.dtypes)
    ltypes = dict(left.dtypes)

    lpart = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        *left.columns,
        *[F.lit(None).cast(rtypes[c]).alias(c) for c in payload],
    )
    rpart = right.filter(F.col(right_ts).isNotNull()).select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(ltypes[c]).alias(c) for c in left.columns],
        *payload,
    )
    tie = [F.col(c).asc_nulls_first() for c in payload if c != right_ts]
    if direction == "backward":
        order = [F.col("__t").asc_nulls_first(), F.col("__side").asc(), *tie]
    else:
        order = [F.col("__t").desc_nulls_last(), F.col("__side").asc(), *tie]
    w = (
        Window.partitionBy("__k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # __r: the WHOLE right row as one struct (NULL on left-side rows) —
    # filled atomically so NULL payload fields can never be backfilled
    # from an older right row; the left row's own NULL key/ts masks the
    # match entirely (equi-join semantics)
    unioned = lpart.unionByName(rpart).withColumn(
        "__r",
        F.when(
            F.col("__side") == 0, F.struct(*[F.col(c) for c in payload])
        ),
    )
    filled = unioned.select(
        "__side",
        *left.columns,
        F.when(
            F.col("__k").isNotNull() & F.col("__t").isNotNull(),
            F.last("__r", ignorenulls=True).over(w),
        ).alias("__m"),
    )
    out = (
        filled.filter(F.col("__side") == 1)
        .select(
            *left.columns,
            *[F.col("__m")[c].alias(c) for c in payload],
        )
    )
    if tolerance_seconds is not None:
        gap = F.abs(
            F.col(left_ts).cast("double") - F.col(right_ts).cast("double")
        )
        keep = F.col(right_ts).isNotNull() & (gap <= F.lit(tolerance_seconds))
        out = out.select(
            *left.columns,
            *[F.when(keep, F.col(c)).alias(c) for c in payload],
        )
    return out


def choose_band_bucket_width(
    values: DataFrame,
    value_col: str,
    band: float,
    target_rows_per_bucket: int = 4096,
    max_fanout: int = 16,
    min_bucket_width: float | None = None,
    accuracy: int = 10_000,
) -> float:
    """Data-driven bucket width for :func:`band_join` — closes the
    "user must know the data" knob in the linkage path: a value
    distribution CONCENTRATED relative to the band (skew) would put the
    whole corpus into a handful of band-wide buckets and make one
    bucket's candidate set quadratic; a finer bucket grid splits it at
    the cost of more probes per left row.

    One mergeable-sketch aggregation pass (count + two
    ``percentile_approx`` rungs — a single Expand-free partial agg, the
    100 TB shape) estimates the dense span p99−p01; the expected bucket
    population at width ``w`` is roughly ``n / span × w``, so the probe
    factor ``k = ceil(band · n / span / target_rows_per_bucket)``
    (clamped to ``[1, max_fanout]``) yields ``w = band / k`` with
    expected populations ≤ ``target_rows_per_bucket``.

    ``min_bucket_width`` floors the grid (pass 1 for integer-valued
    columns — a sub-unit grid cannot separate equal integers, it only
    multiplies probes).  Identical-value pile-ups are NOT fixable by
    any grid (equal values share every bucket); those return ``band``
    unchanged — that residual skew is AQE skew-join territory.  The
    chosen width never changes the JOIN RESULT (bucketing is plan-side
    only), so callers may treat it as a pure tuning decision.
    """
    import math

    if band <= 0:
        raise ValueError("band must be positive")
    if target_rows_per_bucket < 1 or max_fanout < 1:
        raise ValueError("target_rows_per_bucket and max_fanout must be >= 1")
    row = values.agg(
        F.count(F.col(value_col)).alias("n"),
        F.percentile_approx(
            F.col(value_col), [0.01, 0.99], accuracy
        ).alias("pp"),
    ).collect()[0]
    n, pp = row["n"], row["pp"]
    if not n or pp is None or pp[0] is None:
        return float(band)
    span = float(pp[1]) - float(pp[0])
    if span <= 0:  # identical values: no grid separates them
        return float(band)
    k = math.ceil(float(band) * float(n) / span / target_rows_per_bucket)
    k = max(1, min(int(k), int(max_fanout)))
    if min_bucket_width is not None and min_bucket_width > 0:
        if float(min_bucket_width) >= float(band):
            # the floor dominates the whole grid: no k >= 1 keeps
            # band/k above it.  Honor the floor directly — w > band
            # just means k = ceil(band/w) = 1, one bucket probed each
            # side of home, never a wrong result.  (Previously
            # floor(band/w_min) = 0 clamped k to 1 and returned
            # w = band < min_bucket_width, silently violating the
            # floor for integer-valued columns.)
            return float(min_bucket_width)
        k = min(k, max(1, int(math.floor(float(band) / min_bucket_width))))
    return float(band) / k


def band_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    band: float,
    how: str = "inner",
    bucket_width: "float | str | None" = None,
    target_rows_per_bucket: int = 4096,
    max_fanout: int = 16,
    min_bucket_width: float | None = None,
) -> DataFrame:
    """Band (range) join: all pairs with ``|left_on - right_on| <= band``
    over numeric columns — WITHOUT the BroadcastNestedLoopJoin cross
    product Catalyst would pick for a bare inequality condition.

    Classic bucketed-range rewrite, with the bucket GRID decoupled from
    the band PREDICATE: bucket each side by ``floor(value / w)``; a
    qualifying pair's buckets differ by at most ``k = ceil(band / w)``,
    so probing left buckets {b−k … b+k} against right bucket b as an
    EQUI-join finds every pair exactly once (each right row lives in one
    bucket; the 2k+1 left probes are distinct).  One shuffle on the
    bucket key, (2k+1)× left fan-out, then the exact predicate filters —
    at 100 TB this is a plain shuffled equi-join AQE can skew-split,
    instead of |L|·|R| nested-loop work.

    ``bucket_width`` picks the grid: ``None`` → ``w = band`` (the
    classic 3-probe form), a number → that width, or ``"auto"`` →
    :func:`choose_band_bucket_width` probes the value distribution
    (one sketch-aggregation pass over both sides) and picks ``w`` so a
    distribution concentrated relative to the band cannot make one
    band-wide bucket quadratic.  The grid never changes the result
    set, only the plan.
    """
    import math

    if band <= 0:
        raise ValueError("band must be positive")
    if how != "inner":
        # outer flavors would silently degenerate: the post-join band
        # filter drops null-extended rows, and the multi-bucket explode
        # means unmatched left rows vanish instead of surviving with nulls
        raise ValueError(f"band_join supports how='inner' only, got {how!r}")
    overlap = set(right.columns) & set(left.columns)
    if overlap:
        raise ValueError(f"rename right-side columns that collide with left: {overlap}")
    if bucket_width == "auto":
        vals = left.select(F.col(left_on).alias("__v")).unionByName(
            right.select(F.col(right_on).alias("__v"))
        )
        bucket_width = choose_band_bucket_width(
            vals,
            "__v",
            band,
            target_rows_per_bucket=target_rows_per_bucket,
            max_fanout=max_fanout,
            min_bucket_width=min_bucket_width,
        )
    w = float(band) if bucket_width is None else float(bucket_width)
    if w <= 0:
        raise ValueError("bucket_width must be positive")
    # an explicit floor must hold however w was chosen (the auto path
    # honors it by construction; explicit/default widths must not
    # silently bypass it — sub-floor grids on integer-valued columns
    # multiply probes without separating anything)
    if (
        min_bucket_width is not None
        and min_bucket_width > 0
        and w < float(min_bucket_width) * (1.0 - 1e-12)
    ):
        raise ValueError(
            f"bucket_width {w} is below min_bucket_width "
            f"{min_bucket_width} — pass bucket_width='auto' or a width "
            ">= the floor"
        )
    # ceil never under-probes: a float band/w a hair below its true
    # integer value still ceils to it, and a hair above costs one
    # harmless extra (empty) probe
    k = max(1, int(math.ceil(float(band) / w)))
    if 2 * k + 1 > 513:
        raise ValueError(
            f"bucket_width {w} needs a {2 * k + 1}-way probe fan-out for "
            f"band {band} — widen the grid (or raise the band)"
        )
    lb = left.withColumn(
        "__bucket",
        F.explode(
            F.array(
                *[
                    (F.floor(F.col(left_on) / F.lit(w)) + F.lit(d)).cast("long")
                    for d in range(-k, k + 1)
                ]
            )
        ),
    )
    rb = right.withColumn(
        "__bucket", F.floor(F.col(right_on) / F.lit(w)).cast("long")
    )
    return (
        lb.join(rb, "__bucket", how)
        .filter(F.abs(F.col(left_on) - F.col(right_on)) <= F.lit(band))
        .drop("__bucket")
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
