"""Batch sessionization: gap-based session assignment over an event log.

Extension surface: the closest reference concept is the processing-time
idle debounce (``src/DataWarehouse.js:639-659``), which is a single
global gap detector; this operator is its per-key, event-time
generalization.

The streaming side already has ``F.session_window`` (streaming/windows.py,
Q40); this is the batch/backfill twin that materializes explicit session
*ids* — the shape training-data pipelines need when grouping user activity
into documents.  Two windows over one shuffle on the key:

1. ``lag`` flags rows whose gap from the previous event exceeds the
   threshold (a session break);
2. a running sum of break flags numbers the sessions per key.

Both windows share the same (partition, order) spec, so Catalyst executes
them in a single Window physical operator — one shuffle total, no joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: float,
    order_tiebreak: str | None = None,
    session_col: str = "session_seq",
) -> DataFrame:
    """Append a 0-based per-key session sequence number: a new session
    starts whenever the gap since the key's previous event exceeds
    ``gap_seconds``.  Deterministic given ``order_tiebreak`` (any unique
    column) for equal timestamps.
    """
    order = [F.col(ts_col)]
    if order_tiebreak:
        order.append(F.col(order_tiebreak))
    w = Window.partitionBy(key_col).orderBy(*order)
    gap = F.col(ts_col).cast("double") - F.lag(F.col(ts_col).cast("double")).over(w)
    brk = F.when(gap > gap_seconds, F.lit(1)).otherwise(F.lit(0))
    running = Window.partitionBy(key_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(session_col, F.sum(brk).over(running))


def forward_fill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    fill_cols: list[str],
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Per-key forward fill (LOCF): replace nulls in ``fill_cols`` with
    the key's most recent non-null value at-or-before each row — the
    standard gap-fill for sparse sensor/feature streams.  One window
    (``last ignorenulls`` over rows-unbounded-preceding) per column, all
    sharing one shuffle on the key; same single-Exchange shape as
    :func:`sessionize`.
    """
    order = [F.col(ts_col)]
    if order_tiebreak:
        order.append(F.col(order_tiebreak))
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df
    for c in fill_cols:
        out = out.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))
    return out


def session_bounds(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: float,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Collapse each (key, session) to one row: event count + start/end
    timestamps — the session-rollup used for engagement features."""
    s = sessionize(df, key_col, ts_col, gap_seconds, order_tiebreak)
    return s.groupBy(key_col, "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
    )


def change_intervals(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """SCD-type-2 style validity intervals: collapse each key's event
    stream into runs of consecutive equal ``value_col`` and emit one row
    per run with ``valid_from`` / ``valid_to`` (null ``valid_to`` = the
    run is current).  This is the gaps-and-islands shape dimension
    maintenance needs when replaying a change log into a versioned
    dimension (the reference's update sink keeps only latest state,
    ``src/DataWarehouse.js:472``; this keeps history).

    Run detection is the two-row_number island trick; both windows and
    the rollup share the key partitioning, so the whole operator is one
    shuffle on ``key_col`` (plus the final ``lead`` in the same
    partitioning).
    """
    order = [F.col(ts_col)] + ([F.col(order_tiebreak)] if order_tiebreak else [])
    w_all = Window.partitionBy(key_col).orderBy(*order)
    w_val = Window.partitionBy(key_col, value_col).orderBy(*order)
    runs = df.withColumn(
        "_isl", F.row_number().over(w_all) - F.row_number().over(w_val)
    )
    # the run's first tiebreak value keeps the lead window deterministic
    # when adjacent runs share a timestamp (possible with equal-ts events)
    aggs = [F.min(ts_col).alias("valid_from"), F.count(F.lit(1)).alias("n_events")]
    lead_order = [F.col("valid_from")]
    if order_tiebreak:
        aggs.append(F.min(order_tiebreak).alias("_first_ord"))
        lead_order.append(F.col("_first_ord"))
    bounds = runs.groupBy(key_col, value_col, "_isl").agg(*aggs)
    w_lead = Window.partitionBy(key_col).orderBy(*lead_order)
    out = bounds.withColumn("valid_to", F.lead("valid_from").over(w_lead)).drop("_isl")
    return out.drop("_first_ord") if order_tiebreak else out


def interpolate_linear(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    order_tiebreak: str | None = None,
    out_col: str = "v_interp",
) -> DataFrame:
    """Linear gap interpolation: null ``value_col`` rows get the
    time-weighted blend of the nearest non-null neighbors on each side
    (the imputation sibling of :func:`forward_fill`; feature pipelines
    use it for sensor/metric gaps where LOCF biases).

    Edges degrade gracefully: a gap with only one known side copies
    that side; all-null keys stay null.  Two mirrored windows over the
    same key partitioning — Catalyst runs both in one shuffle.  The
    arithmetic is pure IEEE binary64 in a fixed operand order, so the
    result is bit-stable across engines (differentially tested against
    the identical SQL in DuckDB).
    """
    order = [F.col(ts_col)] + ([F.col(order_tiebreak)] if order_tiebreak else [])
    w_prev = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_next = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(1, Window.unboundedFollowing)
    )
    us = F.unix_micros(F.col(ts_col))
    known_ts = F.when(F.col(value_col).isNotNull(), us)
    pv = F.last(value_col, ignorenulls=True).over(w_prev)
    pt = F.last(known_ts, ignorenulls=True).over(w_prev)
    nv = F.first(value_col, ignorenulls=True).over(w_next)
    nt = F.first(known_ts, ignorenulls=True).over(w_next)
    interp = (
        F.when(
            pv.isNotNull() & nv.isNotNull() & (nt > pt),
            pv + (nv - pv) * ((us - pt) / (nt - pt)),
        )
        # degenerate gap: both known neighbors share one timestamp
        # (equal-ts events) — the naive blend is 0/0 = NaN; take the
        # PREVIOUS side, consistent with forward_fill's LOCF convention
        .when(pv.isNotNull() & nv.isNotNull(), pv)
        .otherwise(F.coalesce(pv, nv))
    )
    return df.withColumn(
        out_col, F.when(F.col(value_col).isNotNull(), F.col(value_col)).otherwise(interp)
    )
