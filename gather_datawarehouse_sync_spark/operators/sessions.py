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
