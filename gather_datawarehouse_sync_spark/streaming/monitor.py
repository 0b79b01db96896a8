"""Streaming quality monitoring: per-micro-batch distribution drift
against a persisted reference histogram.

The batch acceptance gate (``operators/profile.distribution_drift``)
compares a finished crawl against the reference corpus; a LIVE ingest
wants the same check per micro-batch — "is the stream's quality
distribution sliding away from the accepted corpus?" — without
re-scanning the reference each batch.  Layout mirrors
``streaming/incremental.py``:

* the reference side is a STORED histogram artifact
  (``profile.score_histogram`` persisted once per corpus version — a
  few-row parquet table, broadcast by the planner per batch);
* ``foreachBatch`` applies the batch operator
  (``profile.drift_against_profile``) to each micro-batch, so stream
  semantics are EXACTLY the batch operator's (parity-pinned — no
  second implementation to drift);
* drift rows land through the epoch-idempotent sink: zero streaming
  state, replayed epochs rewrite identical reports.

Per-batch drift (not cumulative) is deliberate: the monitoring question
is "does THIS batch look like the corpus", and cumulative drift is the
batch gate run once at the end over the drained table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame

from gather_datawarehouse_sync_spark.operators.profile import (
    drift_against_profile,
)
from gather_datawarehouse_sync_spark.streaming.sink import epoch_parquet_sink


def start_quality_monitor(
    stream: DataFrame,
    reference_hist: DataFrame,
    score: Column,
    out_path: str,
    checkpoint: str,
    bin_width: int = 1000,
    score_col: str = "__q_score",
):
    """Drain ``stream`` (AvailableNow) through per-batch drift reporting
    against ``reference_hist`` (a stored :func:`score_histogram` table);
    drift rows land in ``out_path`` epoch-partitioned.  ``score`` is the
    integer quality expression evaluated on each batch row (e.g.
    ``quality_score_bp(F.col("text"))``).  Returns the started query
    (caller awaits)."""
    sink = epoch_parquet_sink(out_path)

    def _drift_batch(batch_df: DataFrame, epoch_id: int) -> None:
        scored = batch_df.select(score.alias(score_col))
        report = drift_against_profile(
            reference_hist, scored, score_col, bin_width
        )
        sink(report, epoch_id)

    return (
        stream.writeStream.foreachBatch(_drift_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
