"""Exactly-once streaming parquet sink via epoch-idempotent writes.

The reference's sinks are idempotent REST upserts retried per row
(``src/DataWarehouse.js:472``); a file-lake sink needs the same
property against Structured Streaming's at-least-once ``foreachBatch``
replay: after a crash between "batch written" and "offsets committed",
the SAME epoch id is re-delivered.  Writing each epoch to its own
``epoch=<id>`` directory with ``overwrite`` mode makes the replay a
no-op — the directory is replaced with identical content, never
appended twice.  This is the standard exactly-once recipe for
idempotent sinks (transactional sinks use epoch id as the txn key the
same way).

Reading the result as one table is a plain partitioned scan of
``path`` (``epoch`` becomes a partition column, prunable like any
other).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def epoch_parquet_sink(path: str) -> Callable[[DataFrame, int], None]:
    """A ``foreachBatch`` function writing each micro-batch to
    ``path/epoch=<epoch_id>`` with overwrite semantics (idempotent under
    epoch replay)."""

    def write(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{path}/epoch={epoch_id}")

    return write


def write_stream_exactly_once(df: DataFrame, path: str, checkpoint: str):
    """Start an AvailableNow stream draining ``df`` into an
    epoch-partitioned parquet lake; returns the query (caller awaits)."""
    return (
        df.writeStream.foreachBatch(epoch_parquet_sink(path))
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
