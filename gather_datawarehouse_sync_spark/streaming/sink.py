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
    epoch replay).

    Routed through the artifact layer's atomic install
    (stage-then-rename, ``overwrite=True``): a direct
    ``mode("overwrite")`` on the final epoch path deletes-then-rewrites
    in place, so a concurrent reader of a replayed epoch sees a
    half-deleted directory — the exact torn-read artifacts.py exists to
    prevent.  With the atomic swap a reader sees the OLD complete epoch
    or the NEW complete one, never parts."""

    def write(batch_df: DataFrame, epoch_id: int) -> None:
        from gather_datawarehouse_sync_spark.sources.artifacts import (
            _install_atomic,
        )

        _install_atomic(batch_df, f"{path}/epoch={epoch_id}", overwrite=True)

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
