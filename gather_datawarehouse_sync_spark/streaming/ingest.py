"""Streaming file ingestion (T1-T3, ``src/DataWarehouse.js:32-63``,
``:604-659``).

The reference watches a directory with chokidar and converts the event
stream to a batch snapshot with a 1000 ms quiescence debounce
(``_checkIdle``, ``:639-659``).  Structured Streaming expresses both
modes directly:

- **snapshot** (the debounce-then-query path): ``Trigger.AvailableNow``
  processes everything currently present, then stops — the exact
  "wait until quiet, then hand over an immutable snapshot" contract of
  ``getFiles`` (``:575-588``), minus the race the debounce papers over
  (the md5 of a just-written file landing after the snapshot).
- **continuous**: micro-batches on a processing-time trigger; the
  reference's idle latch becomes an empty-batch counter in
  ``foreachBatch`` (processing-time, matching the reference — there is
  no event-time column in the reference at all, SURVEY §1.5).

Checkpointing makes the watcher restartable mid-stream — state the
reference cannot express (its inventory dies with the process).
"""

from __future__ import annotations

import threading
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from gather_datawarehouse_sync_spark.sources.filescan import scan_files_stream


def snapshot_inventory(
    spark: SparkSession,
    root: str,
    checkpoint_dir: str,
    suffix: str = ".shp",
    table: str = "file_inventory",
    landing_dir: str | None = None,
) -> DataFrame:
    """Batch-snapshot ingestion: drain everything currently in ``root``
    into an in-memory table and return it (T1/T2 batch semantics).

    ``AvailableNow`` splits the backlog into rate-limited micro-batches
    (unlike ``Once``), so the SCAN runs through executor memory instead
    of one giant batch.  The memory SINK, however, collects every
    output row into the driver's in-memory table — right for the
    inventory's intended scale (file METADATA rows, not file contents:
    ~100 B × file count), wrong for row volumes beyond driver memory;
    for those pass ``landing_dir`` and the drained snapshot lands as
    parquet (scan-side semantics identical), returned as a plain scan.
    """
    w = scan_files_stream(spark, root, suffix).writeStream
    if landing_dir is not None:
        q = (
            w.format("parquet")
            .option("path", landing_dir)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(landing_dir)
    q = (
        w.format("memory")
        .queryName(table)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(table)


def start_inventory_stream(
    spark: SparkSession,
    root: str,
    checkpoint_dir: str,
    on_batch: Callable[[DataFrame, int], None],
    suffix: str = ".shp",
    interval: str = "1 second",
    idle_timeout_s: float | None = None,
    on_idle: Callable[[], None] | None = None,
):
    """Continuous ingestion with the reference's idle-debounce latch.

    ``on_batch(df, batch_id)`` receives each micro-batch of newly
    discovered files.  With ``idle_timeout_s`` set, a watcher thread
    stops the query once no data has arrived for that long — the
    reference's quiescence debounce (``_checkIdle``, ``:639-659``: reset
    a timer on every event, fire on silence), expressed against the
    micro-batch clock.  A batch-count latch can't work here: Spark skips
    the ``foreachBatch`` callback entirely when a trigger finds no data,
    so "consecutive empty batches" is unobservable — wall-clock since
    the last non-empty batch is the honest signal.

    ``on_idle`` is the reference's one-shot ``'idle'`` event
    (``this.emit('idle')``, ``:650``): called exactly once, when the
    latch fires and before the query stops — the "quiet now, snapshot is
    stable" handover.  Returns the StreamingQuery.
    """
    last_data = {"t": time.monotonic()}

    def handle(df: DataFrame, batch_id: int) -> None:
        if df.isEmpty():
            return
        # stamp BEFORE and AFTER on_batch: before, so the idle clock
        # resets the moment data arrives; after, so a callback whose
        # processing alone exceeds idle_timeout_s is never interrupted
        # mid-batch by the stopper (it only sees "idle" once the batch
        # has fully returned)
        last_data["t"] = time.monotonic()
        on_batch(df, batch_id)
        last_data["t"] = time.monotonic()

    query = (
        scan_files_stream(spark, root, suffix)
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=interval)
        .start()
    )

    if idle_timeout_s is not None:

        def stopper() -> None:
            while query.isActive:
                # don't count stream startup as idle time: the countdown
                # starts only once the first micro-batch has completed
                if query.lastProgress is None:
                    last_data["t"] = time.monotonic()
                elif time.monotonic() - last_data["t"] >= idle_timeout_s:
                    if on_idle is not None:
                        on_idle()
                    query.stop()
                    return
                time.sleep(min(idle_timeout_s / 4, 0.5))

        threading.Thread(target=stopper, daemon=True).start()
    return query
