"""Structured Streaming surface (SURVEY §2.12, M5)."""

from gather_datawarehouse_sync_spark.streaming.ingest import (
    snapshot_inventory,
    start_inventory_stream,
)
from gather_datawarehouse_sync_spark.streaming.incremental import (
    start_incremental_dedup,
)
from gather_datawarehouse_sync_spark.streaming.windows import (
    interval_join,
    session_counts,
    sliding_counts,
    stateful_running_totals,
    streaming_dedup,
    tumbling_counts,
)

__all__ = [
    "snapshot_inventory",
    "start_inventory_stream",
    "start_incremental_dedup",
    "tumbling_counts",
    "sliding_counts",
    "session_counts",
    "streaming_dedup",
    "interval_join",
    "stateful_running_totals",
]
