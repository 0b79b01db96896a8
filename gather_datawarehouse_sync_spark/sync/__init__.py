"""The sync engine: filesystem → warehouse reconciliation (SURVEY §3)."""

from gather_datawarehouse_sync_spark.sync.engine import (
    apply_file_actions,
    plan_category_sync,
    plan_filesystem_sync,
    sync_report,
)

__all__ = [
    "plan_filesystem_sync",
    "plan_category_sync",
    "apply_file_actions",
    "sync_report",
]
