"""Physical-plan inspection and assertion helpers (SURVEY §4)."""

from gather_datawarehouse_sync_spark.plans.inspect import (
    broadcast_join_count,
    codegen_stage_count,
    plan_str,
    pushed_filters,
    read_schemas,
    shuffle_count,
)

__all__ = [
    "plan_str",
    "pushed_filters",
    "read_schemas",
    "shuffle_count",
    "broadcast_join_count",
    "codegen_stage_count",
]
