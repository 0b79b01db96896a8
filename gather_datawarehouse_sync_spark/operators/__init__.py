"""Operator library: reference semantics re-expressed as Spark compositions."""

from gather_datawarehouse_sync_spark.operators.joins import (  # noqa: F401
    cascading_join,
    pick_one_per_group,
)
from gather_datawarehouse_sync_spark.operators.dedup import (  # noqa: F401
    mark_duplicates,
    exact_dedup,
)
from gather_datawarehouse_sync_spark.operators.hierarchy import (  # noqa: F401
    path_categories,
)
from gather_datawarehouse_sync_spark.operators.reconcile import (  # noqa: F401
    reconcile,
)
