"""Sources & sinks: filesystem inventory scans, REST-shaped connectors."""

from gather_datawarehouse_sync_spark.sources.filescan import (  # noqa: F401
    scan_files,
    scan_files_stream,
)
