"""Sources & sinks: filesystem inventory scans, REST-shaped connectors,
persisted derived-artifact storage."""

from gather_datawarehouse_sync_spark.sources.filescan import (  # noqa: F401
    scan_files,
    scan_files_stream,
)
from gather_datawarehouse_sync_spark.sources.artifacts import (  # noqa: F401
    artifact_path,
    cached_parquet,
    claim_versions_root,
    compact_table_partitions,
    init_scd2_history,
    list_table_versions,
    load_bpe_merges,
    load_ivf_centroids,
    load_pq_codebooks,
    merge_scd2,
    merge_table,
    merge_table_versioned,
    prune_table_versions,
    read_version_pointer,
    swap_version_pointer,
    VersionConflictError,
    save_bpe_merges,
    save_ivf_centroids,
    save_pq_codebooks,
    scd2_as_of,
    table_diff,
)
