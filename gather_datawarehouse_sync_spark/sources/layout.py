"""Data-layout writers: hive-partitioned and bucketed parquet.

The reference has no storage layout at all — its "table" is a JS array
in driver memory (``src/DataWarehouse.js:25``).  At 100 TB layout IS the
query plan: a predicate on a partition column prunes whole directories
before any footer is read, and two tables bucketed on the same key
equi-join with ZERO exchanges (the shuffle was paid once at write time,
then amortized over every subsequent join).

Both writers are thin wrappers over the DataFrameWriter — the value is
the contract they document and the plan-shape tests that pin it
(``tests/test_plans.py``): partition pruning must show up as
``PartitionFilters`` on the scan, and a bucketed self/equi join must
plan no Exchange.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    mode: str = "overwrite",
) -> None:
    """Write hive-partitioned parquet (`path/col=value/…`).

    Choose low-cardinality, high-selectivity columns (date, lang,
    source): each distinct combination becomes a directory, and a reader
    filtering on them scans only matching directories (static partition
    pruning; dynamic partition pruning kicks in when the filter arrives
    via a dimension join).  Avoid high-cardinality partition columns —
    millions of tiny files is the classic small-files failure.
    """
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 8,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Write a bucketed (and optionally sort-within-bucket) table into
    the session catalog.

    Bucketing pre-shuffles rows into ``num_buckets`` files by key hash at
    write time; any later equi-join or aggregation on the bucket key
    reads co-located buckets and skips its Exchange entirely.  Both join
    sides must agree on key and bucket count.  ``sort_cols`` additionally
    pre-sorts within buckets, letting sort-merge join skip its Sort.
    """
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        # external table: bucket metadata in the catalog, files at `path`
        # (the session's warehouse dir is a static conf — an explicit
        # location keeps tests/pipelines out of it)
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
