"""SQL sink (S12): the reference's INSERT-statement codegen re-expressed
as Spark's JDBC writer.

The reference builds one multi-row ``INSERT INTO $tablename (type, name,
metadata, shortName) VALUES ...`` string over the flattened category
tree (``_toSql``, ``src/DataWarehouse.js:744-755``; its only call site
is commented out at ``:649`` — the sink is vestigial there).  The
Spark-native equivalent is ``df.write.jdbc``: each partition opens one
connection and streams its rows through a prepared statement with
``executeBatch`` — the cluster-safe version of string-concatenated SQL
(no quoting bugs, no single giant statement, parallel across
partitions).

Scale notes:

- ``num_partitions`` caps concurrent connections (``coalesce``, a
  narrow dependency — no shuffle): a 1000-executor write must not open
  1000 connections against one database.
- ``batchsize`` maps to the JDBC fetch/batch unit; the default 1000 is
  fine for dimension-sized tables, raise it for fact loads.
- The demo/test target is Derby embedded (in-process, on Spark's own
  classpath) — swap the URL/driver for any server-side database; no code
  here is Derby-specific.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def category_insert_rows(categories: DataFrame) -> DataFrame:
    """Project the category dimension (``operators.hierarchy.
    path_categories``) to the reference's INSERT row shape
    (``src/DataWarehouse.js:746``): ``type, name, metadata, shortName``
    with the fixed robot metadata JSON (``:687``)."""
    meta = F.to_json(
        F.struct(
            F.lit("gatherbot").alias("iam"),
            F.lit(False).alias("selectable"),
            F.lit(False).alias("editable"),
        )
    )
    return categories.select(
        "type",
        "name",
        meta.alias("metadata"),
        F.col("short_name").alias("shortName"),
    )


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    properties: dict[str, str] | None = None,
    num_partitions: int | None = None,
    batchsize: int = 1000,
) -> None:
    """Write ``df`` to a JDBC table (S12).

    ``mode="append"`` matches the reference's INSERT semantics;
    ``overwrite`` truncates-and-loads for full dimension refreshes.
    """
    props = dict(properties or {})
    props.setdefault("batchsize", str(batchsize))
    out = df if num_partitions is None else df.coalesce(num_partitions)
    out.write.jdbc(url, table, mode=mode, properties=props)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """Read a JDBC table back (round-trip verification surface)."""
    return spark.read.jdbc(url, table, properties=dict(properties or {}))
