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


def merge_jdbc(
    df: DataFrame,
    url: str,
    target: str,
    key_cols: tuple[str, ...],
    staging_table: str | None = None,
    properties: dict[str, str] | None = None,
    num_partitions: int | None = None,
) -> None:
    """Keyed UPSERT into a JDBC table: stage-then-MERGE.

    The reference's update sink (S9, ``src/DataWarehouse.js:294-309``)
    PUTs the changed row per project id — update-by-key semantics.  The
    warehouse-native equivalent is the two-step standard every MPP
    engine uses:

    1. **stage** — ``df.write.jdbc`` into a staging table
       (``overwrite``): the data path stays partition-parallel, one
       connection per partition, prepared-statement batches (nothing
       flows through the driver);
    2. **merge** — ONE server-side ``MERGE INTO target USING staging ON
       <keys> WHEN MATCHED THEN UPDATE ... WHEN NOT MATCHED THEN INSERT
       ...`` statement executed over a driver JDBC connection.  The
       statement is constant-size (data-size-independent); the
       set-matching work runs inside the database, which is the only
       place it can be transactional.

    Re-applying the same ``df`` is IDEMPOTENT: matched rows update to
    the values they already have, nothing inserts twice.  ``df`` must be
    key-unique (standard MERGE precondition — both Derby and the SQL
    standard reject ambiguous source matches).

    The staging table is DROPPED after the merge (it is a full copy of
    the batch — leaving it behind leaks storage and shows stale rows to
    other readers).  Concurrent merges into the same target must pass
    distinct ``staging_table`` names: the default ``{target}_staging``
    is per-target, and two overlapping calls would overwrite each
    other's stage between write and MERGE.

    Works against any MERGE-capable target (Derby 10.11+, Postgres 15+,
    Oracle, SQL Server, ...); the test target is Derby embedded.

    Identifier-case caveat: column identifiers are dialect-QUOTED with
    the DataFrame's exact case, mirroring how Spark's own JDBC writer
    CREATEs the staging table — so the merge is case-exact against
    Spark-created targets.  A PRE-EXISTING target created by unquoted
    external DDL has case-FOLDED identifiers (Postgres lowercases,
    Derby/Oracle uppercase); match the DataFrame's column case to the
    folded names (or create the target through this writer) or the
    quoted reference will miss.  Table names must be plain identifiers
    (validated here — they are interpolated into the statement).
    """
    assert key_cols, "merge_jdbc requires at least one key column"
    import re as _re

    staging = staging_table or f"{target}_staging"
    for t in (target, staging):
        # both names are interpolated into the MERGE/DROP statements —
        # restrict to plain (optionally schema-qualified) identifiers so
        # a crafted name cannot smuggle SQL
        if not _re.fullmatch(r"[A-Za-z_][A-Za-z0-9_$]*(\.[A-Za-z_][A-Za-z0-9_$]*)?", t):
            raise ValueError(f"merge_jdbc: invalid table identifier {t!r}")
    props = dict(properties or {})
    out = df if num_partitions is None else df.coalesce(num_partitions)
    out.write.jdbc(url, staging, mode="overwrite", properties=props)

    # Spark's JDBC writer CREATEs tables with dialect-QUOTED column names
    # (exact DataFrame case) but an unquoted table name — mirror that
    # here, or the database case-folds the identifiers and misses
    def q(c: str) -> str:
        return '"' + c.replace('"', '""') + '"'

    non_keys = [c for c in df.columns if c not in key_cols]
    on = " AND ".join(f"t.{q(k)} = s.{q(k)}" for k in key_cols)
    insert_cols = ", ".join(q(c) for c in df.columns)
    insert_vals = ", ".join(f"s.{q(c)}" for c in df.columns)
    clauses = [f"MERGE INTO {target} t USING {staging} s ON {on}"]
    if non_keys:  # key-only tables have nothing to update on match
        set_list = ", ".join(f"{q(c)} = s.{q(c)}" for c in non_keys)
        clauses.append(f"WHEN MATCHED THEN UPDATE SET {set_list}")
    clauses.append(
        f"WHEN NOT MATCHED THEN INSERT ({insert_cols}) VALUES ({insert_vals})"
    )
    try:
        _execute_statement(df.sparkSession, url, " ".join(clauses), props)
    finally:
        # drop the stage even when the MERGE fails (e.g. duplicate-key
        # source rows): leaving it behind is the storage-leak /
        # stale-reader hazard the docstring promises to prevent
        _execute_statement(
            df.sparkSession, url, f"DROP TABLE {staging}", props
        )


def _execute_statement(
    spark: SparkSession,
    url: str,
    sql: str,
    properties: dict[str, str] | None = None,
) -> int:
    """Run one DML/DDL statement over a driver-side JDBC connection via
    the JVM (py4j) — Spark has no Python-side JDBC client, and a single
    constant-size statement is exactly the driver's job."""
    jvm = spark._jvm
    props = dict(properties or {})
    if "driver" in props:
        # load the driver class so DriverManager can route the URL
        jvm.java.lang.Class.forName(props["driver"])
    jprops = jvm.java.util.Properties()
    for k, v in props.items():
        if k != "driver":
            jprops.setProperty(k, v)
    conn = jvm.java.sql.DriverManager.getConnection(url, jprops)
    try:
        stmt = conn.createStatement()
        try:
            return stmt.executeUpdate(sql)
        finally:
            stmt.close()
    finally:
        conn.close()
