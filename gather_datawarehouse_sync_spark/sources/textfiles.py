"""Delimited/JSONL text ingestion (extension surface).

The reference reads no tabular text at all (its only inputs are the
filesystem walk, ``src/DataWarehouse.js:32``, and the REST tables at
``:74``/``:400``); a standalone analytics engine needs the standard
crawl-landing formats.  Design rules, all cluster-safe:

- **explicit schema, never inference**: schema inference is a second
  full pass over the data (fatal at 100 TB) and silently drifts when a
  partition's sample differs; callers pass a ``StructType`` (or DDL
  string) and get exactly that.
- **PERMISSIVE + corrupt-record capture**: bad rows land in a
  ``_corrupt_record`` column instead of killing a 1000-executor job;
  :func:`split_corrupt` separates clean rows from a quarantine frame so
  pipelines can dead-letter them (the reference's analogue is
  crash-on-first-bad-row).
- **line-splittable**: JSONL and CSV without embedded newlines split at
  arbitrary byte offsets, so scan parallelism is input-size-bound, not
  file-count-bound (``multiLine=true`` would make each file one task —
  documented trap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Name of the quarantine column PERMISSIVE mode fills for bad rows.
CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: T.StructType | str) -> T.StructType:
    """Return ``schema`` plus the corrupt-record capture column."""
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType(), True)]
    )


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType | str
) -> DataFrame:
    """One JSON object per line → DataFrame with ``schema`` plus a
    ``_corrupt_record`` quarantine column (null for clean rows)."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """Delimited text → DataFrame with ``schema`` plus ``_corrupt_record``."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", str(header).lower())
        .option("sep", sep)
        .csv(path)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean_rows_without_quarantine_col, quarantined_raw_lines).

    Spark refuses a query that filters on ``_corrupt_record`` alone over
    a lazily-parsed scan; both sides here also project, which keeps the
    plans legal and lets the clean side prune the quarantine column out
    of the parquet-ward schema entirely.
    """
    keep = [c for c in df.columns if c != CORRUPT_COL]
    cached = df.cache()
    clean = cached.filter(F.col(CORRUPT_COL).isNull()).select(*keep)
    bad = cached.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw")
    )
    return clean, bad


def read_parquet_evolved(
    spark: SparkSession, *paths: str
) -> DataFrame:
    """Read parquet written under an evolving schema (``mergeSchema``):
    columns added over time come back null-filled for older files.  The
    merge unions footers only — no data pass — so it stays cheap at
    scale; still, pin schemas in production tables and reserve this for
    ingestion boundaries (SURVEY §1.6 convention)."""
    return spark.read.option("mergeSchema", "true").parquet(*paths)
