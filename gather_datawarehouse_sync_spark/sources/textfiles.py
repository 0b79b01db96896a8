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
- **line-splittable**: both readers scan with the ``text`` source (one
  record per line, splittable at arbitrary byte offsets) and parse with
  ``from_json`` / ``from_csv`` expressions, so scan parallelism is
  input-size-bound, not file-count-bound (``multiLine=true`` on the
  json/csv datasources would make each file one task), and the corrupt
  column is an ordinary derived column — no datasource restriction on
  filtering it, no ``cache()`` workaround.
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


def _parsed(lines: DataFrame, parsed: F.Column) -> DataFrame:
    """Flatten a parse-expression struct into top-level columns."""
    return lines.select(parsed.alias("__p")).select("__p.*")


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType | str
) -> DataFrame:
    """One JSON object per line → DataFrame with ``schema`` plus a
    ``_corrupt_record`` quarantine column (null for clean rows)."""
    lines = spark.read.text(path)
    return _parsed(
        lines,
        F.from_json(
            F.col("value"),
            _with_corrupt(schema),
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ),
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """Delimited text → DataFrame with ``schema`` plus ``_corrupt_record``.

    ``header=True`` drops lines equal to the schema's own header
    rendering (the per-file first line; a positional skip is impossible
    once files split across tasks, which is also why the csv datasource
    handles headers per-file — this reader keeps the splittable text
    scan instead and filters the rendered header exactly).

    Two failure modes follow from that exact-match filter, both
    accepted costs of the splittable-scan design:

    - a DATA row that coincidentally equals the rendered header (every
      field string-typed and named like its column) is silently
      dropped, anywhere in the file, not just line 1;
    - a REAL header that renders differently (spaces after separators,
      quoted names, different column names than ``schema``) is NOT
      recognized — it falls through the parser and lands in the
      ``_corrupt_record`` quarantine (or, if every column is string,
      parses as a bogus data row).

    When headers can't be trusted to match the schema rendering, read
    with ``header=False`` and drop the known header rows upstream, or
    use the per-file csv datasource and give up input splitting.
    """
    full = _with_corrupt(schema)
    lines = spark.read.text(path)
    if header:
        head = sep.join(f.name for f in full.fields if f.name != CORRUPT_COL)
        lines = lines.filter(F.col("value") != head)
    # from_csv takes a DDL string, not a StructType
    ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in full.fields)
    return _parsed(
        lines,
        F.from_csv(
            F.col("value"),
            ddl,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL, "sep": sep},
        ),
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean_rows_without_quarantine_col, quarantined_raw_lines).

    With expression-parsed input the quarantine column is an ordinary
    column, so both sides are plain filters — no caching, no pinned
    storage memory; each side re-reads its split of the text scan.
    """
    keep = [c for c in df.columns if c != CORRUPT_COL]
    clean = df.filter(F.col(CORRUPT_COL).isNull()).select(*keep)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
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
