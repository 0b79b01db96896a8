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


def shard_manifest(
    df: DataFrame,
    docs_per_shard: int,
    id_col: str = "doc_id",
    payload_cols: "list[str] | None" = None,
    seed: str = "export",
) -> DataFrame:
    """Deterministic shard assignment + per-shard content manifest —
    the verification half of :func:`export_jsonl_shards`, exposed
    separately so the manifest can be recomputed INDEPENDENTLY of any
    written files and compared (a delivery is verified by re-deriving
    its manifest from the source and diffing, the same
    stored-vs-recompute contract as every persisted artifact here).

    Rows rank by the engine-portable ``md5(seed:id)`` shuffle
    (:func:`...operators.sampling.shuffle_order` — hierarchical, no
    global window) and fill shards of ``docs_per_shard`` in rank order,
    so shard contents are a pure function of (corpus, seed, size):
    reproducible across runs, engines, and cluster layouts.  Each
    shard's ``content_hash`` is ORDER-INVARIANT exact integer
    arithmetic: per row the first 8 md5 hex chars of the
    unit-separator-joined payload parse to a 32-bit int and SUM per
    shard (int64-safe to ~2³¹ rows/shard) — so one flipped byte in any
    row, a lost row, or a duplicated row changes the manifest.
    Returns (shard, n_rows, content_hash), one row per shard.
    """
    from gather_datawarehouse_sync_spark.operators.sampling import (
        shuffle_order,
    )

    if docs_per_shard < 1:
        raise ValueError("shard_manifest: docs_per_shard must be >= 1")
    cols = payload_cols if payload_cols is not None else df.columns
    payload = F.concat_ws(
        "\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in cols]
    )
    ranked = shuffle_order(
        df.withColumn("__payload", payload), id_col, seed=seed, out_col="__rank"
    )
    return (
        ranked.select(
            F.expr(f"CAST((__rank - 1) DIV {int(docs_per_shard)} AS INT)").alias(
                "shard"
            ),
            F.expr(
                "CAST(conv(substr(md5(__payload), 1, 8), 16, 10) AS BIGINT)"
            ).alias("__h"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("__h").alias("content_hash"),
        )
    )


def export_jsonl_shards(
    df: DataFrame,
    path: str,
    docs_per_shard: int,
    id_col: str = "doc_id",
    payload_cols: "list[str] | None" = None,
    seed: str = "export",
) -> DataFrame:
    """Training-data delivery: write the corpus as
    ``path/shard=<n>/*.json`` (JSONL — one document per line, the
    format trainers consume) in deterministic ``md5(seed:id)`` shard
    assignment, plus a ``_manifest`` parquet of per-shard row counts
    and order-invariant content hashes (:func:`shard_manifest`).  A
    consumer verifies the delivery by recomputing the manifest from
    the files (or the receiving side's copy) and diffing — the
    checksum handshake every corpus handoff needs.  One range-free
    hash shuffle on the shard id; shards are rank-packed so every
    shard except the last holds exactly ``docs_per_shard`` docs.
    Returns the manifest."""
    from gather_datawarehouse_sync_spark.operators.sampling import (
        shuffle_order,
    )

    cols = payload_cols if payload_cols is not None else df.columns
    ranked = shuffle_order(df, id_col, seed=seed, out_col="__rank")
    (
        ranked.select(
            F.expr(f"CAST((__rank - 1) DIV {int(docs_per_shard)} AS INT)").alias(
                "shard"
            ),
            *cols,
        )
        .repartition("shard")
        .write.mode("overwrite")
        .partitionBy("shard")
        .json(path)
    )
    manifest = shard_manifest(
        df, docs_per_shard, id_col=id_col, payload_cols=cols, seed=seed
    )
    manifest.coalesce(1).write.mode("overwrite").parquet(f"{path}/_manifest")
    return df.sparkSession.read.parquet(f"{path}/_manifest")
