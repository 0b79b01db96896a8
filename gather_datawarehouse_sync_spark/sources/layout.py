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

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


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


def backfill_partitions(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
) -> None:
    """Partition-scoped backfill: overwrite ONLY the partitions present
    in ``df``, leaving every other partition untouched — the standard
    reprocess-one-day / reprocess-one-source operation on a
    hive-partitioned lake.

    Uses Spark's dynamic partition-overwrite mode (scoped to this write
    via the DataFrameWriter option, not a session-wide conf): with the
    default STATIC mode, ``mode("overwrite")`` would first delete the
    ENTIRE root path — the classic accidental-table-wipe — whereas
    dynamic mode deletes exactly the directories the incoming data
    maps to.  At 100 TB this is what makes corrections affordable: a
    one-day backfill rewrites one day's directories, not the table.
    Survival of untouched partitions is pinned in
    ``tests/test_sources.py``.
    """
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(path)
    )


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


def _spread_bits16(c: Column) -> Column:
    """Interleave-ready bit spread: the low 16 bits of ``c`` spaced out
    to even positions (classic Morton magic-number shifts, all JVM-side
    bitwise expressions — no UDF)."""
    x = c.cast("long").bitwiseAND(F.lit(0xFFFF))
    x = x.bitwiseOR(F.shiftleft(x, 8)).bitwiseAND(F.lit(0x00FF00FF))
    x = x.bitwiseOR(F.shiftleft(x, 4)).bitwiseAND(F.lit(0x0F0F0F0F))
    x = x.bitwiseOR(F.shiftleft(x, 2)).bitwiseAND(F.lit(0x33333333))
    x = x.bitwiseOR(F.shiftleft(x, 1)).bitwiseAND(F.lit(0x55555555))
    return x


def morton_code(a: Column, b: Column) -> Column:
    """Z-order (Morton) interleave of two 16-bit-normalized values —
    rows close in BOTH dimensions get close codes."""
    return _spread_bits16(a).bitwiseOR(F.shiftleft(_spread_bits16(b), 1))


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    num_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Z-order-clustered parquet: normalize two numeric columns to
    16-bit grids, interleave into a Morton code, range-partition + sort
    by it, and write.

    Parquet readers skip row groups whose min/max stats exclude the
    filter; a single-column sort gives skipping on that column only,
    while Morton clustering gives *both* columns tight per-file ranges —
    a box predicate (``a BETWEEN … AND b BETWEEN …``) touches a few
    files instead of all of them.  The min/max normalization is two
    scalar aggregates (bounded driver data, same pattern as the IVF
    centroid fetch); everything else is codegen'd bitwise expressions
    plus the one range shuffle the sort requires.
    """
    lo_a, hi_a, lo_b, hi_b = df.agg(
        F.min(col_a), F.max(col_a), F.min(col_b), F.max(col_b)
    ).first()

    def norm(c: str, lo, hi) -> Column:
        if hi == lo:
            return F.lit(0)
        return ((F.col(c) - F.lit(lo)) / F.lit(hi - lo) * F.lit(65535.0)).cast(
            "long"
        )

    z = morton_code(norm(col_a, lo_a, hi_a), norm(col_b, lo_b, hi_b))
    (
        df.withColumn("_z", z)
        .repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )


def compact_files(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_cols: Sequence[str] | None = None,
) -> int:
    """Rewrite a parquet directory into ~``target_file_bytes`` files;
    returns the file count written.

    Streaming sinks and incremental syncs accrete small files; every
    small file costs a task, a footer read, and a listing entry, so scan
    cost drifts from O(bytes) toward O(files) — periodic compaction is
    standard table maintenance (what Delta/Iceberg OPTIMIZE does).  File
    count is sized from the directory's actual on-disk bytes (driver-side
    listing arithmetic only, no data pass); the rewrite itself is one
    round-robin shuffle — or one range shuffle when ``sort_cols`` is
    given, which additionally restores min/max clustering for stat-based
    row-group skipping.

    The swap is rename-aside (old → ``.old``, new → live, then delete
    ``.old``): the destructive delete happens LAST, so a crash at any
    earlier point never loses data.  It is NOT reader-transparent,
    though: between the two renames the live path briefly does not
    exist, so a concurrent reader can fail with path-not-found, and a
    crash in that window leaves the table parked at ``<path>.old`` —
    recovery is renaming ``.old`` back by hand.  ``os.rename``/
    ``shutil`` also restrict this helper to local filesystems (tests,
    single-node maintenance); on object stores or HDFS use the
    FileSystem API, and for concurrent readers use a real table format
    (Delta/Iceberg OPTIMIZE), which is the only genuinely atomic swap.
    """
    import math
    import os
    import shutil

    base = path.rstrip("/")
    tmp, old = base + ".compact", base + ".old"
    # a crash between the final rename and the .old sweep leaves the
    # table LIVE with a stale .old beside it; without this pre-flight
    # every later compaction would rewrite the data in full and then
    # die at os.rename(base, old) with ENOTEMPTY.  The corpse is
    # verifiably stale only while the live table is complete.
    if os.path.exists(old):
        if os.path.exists(os.path.join(base, "_SUCCESS")):
            shutil.rmtree(old)
        else:
            raise ValueError(
                f"compact_files: {old} exists and {base} is incomplete — "
                "a previous compaction crashed between its renames; "
                f"recover by renaming {old} back to {base}"
            )
    # size from the COMMITTED data files only (the shared listing rule:
    # hidden files and non-partition hidden dirs excluded) — counting
    # .crc checksums / _temporary leftovers would oversize n and emit
    # more, smaller files than requested
    size = sum(os.path.getsize(f) for f in _list_parquet_files(base))
    n = max(1, math.ceil(size / target_file_bytes))
    df = spark.read.parquet(path)
    out = (
        df.repartitionByRange(n, *sort_cols).sortWithinPartitions(*sort_cols)
        if sort_cols
        else df.repartition(n)
    )
    out.write.mode("overwrite").parquet(tmp)
    os.rename(base, old)
    os.rename(tmp, base)
    shutil.rmtree(old)
    return n


def file_stats_index(
    spark: SparkSession, path: str, cols: Sequence[str]
) -> DataFrame:
    """Per-file min/max statistics for ``cols`` over a parquet
    directory — the Iceberg-manifest / Delta-stats idea on plain
    parquet, and the read-side payoff of :func:`write_zordered`: with
    the table clustered, each file's [min, max] box is tight, so a
    predicate interval excludes most files BEFORE Spark even lists them
    into a scan (job-level skipping, one level above the row-group
    skipping parquet already does inside each touched file).

    Built DISTRIBUTEDLY: the file list (names only — driver-side
    listing, bounded by file count) fans out over the cluster and each
    task reads just the parquet FOOTER of its files via pyarrow — no
    data pages move, so indexing a 100 TB table costs one footer round
    per file.  Returns (file, n_rows, <col>_min, <col>_max …); persist
    with ``sources/artifacts.cached_parquet`` per table version and
    refresh it with the same incremental contract as every other
    derived artifact.  ``cols`` must be numeric (stats surface as
    doubles); files whose footers lack stats get NULLs and the
    pruner keeps them conservatively.
    """
    files = _list_parquet_files(path)
    if not files:
        raise ValueError(f"file_stats_index: no parquet files under {path}")
    return _footer_stats(spark, files, cols)


def _list_parquet_files(path: str) -> "list[str]":
    """Committed data files under ``path``, ABSOLUTE paths — the same
    visibility rule Spark's own file index applies: hidden FILES
    ('_'/'.' prefixed) are skipped AND hidden DIRECTORIES are pruned
    from the walk unless they are hive partition dirs (contain '=') —
    a crashed write's ``_temporary/`` subtree must never be indexed
    (its part files would be read by explicit path and silently
    duplicate rows a plain ``spark.read.parquet`` never surfaces).
    Absolute paths keep the listing identity equal to
    ``input_file_name()``'s stripped form for relative callers."""
    import os

    out = []
    for root, dirnames, names in os.walk(os.path.abspath(path)):
        dirnames[:] = [
            d
            for d in dirnames
            if "=" in d or not d.startswith(("_", "."))
        ]
        out.extend(
            os.path.join(root, f)
            for f in names
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        )
    return sorted(out)


def _footer_stats(
    spark: SparkSession, files: "list[str]", cols: Sequence[str]
) -> DataFrame:
    """The distributed footer-read kernel shared by
    :func:`file_stats_index` (full build) and
    :func:`refresh_file_stats_index` (delta build)."""
    cols = list(cols)

    def _footers(batches):
        import math as _math

        import pandas as pd
        import pyarrow.parquet as pq

        def _lo(v):
            # largest double ≤ v: int stats beyond 2^53 can round UP in
            # float(), which would shrink the box and wrongly prune a
            # file that holds matching rows — round mins DOWN instead
            if v is None:
                return None
            f = float(v)
            return _math.nextafter(f, -_math.inf) if f > v else f

        def _hi(v):
            if v is None:
                return None
            f = float(v)
            return _math.nextafter(f, _math.inf) if f < v else f

        for pdf in batches:
            rows = []
            for fname in pdf["file"]:
                md = pq.ParquetFile(fname).metadata
                idx = {
                    md.schema.column(i).name: i
                    for i in range(md.num_columns)
                }
                mins = {c: None for c in cols}
                maxs = {c: None for c in cols}
                for rg in range(md.num_row_groups):
                    for c in cols:
                        if c not in idx:
                            # schema evolution: a file written before
                            # the column existed — NULL stats, the
                            # pruner keeps it conservatively (the
                            # documented contract; a KeyError here
                            # would kill the whole index job)
                            continue
                        st = md.row_group(rg).column(idx[c]).statistics
                        if st is None or not st.has_min_max:
                            continue
                        if mins[c] is None or st.min < mins[c]:
                            mins[c] = st.min
                        if maxs[c] is None or st.max > maxs[c]:
                            maxs[c] = st.max
                rows.append(
                    {
                        "file": fname,
                        "n_rows": md.num_rows,
                        **{f"{c}_min": _lo(mins[c]) for c in cols},
                        **{f"{c}_max": _hi(maxs[c]) for c in cols},
                    }
                )
            yield pd.DataFrame(rows)

    stat_cols = ", ".join(
        f"{c}_min double, {c}_max double" for c in cols
    )
    return (
        spark.createDataFrame([(f,) for f in files], "file string")
        # fan-out scales with file count (a fixed small cap would
        # serialize a million footer opens onto a handful of cores —
        # the O(files) pass this index exists to amortize): ~256 files
        # per task, floored at the old 32 for small tables
        .repartition(min(len(files), max(32, -(-len(files) // 256))))
        .mapInPandas(_footers, f"file string, n_rows long, {stat_cols}")
    )


def _guard_index_identity(
    old_index: DataFrame,
    on_disk: "list[str]",
    fresh: "list[str]",
    what: str,
    allow_full_rebuild: bool = False,
) -> None:
    """An incremental refresh where the stored index matches ZERO
    on-disk files is almost never "everything is new" — it is a path
    IDENTITY mismatch (an index persisted from a relative table path
    against this module's absolute listing, or a moved table): the
    refresh would silently drop every stored row and re-read the whole
    table as "fresh" — correct output, but an unannounced O(table)
    rebuild, the exact pass the incremental contract exists to avoid.
    Refuse loudly (one bounded ``limit(1)`` probe of the stored index).

    The SAME zero-overlap state also arises legitimately when a full
    rewrite replaced every data file under the table in place (an
    all-partition compaction that didn't install a new versioned
    directory — this repo's own rewrite verbs DO version, but foreign
    writers may not): pass ``allow_full_rebuild=True`` to accept the
    announced O(table) re-footer in that case instead of failing."""
    if allow_full_rebuild:
        return
    if fresh and len(fresh) == len(on_disk):
        if old_index.limit(1).count() > 0:
            raise ValueError(
                f"{what}: the stored index matches none of the "
                f"{len(on_disk)} data files under the table — either a "
                "path-identity mismatch (index built from a different "
                "or relative path, or the table moved) or a full "
                "rewrite that replaced every file (an in-place "
                "all-partition compaction).  Not an incremental "
                "append: rebuild the index from this path with the "
                "builder, or pass allow_full_rebuild=True to accept "
                "the announced O(table) re-scan"
            )


def refresh_file_stats_index(
    spark: SparkSession,
    path: str,
    old_stats: DataFrame,
    cols: Sequence[str],
    allow_full_rebuild: bool = False,
) -> DataFrame:
    """Incremental maintenance of :func:`file_stats_index`: footer-read
    ONLY the files the stored index does not cover yet, drop rows for
    files that vanished (compaction/GC), carry everything else
    unchanged — ``refresh ≡ full rebuild`` pinned in tests, the same
    incremental contract as every other derived artifact here.

    At 100 TB the full index is one footer round per file of MILLIONS;
    a daily append touches thousands — re-footering the whole table
    per refresh would reintroduce exactly the O(table) pass this
    module exists to avoid.  The file listing and the membership diff
    are file-count-sized (the same bounded class as a partition
    listing); only the NEW files' footers are read, distributedly.
    Persist the result as the next index version (``cached_parquet``)
    and serve :func:`scan_with_file_pruning` from it.

    Assumes IMMUTABLE data files (the parquet-writer convention: new
    content arrives under new ``part-…`` names): a file rewritten IN
    PLACE under its old name keeps its old stats row here, and a
    widened value range could then be wrongly pruned.  Engines that
    rewrite in place must full-rebuild instead — which is why every
    rewrite verb in this repo installs a NEW versioned directory.
    """
    cols = list(cols)
    # EXACT stat-column parity with the stored index, both directions:
    # a missing column can never be refreshed (old rows have no stats
    # for it), and a SUBSET call would pass a one-sided check, appear
    # to work while no file is new, then crash in unionByName the first
    # day an append lands (fresh rows lack the stored extra columns) —
    # an intermittent, data-dependent failure.  Rebuild to change cols.
    expected = {"file", "n_rows"} | {
        part for c in cols for part in (f"{c}_min", f"{c}_max")
    }
    got = set(old_stats.columns)
    if got != expected:
        missing = sorted(expected - got)
        extra = sorted(got - expected)
        raise ValueError(
            f"refresh_file_stats_index: old_stats lacks {missing} / "
            f"carries extra {extra} — the refresh must use exactly the "
            "stored index's stat columns; rebuild with file_stats_index "
            "to change them"
        )
    on_disk = _list_parquet_files(path)
    if not on_disk:
        raise ValueError(
            f"refresh_file_stats_index: no parquet files under {path}"
        )
    # membership diff as joins against the persisted index, not a
    # driver collect of the WHOLE stats table: at millions of files the
    # index should stay a DataFrame end-to-end — only the FRESH file
    # list (bounded by the append batch, the thing that must reach the
    # driver anyway to schedule footer reads) materializes
    disk = spark.createDataFrame(
        [(f,) for f in sorted(set(on_disk))], "file string"
    )
    fresh = sorted(
        r["file"]
        for r in disk.join(
            old_stats.select("file"), "file", "left_anti"
        ).collect()
    )
    _guard_index_identity(
        old_stats,
        on_disk,
        fresh,
        "refresh_file_stats_index",
        allow_full_rebuild=allow_full_rebuild,
    )
    kept = old_stats.join(disk, "file", "left_semi")
    if not fresh:
        return kept
    return kept.unionByName(_footer_stats(spark, fresh, cols))


def scan_with_file_pruning(
    spark: SparkSession,
    stats: DataFrame,
    ranges: "dict[str, tuple[float, float]]",
) -> "tuple[DataFrame, int, int]":
    """Read only the files whose stats boxes intersect every
    ``col: (lo, hi)`` predicate interval — job-level data skipping
    driven by a persisted :func:`file_stats_index`.

    Returns (reader, files_kept, files_total).  The caller still
    applies the row-level filter (file stats are a superset guarantee:
    a kept file may hold matching and non-matching rows; a PRUNED file
    provably holds none — files with absent stats are conservatively
    kept).  The intersection test runs DISTRIBUTED over the stats
    frame; only the surviving path list (bounded by the files the scan
    will open anyway) plus one count reaches the driver — at millions
    of index entries the driver transfer is the PRUNED list, not the
    table.
    """
    # the box-intersection predicate, evaluated executor-side: absent
    # stats (NULL min or max) keep the file conservatively
    pred = F.lit(True)
    for c, (lo, hi) in ranges.items():
        mn, mx = F.col(f"{c}_min"), F.col(f"{c}_max")
        pred = pred & (
            mn.isNull()
            | mx.isNull()
            | ((mn <= F.lit(float(hi))) & (mx >= F.lit(float(lo))))
        )
    # ONE evaluation of the stats frame (it may be the unpersisted
    # footer job — evaluating it twice would re-read every footer):
    # a single aggregate carries the total, the kept path list, and a
    # schema-anchor file for the all-pruned case
    row = stats.agg(
        F.count(F.lit(1)).alias("total"),
        F.sort_array(
            F.collect_list(F.when(pred, F.col("file")))
        ).alias("kept"),
        F.min("file").alias("anchor"),
    ).collect()[0]
    total = int(row["total"])
    if total == 0:
        raise ValueError("scan_with_file_pruning: empty stats table")
    kept = list(row["kept"])
    if not kept:  # preserve schema: an all-pruned scan is a 0-row frame
        return spark.read.parquet(row["anchor"]).limit(0), 0, total
    return spark.read.parquet(*kept), len(kept), total


# ---------------------------------------------------------------------------
# Bloom-filter file index (point-lookup data skipping)
# ---------------------------------------------------------------------------

def _bloom_bits(
    df: DataFrame,
    value_col: str,
    n_bits: int,
    n_hashes: int,
    keep: "list[str]",
) -> DataFrame:
    """The ONE value→(word_idx, bit mask) pipeline BUILD and PROBE
    share (seeded-xxhash64 positions, 64-bit word split): the index is
    PERSISTED, so a drifted copy of this logic would silently
    desynchronize probes from stored bits — false-negative pruning,
    the one corruption this module must never produce."""
    return (
        df.select(
            *keep,
            F.explode(
                F.array(
                    *[
                        F.pmod(
                            F.xxhash64(F.col(value_col), F.lit(i)),
                            F.lit(n_bits),
                        )
                        for i in range(n_hashes)
                    ]
                )
            ).alias("__pos"),
        )
        .select(
            *keep,
            F.expr("CAST(__pos DIV 64 AS INT)").alias("word_idx"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(__pos % 64 AS INT))"
            ).alias("__m"),
        )
    )


def _bloom_geometry(index: DataFrame) -> "tuple[int, int] | None":
    """Decode the per-file geometry sentinels (``word_idx = -2``,
    ``word = n_bits*100 + n_hashes``).  Returns None for a legacy index
    with no sentinels; raises on a mixed-geometry index (halves built
    with different parameters can never probe coherently)."""
    geo = [
        int(r["word"])
        for r in index.filter(F.col("word_idx") == -2)
        .select("word")
        .distinct()
        .limit(2)
        .collect()
    ]
    if not geo:
        return None
    if len(geo) > 1:
        raise ValueError(
            "bloom index carries MIXED geometry sentinels — its halves "
            "were built with different n_bits/n_hashes and can never "
            "probe coherently; rebuild from scratch"
        )
    return divmod(geo[0], 100)


def _check_bloom_geometry(
    index: DataFrame, n_bits: int, n_hashes: int, who: str
) -> None:
    g = _bloom_geometry(index)
    if g is not None and g != (int(n_bits), int(n_hashes)):
        raise ValueError(
            f"{who}: the index was built with n_bits={g[0]}, "
            f"n_hashes={g[1]} but was given n_bits={n_bits}, "
            f"n_hashes={n_hashes} — mismatched geometry hashes probes "
            "to the wrong bit positions (silent false-negative "
            "pruning); pass the build parameters"
        )


def _bloom_rows(
    spark: SparkSession,
    files: "list[str]",
    col: str,
    n_bits: int,
    n_hashes: int,
) -> DataFrame:
    """The shared bloom-bit kernel: ONE distributed scan of ``files``
    mapping each non-NULL value of ``col`` to ``n_hashes`` bit
    positions (seeded xxhash64), folded into sparse 64-bit words per
    (file, word_idx) via BIT_OR, plus one ``word_idx = -1`` marker row
    per file so empty / all-NULL files stay visible to the pruner."""
    # input_file_name() is a percent-ENCODED URI; stripping the scheme
    # matches the raw os paths only while they contain no
    # URI-escaping characters.  Rather than silently minting two
    # identities per file (data rows under the encoded name, marker
    # rows under the raw one — which would double-count totals and
    # break the no-false-negative guarantee), refuse escaping paths up
    # front, DRIVER-side: the check also catches the collision shape
    # ('a b.parquet' encoding onto a real sibling 'a%20b.parquet')
    # that a distributed observed-vs-listed diff cannot see.
    import urllib.parse

    bad = [f for f in files if urllib.parse.quote(f, safe="/") != f]
    if bad:
        raise ValueError(
            "file_bloom_index: table paths contain URI-escaping "
            f"characters (space, %, non-ASCII): {bad[:3]} — the bloom "
            "index keys files by their URI-decoded scan identity and "
            "requires plain-ASCII paths"
        )
    listed = spark.createDataFrame(
        [(f,) for f in sorted(set(files))], "file string"
    )
    rows = (
        _bloom_bits(
            spark.read.parquet(*files)
            .select(
                F.regexp_replace(
                    F.input_file_name(), "^file:(//)?", ""
                ).alias("file"),
                F.col(col).alias("__v"),
            )
            .filter(F.col("__v").isNotNull()),
            "__v",
            n_bits,
            n_hashes,
            ["file"],
        )
        .groupBy("file", "word_idx")
        .agg(F.bit_or("__m").alias("word"))
    )
    # materialize ONCE: the identity verification below would otherwise
    # re-run the whole scan+explode+agg when the caller persists the
    # returned frame — the index rows are file-count × occupied-words
    # sized, safely checkpointable
    rows = rows.localCheckpoint()
    stray = (
        rows.select("file")
        .distinct()
        .join(listed, "file", "left_anti")
        .limit(1)
        .count()
    )
    if stray:
        raise ValueError(
            "file_bloom_index: a scanned file's identity does not match "
            "any on-disk path — filesystem and scan disagree about file "
            "naming; rebuild from a plain-ASCII table path"
        )
    markers = listed.select(
        "file",
        F.lit(-1).alias("word_idx"),
        F.lit(0).cast("long").alias("word"),
    )
    # geometry sentinel per file (word = n_bits*100 + n_hashes): probes
    # and refreshes VALIDATE against it — a caller passing different
    # parameters would hash to the wrong bit positions and prune files
    # that hold matches (the silent false-negative this module must
    # never produce); every other hazard here raises, so must that one
    geometry = listed.select(
        "file",
        F.lit(-2).alias("word_idx"),
        F.lit(int(n_bits) * 100 + int(n_hashes)).cast("long").alias("word"),
    )
    return rows.unionByName(markers).unionByName(geometry)


def file_bloom_index(
    spark: SparkSession,
    path: str,
    col: str,
    n_bits: int = 1 << 18,
    n_hashes: int = 5,
) -> DataFrame:
    """Per-file Bloom filter over ``col`` — point-lookup (equality / IN)
    data skipping for HIGH-CARDINALITY keys, the complement of the
    min/max :func:`file_stats_index`: a uuid-ish key's [min, max] box
    spans the whole domain so interval pruning never bites, but
    membership BITS do (Delta's bloom-filter-index idea on plain
    parquet).  No clustering required — it works on a randomly
    distributed key, where z-order + stats cannot.

    One distributed scan of the column builds the sparse
    ``(file, word_idx, word)`` rows (see :func:`_bloom_rows`); the
    ``word_idx = -1`` marker row keeps empty / all-NULL files visible
    (those prune EXACTLY — no non-NULL value can live there), and the
    ``word_idx = -2`` geometry sentinel pins n_bits/n_hashes so probes
    and refreshes refuse mismatched parameters instead of silently
    pruning matching files.  Size like any bloom:
    ~10 bits per distinct value per file keeps false positives ~1 %
    (a false positive only costs a read; false NEGATIVES cannot happen
    — bit setting is exact, so pruning is a superset guarantee like
    the stats index).  NULL values set no bits — equality probes are
    null-rejecting anyway.

    xxhash64 is TYPE-sensitive (hashing 5 as INT and as BIGINT sets
    different bits), so probes handed to
    :func:`scan_with_bloom_pruning` must carry the indexed column's
    exact type — derive them by selecting/casting against the same
    schema.  Persist with ``cached_parquet`` per table version and
    refresh incrementally via :func:`refresh_file_bloom_index`; the
    same immutable-data-files convention as the stats index (a file
    rewritten in place under its old name keeps stale bits — rewrites
    must install NEW versioned directories, as every rewrite verb here
    does).
    """
    if n_bits < 64 or not (1 <= n_hashes < 100):
        raise ValueError(
            "file_bloom_index: need n_bits >= 64 and 1 <= n_hashes < 100"
            " (the geometry sentinel packs n_hashes into two digits)"
        )
    files = _list_parquet_files(path)
    if not files:
        raise ValueError(f"file_bloom_index: no parquet files under {path}")
    return _bloom_rows(spark, files, col, n_bits, n_hashes)


def refresh_file_bloom_index(
    spark: SparkSession,
    path: str,
    old_index: DataFrame,
    col: str,
    n_bits: int = 1 << 18,
    n_hashes: int = 5,
    allow_full_rebuild: bool = False,
) -> DataFrame:
    """Incremental bloom-index maintenance — the
    :func:`refresh_file_stats_index` contract for membership bits:
    carry rows for files still on disk (semi-join), drop vanished
    files, and scan ONLY the uncovered files for fresh bits; the
    membership diff runs distributed and just the fresh-file list (the
    append batch, which must reach the driver anyway to schedule the
    scan) materializes.  ``n_bits`` / ``n_hashes`` must match the
    build — a drifted geometry would issue probes against the wrong
    bit positions, so persist them alongside the index path.
    """
    on_disk = _list_parquet_files(path)
    if not on_disk:
        raise ValueError(f"refresh_file_bloom_index: no parquet files under {path}")
    _check_bloom_geometry(
        old_index, n_bits, n_hashes, "refresh_file_bloom_index"
    )
    disk = spark.createDataFrame(
        [(f,) for f in sorted(set(on_disk))], "file string"
    )
    fresh = sorted(
        r["file"]
        for r in disk.join(
            old_index.select("file").distinct(), "file", "left_anti"
        ).collect()
    )
    _guard_index_identity(
        old_index,
        on_disk,
        fresh,
        "refresh_file_bloom_index",
        allow_full_rebuild=allow_full_rebuild,
    )
    kept = old_index.join(disk, "file", "left_semi")
    if not fresh:
        return kept
    return kept.unionByName(_bloom_rows(spark, fresh, col, n_bits, n_hashes))


def scan_with_bloom_pruning(
    spark: SparkSession,
    index: DataFrame,
    probes: DataFrame,
    n_bits: int = 1 << 18,
    n_hashes: int = 5,
) -> "tuple[DataFrame, int, int]":
    """Read only the files that MAY contain at least one probe value —
    job-level point-lookup skipping driven by a persisted
    :func:`file_bloom_index`.  ``probes`` is a one-column DataFrame of
    lookup values whose type matches the indexed column exactly (the
    xxhash64 type-sensitivity note on the builder).

    Returns (reader, files_kept, files_total).  The caller still
    applies the row-level equality filter (bloom false positives keep
    extra files; a PRUNED file provably holds none of the probes).
    The build parameters are validated against the index's geometry
    sentinels first (a mismatched n_bits/n_hashes would silently prune
    matching files; a legacy sentinel-free index trusts the caller).
    Every test runs DISTRIBUTED over the index frame, and the prune
    itself is ONE linear DAG over a single evaluation of it (the same
    one-pass discipline as :func:`scan_with_file_pruning`; the
    geometry check adds one bounded sentinel probe):
    probe bit requirements broadcast-join the index rows, a file
    survives when ALL of some probe's required words are fully
    present, and only the kept path list plus a count reach the
    driver.  Probe count is query-sized (an IN-list), so the
    requirement side broadcasts.
    """
    if len(probes.columns) != 1:
        raise ValueError("scan_with_bloom_pruning: probes must be one column")
    pcol = probes.columns[0]
    _check_bloom_geometry(index, n_bits, n_hashes, "scan_with_bloom_pruning")
    req = (
        _bloom_bits(
            probes.select(F.col(pcol).alias("__v"))
            .filter(F.col("__v").isNotNull())
            .distinct(),
            "__v",
            n_bits,
            n_hashes,
            ["__v"],
        )
        .groupBy("__v", "word_idx")
        .agg(F.bit_or("__m").alias("req_word"))
    )
    need = req.groupBy("__v").agg(F.count(F.lit(1)).alias("__need"))
    # one pass: every index row (markers and unmatched words included,
    # via the LEFT join's NULL __v group) flows through two grouped
    # aggregations — per-(file, probe) satisfied-word counts, then a
    # per-file keep verdict — so marker-only files still count toward
    # the total while never matching a probe
    row = (
        index.join(F.broadcast(req), "word_idx", "left")
        .groupBy("file", "__v")
        .agg(
            F.count(
                F.when(
                    F.col("word").bitwiseAND(F.col("req_word"))
                    == F.col("req_word"),
                    F.lit(1),
                )
            ).alias("__got")
        )
        .join(F.broadcast(need), "__v", "left")
        .groupBy("file")
        .agg(F.max(F.col("__got") == F.col("__need")).alias("__keep"))
        .agg(
            F.count(F.lit(1)).alias("total"),
            F.sort_array(
                F.collect_list(F.when(F.col("__keep"), F.col("file")))
            ).alias("kept"),
            F.min("file").alias("anchor"),
        )
        .collect()[0]
    )
    total = int(row["total"])
    if total == 0:
        raise ValueError("scan_with_bloom_pruning: empty bloom index")
    kept = list(row["kept"])
    if not kept:  # preserve schema: an all-pruned scan is a 0-row frame
        return spark.read.parquet(row["anchor"]).limit(0), 0, total
    return spark.read.parquet(*kept), len(kept), total
