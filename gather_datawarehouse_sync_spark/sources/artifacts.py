"""Persisted derived artifacts: trained ANN indexes and cached edge lists.

A 100 TB corpus is not re-sketched per query: production retrieval stacks
train an index once (IVF coarse quantizer, PQ codebooks, MinHash corpus
sketch, near-dup pair list) and serve many queries against the stored
artifact.  ``minhash_dedup_against(reference_signatures=...)``
(operators/dedup.py) realizes that contract for MinHash sketches; this
module realizes it for the remaining trained structures:

- :func:`save_ivf_centroids` / :func:`load_ivf_centroids` — the IVF
  coarse quantizer (``kmeans_centroids``) as a parquet table
  ``(cell, centroid)``.
- :func:`save_pq_codebooks` / :func:`load_pq_codebooks` — PQ codebooks
  (``train_pq_codebooks``) as ``(subspace, code, centroid)``.
- :func:`cached_parquet` — a persist-once parquet cache for any derived
  DataFrame (near-dup pair lists, cluster maps): build on first call,
  read-only parquet scan afterwards, atomic directory swap so an
  interrupted build never leaves a half-written artifact readable.

Round-trips are exact: float64 centroids survive parquet bit-for-bit
(IEEE 754 doubles, no decimal re-rendering), so an ANN query against a
loaded index returns byte-identical top-k to the in-memory matrix
(pinned in tests/test_operators.py).

Storage layout is plain parquet on purpose — readable by any engine,
partition-friendly, and the same medium the corpus itself lives in; no
pickle (unsafe across versions) and no driver-local .npy (invisible to
a cluster's shared filesystem).
"""

from __future__ import annotations

import itertools
import os
import shutil
import threading
import time
from collections.abc import Callable

import numpy as np
from pyspark.sql import DataFrame, SparkSession

# per-process staging-dir counter (see cached_parquet): itertools.count
# is a C-level atomic next(), and the thread id joins the suffix, so two
# DRIVER THREADS racing builds can never mint the same staging dir (a
# GIL-interleaved `seq += 1` could — LOAD/ADD/STORE are separate
# bytecodes — and the loser's rmtree would destroy the winner's
# in-flight build)
_BUILD_SEQ = itertools.count(1)


def _staging_suffix() -> str:
    return f"{os.getpid()}_{threading.get_ident()}_{next(_BUILD_SEQ)}"


def artifact_root() -> str:
    """Artifact directory: $SPARK_GRAFT_ARTIFACTS, else <repo>/.artifacts."""
    default = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".artifacts",
    )
    return os.environ.get("SPARK_GRAFT_ARTIFACTS", default)


def artifact_path(sf_dir: str, key: str) -> str:
    """Canonical location for a per-scale-factor artifact.

    Keyed by the sf directory's basename PLUS a fingerprint of its
    parquet files (names, sizes, mtimes): an artifact derives from the
    corpus, so a regenerated corpus — same path, different bytes — must
    MISS the cache and rebuild rather than silently serve a cluster
    map/sketch of data that no longer exists.  The fingerprint is a
    directory listing (no data read), the same freshness signal
    ``compact_files`` sizes from.

    ``key`` must encode every parameter the artifact depends on
    (threshold, num_hashes, nlist, ...) plus a format version suffix —
    bump the version when the producing operator changes semantics, or a
    stale cache silently serves old results.
    """
    import hashlib

    sf_tag = os.path.basename(os.path.normpath(sf_dir)) or "default"
    h = hashlib.md5()
    n = 0
    try:
        # recurse into directory-style parquet tables (including
        # PARTITIONED layouts like cell=0/part-*.parquet): only LEAF
        # FILE stats are hashed — a subdirectory's own mtime is useless
        # (rewriting a file in place does not touch the parent dir's
        # mtime), so hashing it could serve a stale artifact for a
        # regenerated partitioned source.  Nanosecond mtimes so a
        # regenerate-within-the-same-second (same sizes) still misses.
        for name in sorted(os.listdir(sf_dir)):
            full = os.path.join(sf_dir, name)
            if not name.endswith(".parquet"):
                continue
            if os.path.isfile(full):
                st = os.stat(full)
                h.update(f"{name}:{st.st_size}:{st.st_mtime_ns};".encode())
                n += 1
            elif os.path.isdir(full):
                for dirpath, dirnames, filenames in os.walk(full):
                    dirnames.sort()
                    rel_dir = os.path.relpath(dirpath, sf_dir)
                    for part in sorted(filenames):
                        st = os.stat(os.path.join(dirpath, part))
                        h.update(
                            f"{rel_dir}/{part}:{st.st_size}:"
                            f"{st.st_mtime_ns};".encode()
                        )
                        n += 1
        h.update(f"#files={n}".encode())
    except OSError:
        pass  # non-local sf_dir (e.g. object store): fall back to tag-only
    return os.path.join(artifact_root(), f"{sf_tag}-{h.hexdigest()[:8]}", key)


_SCHEMA_SIDECAR = "_table_schema.json"


def _write_schema_sidecar(dirpath: str, df: DataFrame) -> None:
    """Record the version's schema in an underscore sidecar (invisible
    to parquet scans, carried by partition rewrites).  A version whose
    every row was deleted has NO data files, and plain
    ``spark.read.parquet`` then fails schema inference — the sidecar is
    what makes the empty table readable (found by the merge_table
    random-batches property test: a delete batch covering every key
    produced an unreadable table).  Write-temp-then-rename: the write
    lands under a pid-unique temp name in the SAME directory and
    ``os.rename``s into place — atomic on POSIX, so a concurrent reader
    of the directory (the self-healing path mutates a LIVE, already
    promoted artifact) sees either the old sidecar or the complete new
    one, never a missing/truncated file; and because rename replaces
    the directory ENTRY, the previous version's hardlinked copy (the
    carry loop hardlinks sidecars across versions) keeps its own inode
    untouched."""
    import json

    target = os.path.join(dirpath, _SCHEMA_SIDECAR)
    # sweep stale temps first: a writer that crashed between open and
    # rename leaves its pid-named temp behind, and the version-carry
    # loops hardlink every non-_SUCCESS file — without the sweep one
    # crash propagates residue into every later version forever
    for stale in os.listdir(dirpath):
        if stale.startswith("._schema_tmp."):
            try:
                os.remove(os.path.join(dirpath, stale))
            except OSError:
                pass  # concurrent writer already renamed/swept it
    tmp = os.path.join(dirpath, f"._schema_tmp.{os.getpid()}.json")
    with open(tmp, "w") as fh:
        json.dump(df.schema.jsonValue(), fh)
        fh.flush()
        os.fsync(fh.fileno())  # a rename that survives power loss must
        # not point at unflushed data — the one way temp+rename could
        # REPLACE a good sidecar with a truncated one
    os.rename(tmp, target)


# schema-inference cache for artifact reads (the load_table pattern from
# session.py applied to read_table): every ``spark.read.parquet`` runs a
# one-task footer job (~100-150 ms measured r18), and artifact-backed
# queries re-read the same versions every bench/oracle pass.  Keyed by a
# WALK fingerprint of the artifact directory (leaf names, sizes,
# nanosecond mtimes — the artifact_path freshness signal), so any
# rewrite, append, delete, or compaction misses and re-infers.  The
# cached schema is the one inference itself produced for that exact file
# set — identical by construction, so partition-column type inference is
# unchanged.  Unfingerprintable paths (remote stores) skip the cache.
_READ_SCHEMA_CACHE: dict = {}
_READ_SCHEMA_CACHE_MAX = 1024


def _dir_fingerprint(path: str) -> "str | None":
    import hashlib

    # os.walk yields NOTHING for a regular file, so a single-file path
    # would fingerprint to the constant empty digest regardless of
    # content and an in-place rewrite would serve a stale schema (r18
    # advice) — skip caching for anything that is not a directory
    if not os.path.isdir(path):
        return None
    h = hashlib.md5()
    n = 0
    try:
        for dirpath, dirnames, filenames in os.walk(path):
            dirnames.sort()
            rel = os.path.relpath(dirpath, path)
            for name in sorted(filenames):
                st = os.stat(os.path.join(dirpath, name))
                h.update(f"{rel}/{name}:{st.st_size}:{st.st_mtime_ns};".encode())
                n += 1
    except OSError:
        return None
    return f"{n}:{h.hexdigest()}"


def read_table(spark: SparkSession, path: str) -> DataFrame:
    """Read an artifact/table version; when schema inference fails
    because the version holds zero data files (legitimate after a
    delete-all merge), fall back to the schema sidecar.  Schema
    inference for an unchanged file set is served from
    ``_READ_SCHEMA_CACHE`` (see above) — the data scan is untouched."""
    from pyspark.errors import AnalysisException

    fp = _dir_fingerprint(path)
    key = (os.path.realpath(path), fp) if fp is not None else None
    if key is not None and key in _READ_SCHEMA_CACHE:
        return spark.read.schema(_READ_SCHEMA_CACHE[key]).parquet(path)
    try:
        out = spark.read.parquet(path)
        if key is not None:
            # changed file set under this path: partition counts probed
            # from the old bytes are suspect (see session.py)
            from gather_datawarehouse_sync_spark.session import (
                _invalidate_spread_cache,
            )

            _invalidate_spread_cache()
            if len(_READ_SCHEMA_CACHE) >= _READ_SCHEMA_CACHE_MAX:
                _READ_SCHEMA_CACHE.clear()
            _READ_SCHEMA_CACHE[key] = out.schema
        return out
    except AnalysisException:
        import json

        sidecar = os.path.join(path, _SCHEMA_SIDECAR)
        if os.path.exists(sidecar):
            from pyspark.sql.types import StructType

            with open(sidecar) as fh:
                schema = StructType.fromJson(json.load(fh))
            return spark.read.schema(schema).parquet(path)
        raise


def cached_parquet(
    spark: SparkSession,
    path: str,
    build: Callable[[], DataFrame],
    partition_by: tuple[str, ...] | None = None,
) -> DataFrame:
    """Persist-once parquet cache: ``build()`` runs only if ``path`` has
    no complete artifact; afterwards every caller gets a plain parquet
    scan (predicate pushdown, column pruning, zero recompute).

    ``partition_by`` lays the artifact out hive-partitioned on those
    columns — pass it when the serving read path filters/joins on them
    (e.g. IVF inverted lists partitioned by ``cell``: a probe query's
    scan then prunes to nprobe/nlist of the files instead of reading
    the corpus-sized table).  At 100 TB the partition layout IS the
    index; an unpartitioned lists table degenerates every query to a
    full-corpus scan.

    Completeness is the parquet ``_SUCCESS`` marker; the build writes to
    a PER-BUILDER temp dir (pid + counter — two racing builders never
    share a staging directory, so neither can install the other's
    half-written files) and atomically renames into place, so a killed
    build leaves nothing a later reader would mistake for the artifact.
    If the rename loses a race to a completed sibling build, that
    sibling's artifact is served (identical by determinism) and ours is
    dropped.
    """
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        _install_atomic(build(), path, partition_by=partition_by)
    out = read_table(spark, path)
    if not os.path.exists(os.path.join(path, _SCHEMA_SIDECAR)):
        # self-healing: pre-sidecar artifacts gain one on first read, so
        # a later delete-all rewrite can carry it
        _write_schema_sidecar(path, out)
    return out


def _install_atomic(
    df: DataFrame,
    path: str,
    single_file: bool = False,
    partition_by: tuple[str, ...] | None = None,
    overwrite: bool = False,
) -> None:
    """Write ``df`` to a PER-BUILDER staging dir (pid + counter — two
    racing builders never share one, so neither can install the other's
    half-written files) and atomically rename into ``path``.

    Default semantics are WRITE-IF-ABSENT: if the rename loses a race to
    a completed sibling build, the sibling's artifact is served
    (identical by determinism — the :func:`cached_parquet` contract) and
    ours is dropped.  ``overwrite=True`` is for explicit ``save_*``
    calls (a RETRAINED index saved to the same path must replace the old
    artifact, not be silently discarded in its favor): the existing
    artifact is renamed aside, the fresh one installed, then the
    renamed-away old deleted — see the inline comment for the exact
    (near-atomic) guarantees.

    ``partition_by`` hive-partitions the artifact on those columns (the
    ``_SUCCESS`` marker still lands at the top level, so completeness
    detection is unchanged).  Every artifact writer routes through here
    — a direct ``mode("overwrite")`` to the final path would expose a
    torn artifact under a stale ``_SUCCESS`` to concurrent readers."""
    suffix = _staging_suffix()
    tmp = f"{path}.__building__{suffix}"
    shutil.rmtree(tmp, ignore_errors=True)
    writer = (df.coalesce(1) if single_file else df).write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(tmp)
    # schema sidecar inside the staging dir, so even an INITIALLY empty
    # artifact (zero data files) installs readable via read_table
    _write_schema_sidecar(tmp, df)
    if overwrite:
        # explicit save of (re)trained data: the fresh artifact wins.
        # Swap by renaming the OLD artifact aside first, then installing
        # the new one, then deleting the renamed-away old — so the
        # artifact-absent window is two rename syscalls, not a
        # corpus-sized rmtree (the previous rmtree-then-replace left the
        # path empty for the whole delete, racing readers saw NO
        # artifact, and two racing overwriters could delete each other's
        # freshly installed build).  NOT fully atomic: a reader listing
        # the path exactly between the two renames still misses (POSIX
        # has no portable dir-exchange) — a miss triggers a spurious
        # rebuild, never a torn read, because _SUCCESS only ever exists
        # on a complete artifact.  A racing overwriter that re-creates
        # ``path`` between our renames makes os.replace fail ENOTEMPTY;
        # retry renames the racer's (complete, equivalent) artifact
        # aside and installs ours — nobody's install is ever deleted
        # mid-swap.
        renamed: list[str] = []
        for attempt in (0, 1):
            old = f"{path}.__old__{suffix}_{attempt}"
            try:
                os.replace(path, old)
                renamed.append(old)
            except FileNotFoundError:
                pass  # first-ever save: nothing to rename aside
            try:
                os.replace(tmp, path)
                break
            except OSError:
                if attempt:
                    # both install attempts failed: put the last
                    # renamed-aside (still valid) artifact back before
                    # propagating, so a transient failure degrades to
                    # "overwrite didn't happen", not "no artifact at
                    # path until prune_stale_artifacts runs"
                    if renamed:
                        try:
                            os.replace(renamed.pop(), path)
                        except OSError:
                            pass  # restore is best-effort
                    raise
        for old in renamed:
            shutil.rmtree(old, ignore_errors=True)
        return
    _promote_staging(tmp, path)


def _promote_staging(tmp: str, path: str) -> None:
    """Write-if-absent install of a completed staging dir: atomically
    rename ``tmp`` into ``path`` unless a racing builder already
    installed a complete artifact there (then serve theirs — identical
    by determinism — and drop ours).

    RENAME-FIRST, never check-then-delete: a live ``path`` is only ever
    MOVED ASIDE (one atomic ``os.replace`` to an ``__old__`` name, which
    :func:`prune_stale_artifacts` sweeps) when it looks like a crash
    corpse (present but without ``_SUCCESS``, and a fresh rename still
    fails) — never rmtree'd in place.  The distinction matters in one
    narrow race: a racing builder completing its install between our
    ``_SUCCESS`` check and the sweep.  An in-place rmtree would delete
    the racer's live, complete artifact file-by-file while readers may
    be on it; the rename-aside keeps it intact (open handles keep
    working), and our retry immediately re-installs identical content
    at ``path`` — determinism makes the two artifacts interchangeable,
    so no reader ever observes deleted data, only (transiently) a
    missing listing, which triggers a spurious rebuild at worst."""
    corpse: str | None = None
    for attempt in (0, 1):
        try:
            os.rename(tmp, path)  # fails if path exists (ENOTEMPTY)
            if corpse is not None:
                shutil.rmtree(corpse, ignore_errors=True)
            return
        except OSError:
            if os.path.exists(os.path.join(path, "_SUCCESS")):
                shutil.rmtree(tmp, ignore_errors=True)  # lost the race
                return
            if attempt == 0 and os.path.exists(path):
                # suspected torn corpse from a crashed builder: move it
                # aside atomically and retry the install; the aside dir
                # is removed after our install succeeds, or swept later
                # by prune_stale_artifacts ('__old__' match) if we fail
                corpse = f"{path}.__old__corpse_{os.getpid()}"
                try:
                    os.replace(path, corpse)
                except OSError:
                    corpse = None  # a racer swept/replaced it; retry decides
                continue
            raise


def append_partitioned_artifact(
    spark: SparkSession,
    old_path: str,
    new_path: str,
    build: Callable[[], DataFrame],
    partition_by: tuple[str, ...] | None = None,
) -> DataFrame:
    """INCREMENTAL artifact maintenance: derive the new corpus
    version's artifact from the previous version's artifact plus an
    increment, without rescanning the old corpus.

    A daily crawl increment at 100 TB must not re-encode the whole
    corpus: the dedup side already has this contract
    (``minhash_dedup_against`` / ``duplicate_spans_against`` process
    only the increment against a stored reference); this is the ANN
    side's counterpart for the persisted data-half tables
    (:func:`...similarity.ivf_invert` lists,
    :func:`...similarity.ivf_sq_invert` code lists,
    :func:`...similarity.sq_encode` codes) — all append-only by
    construction, because a new vector's cell/codes never depend on
    other vectors once the TRAINED half (quantizer/codebooks) is
    pinned.  Appending under a retrained quantizer would be wrong —
    that is a rebuild, by definition.

    Mechanics: the old artifact's data files are HARDLINKED (fallback:
    copied) into a per-builder staging dir — a metadata operation on a
    shared filesystem, the moral equivalent of an object store's
    server-side copy — then ``build()`` (a DataFrame over ONLY the
    increment's rows; the old corpus is not an input) is written in
    append mode into the same partition layout (new parquet files land
    inside existing ``cell=`` dirs), and the staging dir installs at
    ``new_path`` with the write-if-absent contract.  ``new_path`` is
    normally :func:`artifact_path` under the NEW corpus fingerprint,
    so readers of the old version are never disturbed and the
    old-fingerprint dir is later swept by
    :func:`prune_stale_artifacts`.

    Returns the appended artifact as a DataFrame (plain parquet scan).
    """
    if not os.path.exists(os.path.join(old_path, "_SUCCESS")):
        raise ValueError(
            f"append_partitioned_artifact: no complete artifact at "
            f"{old_path} — build the base version first (cached_parquet)"
        )
    if os.path.exists(os.path.join(new_path, "_SUCCESS")):
        return read_table(spark, new_path)
    tmp = f"{new_path}.__building__{_staging_suffix()}"
    shutil.rmtree(tmp, ignore_errors=True)
    for dirpath, dirnames, filenames in os.walk(old_path):
        rel = os.path.relpath(dirpath, old_path)
        dst_dir = os.path.join(tmp, rel) if rel != "." else tmp
        os.makedirs(dst_dir, exist_ok=True)
        for name in filenames:
            if "_SUCCESS" in name:  # marker + its .crc sidecar: the
                continue  # append job writes its own completion marker
            if name.startswith("._schema_tmp."):
                continue  # a crashed sidecar write's temp — never carry
            src = os.path.join(dirpath, name)
            dst = os.path.join(dst_dir, name)
            try:
                os.link(src, dst)
            except OSError:
                shutil.copy2(src, dst)
    writer = build().write.mode("append")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(tmp)
    _promote_staging(tmp, new_path)
    return read_table(spark, new_path)


def rewrite_partitioned_artifact(
    spark: SparkSession,
    old_path: str,
    new_path: str,
    build: Callable[[], DataFrame],
    dirty: "list",
    partition_col: str = "cell",
    partition_by: tuple[str, ...] | None = None,
) -> DataFrame:
    """SELECTIVE partition rewrite — the shared primitive under
    :func:`delete_from_partitioned_artifact` and
    :func:`compact_epoch_artifact`: derive a new artifact version in
    which only the ``dirty`` partitions' contents change.

    Clean partitions' data files are HARDLINKED across (fallback:
    copied — a metadata operation, like :func:`append_partitioned_
    artifact`'s carry-over); the top-level ``{partition_col}=v`` dirs
    for ``v`` in ``dirty`` are NOT carried, and ``build()`` — a
    DataFrame containing exactly the dirty partitions' replacement rows
    (possibly zero rows: a fully-deleted partition simply has no dir in
    the new version) — is appended into the staging dir in the same
    partition layout, then installed with the write-if-absent contract.

    At 100 TB this selectivity is the point: a delete or an epoch-fold
    touches a handful of cells, and rewriting the whole corpus-sized
    lists table to change three cells would dwarf the operation itself.

    ``dirty`` values must round-trip to their hive directory names via
    ``str()`` (ints and plain strings — the cell-id case; values hive
    would percent-escape need the escaped form).
    """
    if not os.path.exists(os.path.join(old_path, "_SUCCESS")):
        raise ValueError(
            f"rewrite_partitioned_artifact: no complete artifact at "
            f"{old_path} — build the base version first (cached_parquet)"
        )
    if os.path.exists(os.path.join(new_path, "_SUCCESS")):
        return read_table(spark, new_path)
    tmp = f"{new_path}.__building__{_staging_suffix()}"
    shutil.rmtree(tmp, ignore_errors=True)
    skip = {f"{partition_col}={v}" for v in dirty}
    for dirpath, dirnames, filenames in os.walk(old_path):
        rel = os.path.relpath(dirpath, old_path)
        if rel != "." and rel.split(os.sep, 1)[0] in skip:
            continue
        dst_dir = os.path.join(tmp, rel) if rel != "." else tmp
        os.makedirs(dst_dir, exist_ok=True)
        for name in filenames:
            if "_SUCCESS" in name:  # marker + crc: rewrite job re-writes
                continue
            if name.startswith("._schema_tmp."):
                continue  # a crashed sidecar write's temp — never carry
            src = os.path.join(dirpath, name)
            dst = os.path.join(dst_dir, name)
            try:
                os.link(src, dst)
            except OSError:
                shutil.copy2(src, dst)
    rep = build()
    writer = rep.write.mode("append")
    writer = writer.partitionBy(*(partition_by or (partition_col,)))
    writer.parquet(tmp)
    # per-version schema record — makes a delete-all version (zero data
    # files) readable; must replace, not write through, the hardlink
    # the carry loop brought over (see _write_schema_sidecar)
    _write_schema_sidecar(tmp, rep)
    _promote_staging(tmp, new_path)
    return read_table(spark, new_path)


def delete_from_partitioned_artifact(
    spark: SparkSession,
    old_path: str,
    new_path: str,
    delete_ids: DataFrame,
    id_col: str = "vec_id",
    partition_col: str = "cell",
) -> DataFrame:
    """Targeted DELETE from a persisted partitioned artifact — the
    right-to-be-forgotten path for a serving index: remove the given
    ids' rows from the stored lists/codes table WITHOUT a full-corpus
    rebuild (the remaining vectors' cells/codes are unchanged under the
    pinned quantizer, so re-encoding them would be pure waste).

    Two bounded passes: (1) one scan of the compact artifact,
    semi-joined against the broadcast id set, finds which partitions
    actually contain deleted rows — a ≤``nlist``-row driver transfer;
    (2) ONLY those dirty partitions are re-read (the ``isin`` filter on
    the hive partition column prunes the scan to their directories —
    plan-pinned in tests) and rewritten anti-joined against the id set,
    while every clean partition's files hardlink across untouched
    (:func:`rewrite_partitioned_artifact`).  A partition whose every
    row is deleted disappears entirely.  Deleting ids the artifact does
    not contain is a no-op for them, and an empty dirty set degenerates
    to a pure hardlink carry-over.

    ``new_path`` is a NEW version (old readers undisturbed; the old
    version is later swept by :func:`prune_stale_artifacts`) — the
    same versioning contract as :func:`append_partitioned_artifact`.
    For an UNPARTITIONED artifact there is nothing to prune to: rewrite
    it wholesale with ``cached_parquet`` over an anti-join instead.

    This is the DURABLE form (bytes actually gone).  When a takedown
    must take effect before the next rewrite window, the instant mask
    composes with every serving tier through their ``lists=``/``codes=``
    argument — ``ivf_topk(..., lists=lists.join(F.broadcast(tombstones),
    id_col, "left_anti"))`` filters candidates BEFORE ranking (so k
    never silently shrinks) — and this function retires the tombstone
    list at the next version bump.
    """
    from pyspark.sql import functions as F

    if os.path.exists(os.path.join(new_path, "_SUCCESS")):
        return read_table(spark, new_path)
    if not os.path.exists(os.path.join(old_path, "_SUCCESS")):
        raise ValueError(
            f"delete_from_partitioned_artifact: no complete artifact at "
            f"{old_path} — build the base version first (cached_parquet)"
        )
    old = read_table(spark, old_path)
    ids = F.broadcast(delete_ids.select(id_col).distinct())
    dirty_vals = {
        r[0]
        for r in old.join(ids, id_col, "left_semi")
        .select(partition_col)
        .distinct()
        .collect()
    }
    if None in dirty_vals:
        # same refusal as merge_table: a NULL partition value lands in
        # __HIVE_DEFAULT_PARTITION__, which the str()-keyed skip set
        # cannot name — proceeding would hardlink the dir across intact
        # and the isin([None]) filter would match nothing, SILENTLY
        # keeping the to-be-forgotten rows under a fresh _SUCCESS
        raise ValueError(
            "delete_from_partitioned_artifact: a deleted id's row sits "
            "in a NULL partition (__HIVE_DEFAULT_PARTITION__) — the "
            "partition rewrite cannot address it; repair the artifact's "
            "partition column first"
        )
    dirty = sorted(dirty_vals)

    def _remaining() -> DataFrame:
        if not dirty:  # nothing to delete: zero-row append, pure carry
            return old.limit(0)
        return old.filter(F.col(partition_col).isin(dirty)).join(
            ids, id_col, "left_anti"
        )

    return rewrite_partitioned_artifact(
        spark, old_path, new_path, _remaining, dirty, partition_col
    )


def compact_epoch_artifact(
    spark: SparkSession,
    base_path: str | None,
    epochs_path: str,
    new_path: str,
    partition_col: str = "cell",
) -> DataFrame:
    """Fold streaming-appended ``epoch=<n>/{partition_col}=<c>/`` dirs
    (the :func:`...streaming.incremental.start_incremental_index_append`
    layout) into the flat per-corpus-version artifact — the segment
    merge every streaming-maintained index needs: micro-batches land
    one small file per touched cell per epoch, and at 100 TB the
    serving scan's cost drifts from O(bytes) toward O(files) until the
    epochs are compacted away (``sources/layout.compact_files``'s
    rationale, applied to the index artifact).

    Only the cells the epochs actually touched are rewritten — the
    epochs table's distinct ``partition_col`` set is a bounded
    ≤``nlist``-row transfer, the base's clean cells hardlink across
    (:func:`rewrite_partitioned_artifact`), and each dirty cell's
    base+epoch rows are re-clustered into a single file
    (``repartition(partition_col)``: one task owns all rows of a cell).
    The ``epoch`` level exists only for the sink's replay idempotence;
    it does not survive compaction.  With ``base_path=None`` (an index
    born entirely from the stream) every cell is dirty by definition
    and the fold is a plain re-clustered install.  Contract as always:
    the quantizer must be the SAME pinned one the epochs encoded under
    — folding epochs from a retrained quantizer is corruption, not
    compaction.
    """
    from pyspark.sql import functions as F

    if os.path.exists(os.path.join(new_path, "_SUCCESS")):
        return read_table(spark, new_path)
    epochs = spark.read.parquet(epochs_path).drop("epoch")
    if base_path is None:
        _install_atomic(
            epochs.repartition(F.col(partition_col)),
            new_path,
            partition_by=(partition_col,),
        )
        return read_table(spark, new_path)
    dirty_vals = {
        r[0] for r in epochs.select(partition_col).distinct().collect()
    }
    if None in dirty_vals:
        raise ValueError(
            "compact_epoch_artifact: an epoch row carries a NULL "
            "partition value (__HIVE_DEFAULT_PARTITION__) — the "
            "partition rewrite cannot address it; repair the epochs' "
            "partition column first"
        )
    dirty = sorted(dirty_vals)
    base = spark.read.parquet(base_path)

    def _folded() -> DataFrame:
        merged = base.filter(
            F.col(partition_col).isin(dirty)
        ).unionByName(epochs.select(*base.columns))
        return merged.repartition(F.col(partition_col))

    return rewrite_partitioned_artifact(
        spark, base_path, new_path, _folded, dirty, partition_col
    )


def compact_table_partitions(
    spark: SparkSession,
    old_path: str,
    new_path: str,
    partition_col: str,
    values: "list",
    target_file_bytes: int = 128 * 1024 * 1024,
) -> DataFrame:
    """Partition-SCOPED small-file compaction — ``layout.compact_files``
    for exactly the partitions that accreted files, on the immutable
    version-chain convention instead of a rename-aside swap: the named
    ``values`` partitions are re-read and rewritten into
    ~``target_file_bytes`` files, every other partition's files
    hardlink across, and the result installs atomically as a NEW
    version (old readers undisturbed, prunable later like any
    superseded version).  The standard nightly maintenance shape at
    100 TB: a streaming sink accretes hundreds of small files into
    TODAY's partition — compacting the whole table for one hot
    partition would dwarf the operation.

    Content is IDENTICAL by construction (one round-robin coalesce of
    the same rows); only the file layout changes.  File count is sized
    from the named partitions' actual on-disk bytes (driver-side
    listing arithmetic, same as ``compact_files``).
    """
    from pyspark.sql import functions as F

    if not values:
        raise ValueError("compact_table_partitions: values must be non-empty")
    if os.path.exists(os.path.join(new_path, "_SUCCESS")):
        return read_table(spark, new_path)
    if not os.path.exists(os.path.join(old_path, "_SUCCESS")):
        raise ValueError(
            f"compact_table_partitions: no complete table at {old_path}"
        )
    vals = sorted(values)
    missing_dirs = [
        v
        for v in vals
        if not os.path.isdir(os.path.join(old_path, f"{partition_col}={v}"))
    ]
    if missing_dirs:
        raise ValueError(
            f"compact_table_partitions: no partition dirs for "
            f"{partition_col}={missing_dirs} under {old_path}"
        )
    # size PER VALUE, not across the call: one round-robin repartition
    # over all values would scatter every value across every task, and
    # the partitionBy write then emits one file per (task, value) —
    # up to n_files × len(values) small files, the exact fragmentation
    # this verb exists to fix.  Each value folds independently to its
    # own size-derived count instead.
    n_files_by_val = {}
    for v in vals:
        pdir = os.path.join(old_path, f"{partition_col}={v}")
        part_bytes = 0
        for root, _, names in os.walk(pdir):
            for n in names:
                if n.endswith(".parquet"):
                    part_bytes += os.path.getsize(os.path.join(root, n))
        n_files_by_val[v] = max(
            1, -(-part_bytes // int(target_file_bytes))
        )

    def _compacted() -> DataFrame:
        base = read_table(spark, old_path)
        out = None
        for v in vals:
            part = base.filter(F.col(partition_col) == v).repartition(
                int(n_files_by_val[v])
            )
            out = part if out is None else out.unionByName(part)
        return out

    return rewrite_partitioned_artifact(
        spark, old_path, new_path, _compacted, vals, partition_col
    )


def merge_table(
    spark: SparkSession,
    old_path: str,
    new_path: str,
    source: DataFrame,
    key_cols: "tuple[str, ...]",
    partition_col: str,
    when_matched: str = "update",
    when_not_matched: str = "insert",
    broadcast_source_max: int = 4_000_000,
    seq_col: str | None = None,
    schema_evolution: bool = False,
) -> DataFrame:
    """Delta-style MERGE/upsert on a plain hive-partitioned parquet
    table — :func:`rewrite_partitioned_artifact` generalized from index
    maintenance to data tables: the ``whenMatchedUpdate`` /
    ``whenNotMatchedInsert`` surface (the reference's M1-M4 sync
    actions, ``src/DataWarehouse.js:235-291``, as a bulk table rewrite
    instead of per-row RPCs — :mod:`..operators.reconcile` classifies;
    this APPLIES).

    Semantics (``MERGE INTO target USING source ON keys``):

    - matched target row  → replaced by the source row
      (``when_matched="update"``) or removed (``"delete"``)
    - unmatched source row → inserted (``when_not_matched="insert"``)
      or dropped (``"ignore"``)
    - unmatched target row → carried unchanged

    Source rows are whole replacement rows (same columns as the
    target, ``partition_col`` included), so an update may MOVE a row
    across partitions — both the old row's partition and the new one
    are rewritten.  Duplicate source keys are rejected loudly (two
    source rows matching one target row is nondeterministic — the same
    contract Delta enforces).

    Partition-scoped copy-on-write, the 100 TB shape: one scan of the
    target semi-joined against the broadcast source keys finds the
    partitions holding matched rows (a ≤|partitions|-row driver
    transfer); the dirty set is those plus the source rows' own
    partition values (where rows land); ONLY dirty partitions are
    re-read (hive pruning) and rewritten via the anti-join survivor
    pattern, every clean partition's files hardlink across, and the
    result installs atomically under the write-if-absent contract
    (``new_path`` is a new version; old readers are undisturbed).  A
    daily CDC batch touching 3 of 10k date partitions rewrites 3.

    Re-applying the same upsert batch to its own output is a no-op by
    construction (every source row matches and updates to itself) —
    the idempotent-replay contract of the keyed JDBC upsert
    (``sources/jdbc.py``), pinned in tests.  Returns the merged table.

    ``seq_col`` (optional) makes the merge MONOTONIC per key: a
    matched source row takes effect only when its sequence value is
    STRICTLY greater than the target row's — a replayed or reordered
    upstream batch carrying a stale event can never regress a row the
    table has already advanced past (``when_matched="update"`` keeps
    the max-seq row; ``"delete"`` only deletes forward).  Unmatched
    source rows insert regardless (no tombstones: a delete removes the
    row AND its sequence, so an upsert older than an applied delete
    re-inserts — replaying whole epochs through the version chain's
    write-if-absent short-circuit stays exact; arbitrary cross-stream
    interleaving needs tombstone retention, out of scope).  Requires
    ``seq_col`` to be a target column (outside the key/partition) with
    key-unique target rows among matched keys.

    ``schema_evolution=True`` accepts a source whose schema is a
    SUPERSET of the target's — the common production evolution (the
    upstream grew a column): added columns join the table with every
    pre-existing target row back-filled NULL, while dropped or retyped
    columns still refuse loudly (both lose data silently).  Because a
    plain parquet table carries its schema in file footers (not a log),
    an evolution batch rewrites every partition once so no hardlinked
    clean file keeps the old footer schema; merges after that are
    partition-scoped again.  The ingestion layer's ``mergeSchema``
    (``sources/textfiles.py``) handles the same evolution on read —
    this is the write-side mirror.
    """
    from pyspark.sql import functions as F

    if when_matched not in ("update", "delete"):
        raise ValueError(f"when_matched must be update|delete, got {when_matched!r}")
    if when_not_matched not in ("insert", "ignore"):
        raise ValueError(
            f"when_not_matched must be insert|ignore, got {when_not_matched!r}"
        )
    if os.path.exists(os.path.join(new_path, "_SUCCESS")):
        return read_table(spark, new_path)
    if not os.path.exists(os.path.join(old_path, "_SUCCESS")):
        raise ValueError(
            f"merge_table: no complete table at {old_path} — build the "
            "base version first (cached_parquet)"
        )
    target = read_table(spark, old_path)
    base_cols = list(target.columns)
    missing = [c for c in base_cols if c not in source.columns]
    if missing:
        raise ValueError(
            f"merge_table: source lacks target columns {missing}"
            + (
                " — schema_evolution accepts ADDED source columns only; "
                "dropping a target column loses data and needs an "
                "explicit rewrite"
                if schema_evolution
                else ""
            )
        )
    # shared columns must keep their exact type in BOTH modes: a
    # retyped column would write dirty partitions with the new parquet
    # footer type while clean partitions hardlink across with the old
    # one — the committed version then reads intermittently (one-footer
    # schema inference picks a side at random and the other side's
    # files fail conversion).  Refuse loudly instead.
    src_types = {f.name: f.dataType for f in source.schema.fields}
    tgt_types = {f.name: f.dataType for f in target.schema.fields}
    retyped = [
        f"{c}: target {tgt_types[c].simpleString()} vs source "
        f"{src_types[c].simpleString()}"
        for c in base_cols
        if src_types[c] != tgt_types[c]
    ]
    if retyped:
        raise ValueError(
            "merge_table: source retypes target columns "
            f"[{'; '.join(retyped)}] — a retyped shared column would "
            "leave mixed parquet footer types across partitions; cast "
            "the source back first"
        )
    added: "list[str]" = []
    if schema_evolution:
        # the common production evolution: the source grew columns —
        # they join the schema with target rows back-filled NULL
        added = [c for c in source.columns if c not in base_cols]
        for c in added:
            target = target.withColumn(c, F.lit(None).cast(src_types[c]))
    source = source.select(*target.columns)
    keys = list(key_cols)
    if seq_col is not None and (
        seq_col not in base_cols
        or seq_col in keys
        or seq_col == partition_col
    ):
        raise ValueError(
            f"merge_table: seq_col {seq_col!r} must be a target data "
            "column (not a key, not the partition column)"
        )

    # the whole plan broadcasts the source key set twice (dirty-partition
    # probe + survivor anti-join); a corpus-sized "source" would OOM the
    # executors instead of refusing — the same loud-refusal contract as
    # broadcast_new_max (dedup.py) / broadcast_queries_max
    # (similarity.py).  A bounded limit(n+1) probe, never a full count —
    # and it runs BEFORE the checkpoint below, so a corpus-sized source
    # refuses without ever being materialized.
    if (
        source.select(*keys)
        .limit(broadcast_source_max + 1)
        .count()
        > broadcast_source_max
    ):
        raise ValueError(
            f"merge_table: source exceeds broadcast_source_max="
            f"{broadcast_source_max} rows — the merge broadcasts the "
            "source key set to prune dirty partitions, which only "
            "scales for CDC-batch-sized sources. Split the source into "
            "bounded batches (the merge is idempotent per batch), or "
            "raise broadcast_source_max if the driver/executors have "
            "the memory for the larger key set."
        )
    # materialize the (bounded, CDC-batch-sized) source ONCE: the
    # guards below plus the dirty probes plus the rewrite itself are
    # 4-5 separate actions, and an expensive source plan (table_diff's
    # fact-vs-fact full outer join — this module's own advertised CDC
    # loop) would otherwise re-execute per action
    source = source.localCheckpoint()
    # duplicate source keys → nondeterministic merge; NULL keys →
    # unmatched-forever rows that re-insert on every replay; NULL
    # partition values → hive's __HIVE_DEFAULT_PARTITION__ dir, which
    # the str()-keyed skip set cannot name (silent row duplication).
    # All refuse loudly — bounded probes over the checkpointed source.
    dup = source.groupBy(*keys).count().filter(F.col("count") > 1).limit(1).count()
    if dup:
        raise ValueError(
            "merge_table: duplicate keys in source — two source rows "
            "matching one target row is nondeterministic"
        )
    null_pred = F.lit(False)
    for c in (*keys, partition_col, *((seq_col,) if seq_col else ())):
        null_pred = null_pred | F.col(c).isNull()
    if source.filter(null_pred).limit(1).count():
        raise ValueError(
            "merge_table: NULL key or partition (or sequence) value in "
            "source — NULL keys never match (non-idempotent re-insert), "
            "NULL partitions land in __HIVE_DEFAULT_PARTITION__, which "
            "the partition rewrite cannot address, and a NULL sequence "
            "cannot order against the target; coalesce them first"
        )
    src_keys = F.broadcast(source.select(*keys).distinct())

    # dirty = partitions holding matched target rows (rows leave) ∪
    # partitions source rows land in (rows arrive) — the landing side
    # only matters when rows actually land
    dirty_vals = set(
        r[0]
        for r in target.join(src_keys, keys, "left_semi")
        .select(partition_col)
        .distinct()
        .collect()
    )
    if None in dirty_vals:
        raise ValueError(
            "merge_table: a matched target row sits in a NULL partition "
            "(__HIVE_DEFAULT_PARTITION__) — the partition rewrite cannot "
            "address it; repair the table's partition column first"
        )
    if when_matched == "update" or when_not_matched == "insert":
        dirty_vals.update(
            r[0] for r in source.select(partition_col).distinct().collect()
        )
    if added:
        # an added column changes the TABLE schema, not just dirty
        # rows: a clean partition's hardlinked files would keep the old
        # footer schema, and a plain parquet read (one-footer schema
        # inference) would then see the new column only intermittently.
        # An evolution batch therefore rewrites EVERY partition once —
        # the plain-parquet cost of what Delta records in its log;
        # subsequent merges are partition-scoped again.  The distinct
        # is partition-count-bounded, the same class as the dirty probe.
        tgt_parts = {
            r[0]
            for r in target.select(partition_col).distinct().collect()
        }
        if None in tgt_parts:
            raise ValueError(
                "merge_table: a target row sits in a NULL partition "
                "(__HIVE_DEFAULT_PARTITION__) — the partition rewrite "
                "cannot address it; repair the table's partition column "
                "first"
            )
        dirty_vals.update(tgt_parts)
    dirty = sorted(dirty_vals)

    def _replacement() -> DataFrame:
        if not dirty:  # empty source batch: pure hardlink carry-over
            return target.limit(0)
        dirty_t = target.filter(F.col(partition_col).isin(dirty))
        if seq_col is not None:
            return _seq_replacement(dirty_t)
        survivors = dirty_t.join(src_keys, keys, "left_anti")
        if when_matched == "update" and when_not_matched == "insert":
            landing = source  # every source row lands, matched or not
        elif when_matched == "delete" and when_not_matched == "ignore":
            landing = source.limit(0)  # nothing lands
        else:
            # which source rows matched?  NEVER against the full target
            # (its key set is corpus-sized): matched target rows can
            # only live in dirty partitions, so a PRUNED scan against
            # the broadcast source keys yields the matched-key set —
            # bounded by |source|, hence itself broadcastable
            matched = F.broadcast(
                target.filter(F.col(partition_col).isin(dirty))
                .join(src_keys, keys, "left_semi")
                .select(*keys)
                .distinct()
            )
            how = "left_semi" if when_matched == "update" else "left_anti"
            landing = source.join(matched, keys, how)
        return survivors.unionByName(landing)

    def _seq_replacement(dirty_t: DataFrame) -> DataFrame:
        # monotonic merge: each matched (target, source) pair resolves
        # by sequence — source takes effect only when strictly newer.
        # Both probe tables stay |source|-bounded broadcasts: the
        # target side of every comparison is the PRUNED dirty scan
        # semi-joined down to matched keys first.
        matched_t = dirty_t.join(src_keys, keys, "left_semi")
        if (
            matched_t.groupBy(*keys)
            .count()
            .filter(F.col("count") > 1)
            .limit(1)
            .count()
        ):
            raise ValueError(
                "merge_table: seq_col requires key-unique target rows "
                "among matched keys — a duplicate-key target makes the "
                "per-key sequence comparison ambiguous"
            )
        # the source side's NULL-seq guard runs up front; the TARGET
        # side needs the mirror check — a matched target row with a
        # NULL sequence would otherwise corrupt silently (the >=/<
        # predicates evaluate to NULL so the row drops from survivors,
        # and the landing side's __tgt_seq.isNull() misreads 'matched
        # but NULL seq' as 'unmatched', re-inserting the STALE source
        # row under when_not_matched='insert' or vanishing the key
        # entirely under 'ignore').  Same bounded limit(1) probe over
        # the pruned matched scan as the uniqueness guard above.
        if matched_t.filter(F.col(seq_col).isNull()).limit(1).count():
            raise ValueError(
                "merge_table: NULL seq_col value in a MATCHED target "
                "row — a NULL sequence cannot order against the source "
                "(the row would silently drop or regress); coalesce "
                "the target's sequence column first"
            )
        src_seq = F.broadcast(
            source.select(*keys, F.col(seq_col).alias("__src_seq"))
        )
        survivors = (
            dirty_t.join(src_seq, keys, "left")
            .filter(
                F.col("__src_seq").isNull()
                | (F.col(seq_col) >= F.col("__src_seq"))
            )
            .drop("__src_seq")
        )
        tgt_seq = F.broadcast(
            matched_t.select(*keys, F.col(seq_col).alias("__tgt_seq"))
        )
        sj = source.join(tgt_seq, keys, "left")
        wins = sj.filter(
            F.col("__tgt_seq").isNotNull()
            & (F.col(seq_col) > F.col("__tgt_seq"))
        ).drop("__tgt_seq")
        landing = wins if when_matched == "update" else wins.limit(0)
        if when_not_matched == "insert":
            landing = landing.unionByName(
                sj.filter(F.col("__tgt_seq").isNull()).drop("__tgt_seq")
            )
        return survivors.unionByName(landing)

    return rewrite_partitioned_artifact(
        spark, old_path, new_path, _replacement, dirty, partition_col
    )


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: "tuple[str, ...]",
    delete_col: str = "is_del",
    check_unique: bool = True,
    schema_evolution: bool = False,
) -> DataFrame:
    """Change-data capture BETWEEN two table versions — the INVERSE of
    :func:`merge_table`, closing the version chain's loop: the minimal
    change set (whole replacement rows + ``delete_col``) whose
    application onto ``old`` reproduces ``new`` exactly (round trip
    pinned in tests).  The reference computes row diffs to derive sync
    actions (``src/DataWarehouse.js:235-291``, per-row in one heap);
    this is that classification as ONE distributed pass, emitting the
    feed :func:`...streaming.incremental.start_cdc_apply` consumes —
    snapshot-to-snapshot replication when the upstream offers no
    change log.

    Classification per key (null-safe on every data column):

    - key only in ``new``                       → upsert (insert)
    - key in both, any data column differing    → upsert (update)
    - key only in ``old``                       → delete row (old
      payload, ignored by the merge beyond the key)
    - key in both, rows identical               → NOT in the diff

    Scale shape: data columns collapse into ONE struct per side before
    the join, so the full-outer join shuffles (key, struct) rows once
    per side — a fact⋈fact sort-merge, the irreducible cost of an
    exact diff; the struct equality is a codegen'd null-safe compare,
    no per-column join conditions.  At 100 TB diff partition-pruned
    slices (date ranges) rather than whole snapshots.  NULL keys
    refuse loudly (they never join, so both sides' rows would
    misclassify as delete + insert); duplicate keys refuse loudly
    under ``check_unique`` (one extra agg pass per side — pass
    ``check_unique=False`` only when uniqueness is guaranteed
    upstream, e.g. both versions came out of ``merge_table``).

    ``schema_evolution=True`` accepts a ``new`` version whose schema is
    a SUPERSET of ``old``'s (the upstream grew a column): ``old`` is
    widened with NULL, so a row whose only change is a non-NULL value
    in the added column classifies as an upsert, and the emitted diff
    carries the widened schema — feed it to
    ``merge_table(schema_evolution=True)`` to replicate the evolution
    (round trip pinned in tests).  Dropped/retyped columns refuse
    loudly; column order is by-name.
    """
    from pyspark.sql import functions as F

    if schema_evolution:
        dropped = [c for c in old.columns if c not in new.columns]
        if dropped:
            raise ValueError(
                f"table_diff: new version lacks columns {dropped} — "
                "schema evolution adds columns, never drops them"
            )
        o_types = {f.name: f.dataType for f in old.schema.fields}
        n_types = {f.name: f.dataType for f in new.schema.fields}
        retyped = [
            f"{c}: old {o_types[c].simpleString()} vs new "
            f"{n_types[c].simpleString()}"
            for c in old.columns
            if n_types[c] != o_types[c]
        ]
        if retyped:
            raise ValueError(
                f"table_diff: new version retypes columns "
                f"[{'; '.join(retyped)}] — schema evolution adds "
                "columns, never changes existing types"
            )
        for c in new.columns:
            if c not in o_types:
                old = old.withColumn(c, F.lit(None).cast(n_types[c]))
        new = new.select(*old.columns)
    elif old.columns != new.columns:
        raise ValueError(
            f"table_diff: column mismatch {old.columns} vs {new.columns}"
        )
    keys = list(key_cols)
    if delete_col in old.columns:
        raise ValueError(
            f"table_diff: {delete_col!r} collides with a data column"
        )
    data_cols = [c for c in old.columns if c not in keys]
    if not data_cols:
        raise ValueError("table_diff: no data columns outside the key")
    null_pred = F.lit(False)
    for c in keys:
        null_pred = null_pred | F.col(c).isNull()
    for side, df in (("old", old), ("new", new)):
        if df.filter(null_pred).limit(1).count():
            raise ValueError(
                f"table_diff: NULL key in {side} — NULL keys never join, "
                "so the row would misclassify as delete + insert"
            )
        if check_unique and (
            df.groupBy(*keys).count().filter(F.col("count") > 1).limit(1).count()
        ):
            raise ValueError(
                f"table_diff: duplicate keys in {side} — a keyed diff "
                "needs key-unique versions"
            )
    o = old.select(*keys, F.struct(*data_cols).alias("__o"))
    n = new.select(*keys, F.struct(*data_cols).alias("__n"))
    # ONE pass over the joined frame — a union of per-class filters
    # would re-execute the join once per class (Spark does not share
    # common subtrees across union branches); instead classify with a
    # flag column and pick the payload struct with a CASE
    return (
        o.join(n, keys, "full_outer")
        .filter(F.col("__n").isNull() | ~F.col("__n").eqNullSafe(F.col("__o")))
        .withColumn(delete_col, F.col("__n").isNull())
        .withColumn(
            "__r",
            F.when(F.col(delete_col), F.col("__o")).otherwise(F.col("__n")),
        )
        .select(*keys, "__r.*", delete_col)
        .select(*old.columns, delete_col)
    )


_POINTER_NAME = "_cdc_current"
_RUN_MARKER = "_cdc_run"


def claim_versions_root(versions_root: str, checkpoint: str) -> None:
    """Bind a CDC/SCD2 version chain to the ONE streaming checkpoint
    that builds it.  Version dirs are keyed by foreachBatch epoch id,
    and epoch numbering restarts at 0 under a fresh checkpoint — so a
    new stream pointed at an EXISTING ``versions_root`` would find
    ``v0_final`` already complete, short-circuit on its ``_SUCCESS``,
    and swap the current pointer BACK onto stale data: silent loss.
    This claims the root with a ``_cdc_run`` marker holding the owning
    checkpoint's absolute path and refuses loudly on mismatch.

    Wiping the checkpoint but keeping its PATH stays legal (the
    full-replay contract: every epoch re-derives identically from the
    same source and short-circuits); only a DIFFERENT checkpoint
    against a populated chain is the corruption shape.
    """
    os.makedirs(versions_root, exist_ok=True)
    ident = os.path.abspath(checkpoint)
    marker = os.path.join(versions_root, _RUN_MARKER)
    if os.path.exists(marker):
        with open(marker) as fh:
            owner = fh.read().strip()
        if owner == "":
            # torn claim: a claimant died between the O_EXCL create and
            # the content write+fsync below, leaving an empty marker.
            # No stream ever ran against this root under that claim (the
            # claimant raises before touching versions if it can't
            # finish the marker), so reclaiming is safe — but require a
            # human in the loop rather than silently stealing the lock
            # (two LIVE claimants both seeing the torn marker must not
            # both auto-reclaim).
            raise ValueError(
                f"versions_root {versions_root} holds a torn claim (an "
                "empty _cdc_run marker — a claimant crashed between "
                "creating and writing it, or a LIVE claimant is inside "
                "that instant right now). After confirming no claimant "
                f"is mid-start, remove {marker} and retry."
            )
        if owner != ident:
            raise ValueError(
                f"versions_root {versions_root} belongs to the stream "
                f"checkpointed at {owner!r}; starting a stream with "
                f"checkpoint {ident!r} against it would reuse stale "
                "epoch-numbered versions and roll the current pointer "
                "back. Point the new stream at a fresh versions_root, "
                "or resume the original checkpoint path."
            )
        return
    if any(d.startswith("v") for d in os.listdir(versions_root)):
        raise ValueError(
            f"versions_root {versions_root} already holds version dirs "
            "but no _cdc_run marker (pre-claim layout). If this "
            "checkpoint is genuinely the stream that built them, write "
            f"the marker first: echo {ident!r} > "
            f"{os.path.join(versions_root, _RUN_MARKER)}"
        )
    # two streams racing to claim an empty root: O_CREAT|O_EXCL makes
    # the create itself the arbiter — exactly one claimant's open
    # succeeds, the other fails AT CREATE TIME.  (The previous
    # write-tmp + os.replace + re-read only caught one interleaving:
    # under A-replace → A-verify → B-replace → B-verify both streams
    # verified their own marker and proceeded to interleave version
    # writes.)
    try:
        fd = os.open(marker, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        raise ValueError(
            f"versions_root {versions_root} was claimed concurrently "
            "by another stream — one chain has exactly one writer"
        ) from None
    try:
        os.write(fd, ident.encode())
        os.fsync(fd)
    finally:
        os.close(fd)
    # belt-and-suspenders: the exclusive create above is the real
    # arbiter; a content mismatch here would mean filesystem semantics
    # broke, and proceeding would interleave version writes
    with open(marker) as fh:
        if fh.read().strip() != ident:
            raise ValueError(
                f"versions_root {versions_root} was claimed concurrently "
                "by another stream — one chain has exactly one writer"
            )


def read_version_pointer(versions_root: str, default: str | None = None) -> str:
    """The current-version pointer of a CDC version chain — ONE reader
    shared by the streaming appliers and the pruner, so the protocol
    (strip, default fallback) cannot drift between copies."""
    pointer = os.path.join(versions_root, _POINTER_NAME)
    if os.path.exists(pointer):
        with open(pointer) as fh:
            return fh.read().strip()
    if default is None:
        raise ValueError(f"no version pointer at {pointer} and no default")
    return default


class VersionConflictError(ValueError):
    """A compare-and-swap on the current-version pointer lost the race:
    the pointer moved between the caller's read and its swap.  The
    caller's new version directory is intact but UNPUBLISHED — re-read
    the pointer, re-merge against the winner's version, and retry."""


def swap_version_pointer(
    versions_root: str, target: str, expected: str | None = None
) -> None:
    """Atomically point the chain at ``target`` (tmp write + one
    ``os.replace`` — readers see the old or the new pointer, never a
    torn one).

    ``expected=None`` (default) is the unconditional swap for the
    SINGLE-writer streaming appliers, whose exclusivity
    :func:`claim_versions_root` already arbitrates.

    ``expected=<pointer the merge read>`` is the optimistic-concurrency
    commit for BATCH writers, where nothing else serializes two
    concurrent ``merge_table`` callers targeting one chain: the swap
    succeeds only if the pointer still equals what this writer's merge
    was based on; otherwise it raises :class:`VersionConflictError` and
    the chain keeps the winner's pointer (last-writer-wins silent loss
    becomes first-writer-wins loud refusal — the Delta/Iceberg commit
    protocol on a plain-parquet chain).  A pointer file that does not
    exist yet compares equal to ``expected`` (the not-yet-swapped chain
    serves its base; callers read via
    ``read_version_pointer(root, default=base)`` and pass that same
    value back).  The compare-and-replace pair is serialized by an
    ``O_CREAT|O_EXCL`` lock file, held for two metadata ops — if a
    writer dies inside that window the lock leaks and every later CAS
    refuses loudly (never silently steals); remove the named lock file
    after confirming no writer is live.
    """
    pointer = os.path.join(versions_root, _POINTER_NAME)

    def _install() -> None:
        tmp = f"{pointer}.__tmp__{os.getpid()}"
        with open(tmp, "w") as fh:
            fh.write(target)
        os.replace(tmp, pointer)

    if expected is None:
        _install()
        return
    lock = f"{pointer}.__lock__"
    try:
        fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        raise VersionConflictError(
            f"version pointer at {versions_root} is being swapped by a "
            f"concurrent writer (lock file {lock} exists) — retry after "
            "it commits, or remove the lock file if its writer died"
        ) from None
    try:
        # record the holder's pid so a later stuck-lock diagnosis can
        # tell a live-but-slow writer from a dead one (the error text
        # must not invite removing a LIVE writer's lock)
        os.write(fd, str(os.getpid()).encode())
        current = read_version_pointer(versions_root, default=expected)
        if current != expected:
            raise VersionConflictError(
                f"version pointer at {versions_root} moved to "
                f"{current!r} since this merge read {expected!r} — the "
                "merge result is based on a stale version; re-read the "
                "pointer, re-merge, and retry"
            )
        _install()
    finally:
        os.close(fd)
        os.unlink(lock)


def _cas_lock_holder(versions_root: str) -> "tuple[int | None, bool]":
    """Best-effort identity of the CAS lock holder: ``(pid, alive)``.
    :func:`swap_version_pointer` records its pid in the lock file; a
    vanished lock or unparseable content yields ``(None, False)``.
    There is a real window between a holder's ``O_CREAT|O_EXCL`` open
    and its pid write where the lock exists EMPTY — one read landing
    there must not diagnose "no holder recorded" for a live writer, so
    an empty/unparseable read is retried once after a short sleep
    before concluding.  ``alive`` is a same-host signal only
    (``os.kill(pid, 0)``) — on a shared filesystem a remote holder
    reads as dead, and pid REUSE can make a dead holder read as alive,
    which is why the stuck-lock errors report the pid and hedge instead
    of auto-removing."""
    lock = os.path.join(versions_root, _POINTER_NAME + ".__lock__")
    pid = None
    for attempt in (0, 1):
        if attempt:
            time.sleep(0.05)
        try:
            with open(lock) as fh:
                pid = int(fh.read().strip())
            break
        except ValueError:
            continue  # open-but-not-yet-written window: re-read once
        except OSError:
            return None, False  # lock vanished: holder finished
    if pid is None:
        return None, False
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return pid, False
    except PermissionError:
        return pid, True
    return pid, True


def merge_table_versioned(
    spark: SparkSession,
    versions_root: str,
    base_path: str,
    source: DataFrame,
    key_cols: "tuple[str, ...]",
    partition_col: str,
    version_name: str,
    max_retries: int = 3,
    **merge_kwargs,
) -> str:
    """Batch MERGE committed to a version chain under optimistic
    concurrency — the usable form of
    ``swap_version_pointer(expected=)``: read the current pointer
    (``base_path`` until the first commit), :func:`merge_table` the
    source against it into a NEW version dir, then compare-and-swap
    the pointer.  A lost race (:class:`VersionConflictError`) re-reads
    the pointer, RE-MERGES against the winner's version into a fresh
    attempt dir, and retries — the Delta/Iceberg commit loop on a
    plain-parquet chain.  Returns the committed version path.

    ``version_name`` identifies the BATCH (at-most-once commit): if the
    pointer already names this batch's version, the call returns it
    without re-merging (crash-after-commit replay).  The pointer is the
    chain's ONLY commit record, so at-most-once holds for the LATEST
    batch; replaying an OLDER batch (already superseded by a later
    commit) re-applies it — content-safe by the idempotent-replay
    contract, but it mints a fresh version dir, so callers replaying
    whole ledgers should check their ledger position first.  Attempt dirs that
    already exist on disk are skipped rather than reused — a dir left
    by a crash between merge and swap was merged against a pointer this
    run never read, and ``merge_table``'s write-if-absent short-circuit
    would otherwise republish it against the wrong base.  Abandoned
    attempt dirs are dead entries (never pointed at) —
    ``prune_table_versions(include_batch_dirs=True)`` retires them from
    a maintenance window.
    """
    import re as _re

    # retry attempts mint dirs named <version_name>_r<digits>, and the
    # at-most-once check below treats a pointer tail of that form as a
    # commit of THIS batch — so a batch literally NAMED like another
    # batch's retry ('etl_r1' next to 'etl') would let a later 'etl'
    # call mistake etl_r1's commit for its own and silently drop its
    # batch.  Keep the retry namespace reserved: refuse such names.
    if _re.search(r"_r\d+$", version_name):
        raise ValueError(
            f"merge_table_versioned: version_name {version_name!r} ends "
            "in the reserved retry suffix _r<digits> — a sibling batch's "
            "at-most-once check could mistake its commit for this "
            "batch's; pick a name outside the retry namespace"
        )
    # a STREAM-claimed chain has exactly one writer — its checkpointed
    # stream, whose unconditional pointer swaps do not participate in
    # the CAS protocol.  A batch writer interleaving with it would CAS
    # successfully and still be silently overwritten by the stream's
    # next epoch swap — refuse the combination up front.
    if os.path.exists(os.path.join(versions_root, _RUN_MARKER)):
        raise ValueError(
            f"merge_table_versioned: {versions_root} is claimed by a "
            "streaming applier (_cdc_run marker) — a batch commit would "
            "be silently overwritten by the stream's next epoch swap; "
            "stop the stream (and remove the marker) or use a separate "
            "chain"
        )
    # the at-most-once shortcut needs an ACTUAL commit record: with no
    # pointer file yet, read_version_pointer returns base_path, and a
    # base dir that happens to share the batch's basename
    # ('/warehouse/etl' + version_name='etl') must not masquerade as a
    # prior commit — that would silently drop the batch
    if os.path.exists(os.path.join(versions_root, _POINTER_NAME)):
        committed = read_version_pointer(versions_root)
        tail = os.path.basename(committed.rstrip("/"))
        # exact batch identity only: the bare name or its retry form
        # <name>_r<digits> — a prefix match would let a DIFFERENT batch
        # whose name merely extends this one ('etl' vs 'etl_rollup')
        # swallow the commit silently
        if _re.fullmatch(_re.escape(version_name) + r"(_r\d+)?", tail):
            return committed
    os.makedirs(versions_root, exist_ok=True)
    last: VersionConflictError | None = None
    attempt = 0
    for _ in range(max_retries + 1):
        seen = read_version_pointer(versions_root, default=base_path)
        while True:
            name = (
                version_name if attempt == 0 else f"{version_name}_r{attempt}"
            )
            new_path = os.path.join(versions_root, name)
            attempt += 1
            if not os.path.exists(new_path):
                break
        merge_table(
            spark,
            seen,
            new_path,
            source,
            key_cols=key_cols,
            partition_col=partition_col,
            **merge_kwargs,
        )
        # CAS phase.  Lock contention with an UNMOVED pointer means the
        # merge result is still valid — re-merging cannot help, so retry
        # just the CAS under exponential backoff (~3 s total) before
        # diagnosing a leaked lock: a live-but-slow concurrent writer
        # (paused mid-swap) must get time to finish, not an error whose
        # remediation text invites deleting ITS lock.  A MOVED pointer
        # falls through to the outer loop, which re-merges against the
        # winner's version.
        pointer_moved = False
        for delay in (0.0, 0.05, 0.1, 0.2, 0.4, 0.8, 1.6):
            if delay:
                time.sleep(delay)
            try:
                swap_version_pointer(versions_root, new_path, expected=seen)
                return new_path
            except VersionConflictError as exc:
                last = exc
            if read_version_pointer(versions_root, default=seen) != seen:
                pointer_moved = True
                break
        if not pointer_moved:
            pid, alive = _cas_lock_holder(versions_root)
            if alive:
                raise VersionConflictError(
                    f"merge_table_versioned: the pointer at "
                    f"{versions_root} has not moved but its CAS lock "
                    f"stayed held through ~3 s of backoff by pid {pid}, "
                    "which is STILL ALIVE on this host — most likely a "
                    "slow writer, not a leaked lock (though pid reuse "
                    "can make a dead holder read as alive); do NOT "
                    "remove the lock file on this signal alone — wait "
                    "for the holder (or confirm that pid really is the "
                    "writer) and retry"
                ) from last
            holder = (
                f" (last recorded holder pid {pid}, not alive)"
                if pid is not None
                else ""
            )
            raise VersionConflictError(
                f"merge_table_versioned: the pointer at {versions_root} "
                "has not moved but its CAS lock stayed held through "
                f"~3 s of backoff{holder} — a writer died holding the "
                "lock; remove the named lock file after confirming no "
                "writer is live (on any host sharing this path), then "
                "retry"
            ) from last
        # pointer moved: outer loop re-merges against the winner
    raise VersionConflictError(
        f"merge_table_versioned: lost the pointer race {max_retries + 1} "
        f"times on {versions_root} — a hotter writer keeps committing; "
        "raise max_retries or serialize the writers"
    ) from last


def list_table_versions(versions_root: str) -> "list[tuple[str, str]]":
    """The :func:`...streaming.incremental.start_cdc_apply` version
    chain, oldest → newest: (version_name, path) for every COMPLETE
    version dir under ``versions_root`` (``_SUCCESS`` present; torn
    builds excluded), ordered by epoch then step (``_upsert`` before
    ``_final``).  This is the time-travel surface of the plain-parquet
    Delta-log picture: ``spark.read.parquet(path)`` on any entry reads
    the table exactly as that step left it — old versions are immutable
    (rewrites always build NEW dirs; shared files are hardlinks)."""
    if not os.path.isdir(versions_root):
        return []
    out = []
    for name in os.listdir(versions_root):
        if not name.startswith("v"):
            continue
        full = os.path.join(versions_root, name)
        if not os.path.exists(os.path.join(full, "_SUCCESS")):
            continue
        stem = name[1:]
        for i, step in enumerate(("_upsert", "_final")):
            if stem.endswith(step):
                try:
                    epoch = int(stem[: -len(step)])
                except ValueError:
                    break
                out.append((epoch, i, name, full))
                break
    return [(n, p) for _, _, n, p in sorted(out)]


def prune_table_versions(
    versions_root: str,
    keep_last: int = 1,
    include_batch_dirs: bool = False,
    batch_dir_min_age_seconds: float = 0.0,
) -> "list[str]":
    """Retire superseded CDC table versions: delete every complete
    version dir under ``versions_root`` except the newest ``keep_last``
    (and ALWAYS the pointer target, whatever its age) — the version
    chain otherwise accumulates one dir per epoch forever.  Cheap in
    bytes long before this runs (clean partitions are hardlinks, so a
    superseded version mostly holds links to files the newer versions
    still own), but each dir is a full directory-entry copy of the
    table and at 10k+ partitions the metadata itself is worth sweeping.

    Same contract as :func:`prune_stale_artifacts`: explicit call from
    the maintenance job, never a side effect; readers of a pruned
    version fail loudly on the missing path (they should be reading the
    ``_cdc_current`` pointer).  Returns the pruned paths.

    ``include_batch_dirs=True`` additionally retires the batch-commit
    dirs :func:`merge_table_versioned` mints (superseded commits and
    abandoned loser attempts — any non-epoch ``_SUCCESS`` dir that is
    not the pointer target).  Only call it from a maintenance window
    with NO batch writer in flight: a writer between its merge and its
    CAS holds an unpublished dir this sweep cannot distinguish from an
    abandoned one.  Two programmatic guards back that docstring up:
    the sweep REFUSES while the CAS lock file exists (a writer is
    inside its commit window right now), and
    ``batch_dir_min_age_seconds > 0`` skips candidate dirs whose
    ``_SUCCESS`` is younger than the threshold — a writer that just
    finished its merge but has not yet swapped the pointer holds a
    FRESH dir, so an age floor of a few minutes closes the
    merge-to-CAS window without a lock."""
    if keep_last < 1:
        raise ValueError("prune_table_versions: keep_last must be >= 1")
    # the busy-writer refusal runs BEFORE any deletion (a refused call
    # must not have half-swept the epoch chain first).  It remains
    # check-then-sweep: a writer can acquire the lock between this check
    # and the batch-dir rmtrees below, which is exactly the window the
    # batch_dir_min_age_seconds floor exists to close — the racing
    # writer's dirs are necessarily FRESH, so an age floor of a few
    # minutes keeps them out of this sweep's candidate set.
    if include_batch_dirs:
        lock = os.path.join(versions_root, _POINTER_NAME + ".__lock__")
        if os.path.exists(lock):
            raise ValueError(
                f"prune_table_versions: CAS lock file {lock} exists — a "
                "batch writer is inside its commit window; sweeping batch "
                "dirs now could delete its unpublished version. Re-run "
                "after the writer commits (or its leaked lock is cleared)."
            )
    versions = list_table_versions(versions_root)
    protected = set()
    target = read_version_pointer(versions_root, default="")
    if target:
        protected.add(os.path.normpath(target))
    pruned = []
    for _, path in versions[: max(0, len(versions) - keep_last)]:
        if os.path.normpath(path) in protected:
            continue
        shutil.rmtree(path, ignore_errors=True)
        pruned.append(path)
    if include_batch_dirs and os.path.isdir(versions_root):
        listed = {os.path.normpath(p) for _, p in versions}
        now = time.time()
        for name in sorted(os.listdir(versions_root)):
            full = os.path.join(versions_root, name)
            success = os.path.join(full, "_SUCCESS")
            if (
                os.path.isdir(full)
                and os.path.normpath(full) not in listed
                and os.path.normpath(full) not in protected
                and os.path.exists(success)
            ):
                if batch_dir_min_age_seconds > 0:
                    try:
                        age = now - os.path.getmtime(success)
                    except OSError:
                        continue  # raced with a concurrent sweep
                    if age < batch_dir_min_age_seconds:
                        continue  # too fresh: may be pre-CAS
                shutil.rmtree(full, ignore_errors=True)
                pruned.append(full)
    return pruned


_SCD2_META = "_scd2_buckets"


def scd2_init(
    df: DataFrame,
    key_cols: "tuple[str, ...]",
    seq: int,
    n_buckets: int = 16,
) -> DataFrame:
    """The initial load of a :func:`merge_scd2` history table: every
    row becomes an OPEN version (``valid_from = seq``, ``valid_to``
    NULL, ``is_current``), bucketed on a stable hash of the key so the
    history partitions by ``__bucket`` and a CDC batch later rewrites
    only the buckets its keys land in.  Install via
    :func:`init_scd2_history` (which also records the bucket modulus)."""
    from pyspark.sql import functions as F

    return df.select(
        F.pmod(F.xxhash64(*key_cols), F.lit(n_buckets))
        .cast("int")
        .alias("__bucket"),
        *df.columns,
        F.lit(int(seq)).cast("bigint").alias("valid_from"),
        F.lit(None).cast("bigint").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )


def init_scd2_history(
    spark: SparkSession,
    source: DataFrame,
    path: str,
    key_cols: "tuple[str, ...]",
    seq: int = 0,
    n_buckets: int = 16,
) -> DataFrame:
    """Install the initial SCD2 history at ``path`` and record the
    bucket modulus in a ``_scd2_buckets`` sidecar INSIDE the table dir
    (underscore-prefixed → invisible to parquet scans, hardlink-carried
    by every later partition rewrite) — so :func:`merge_scd2` derives
    the modulus from the table itself instead of trusting callers to
    keep a parameter in sync; a drifted modulus would silently assign
    source keys to the wrong buckets and open duplicate versions."""
    cached_parquet(
        spark,
        path,
        lambda: scd2_init(source, key_cols, seq, n_buckets),
        partition_by=("__bucket",),
    )
    meta = os.path.join(path, _SCD2_META)
    if not os.path.exists(meta):
        with open(meta, "w") as fh:
            fh.write(str(int(n_buckets)))
    return spark.read.parquet(path)


def scd2_as_of(hist: DataFrame, seq: int) -> DataFrame:
    """Point-in-time read of a :func:`merge_scd2` history — the query
    surface the history exists FOR: the dimension exactly as it stood
    after batch ``seq`` applied.  Validity is half-open [valid_from,
    valid_to): a version closed AT ``seq`` is already invisible at
    ``seq`` (its replacement, opened at ``seq``, is the visible one),
    and a tombstoned key has NO visible row until a revive reopens it.
    ``scd2_as_of(h, latest)`` ≡ ``h.filter("is_current")``.  Pure
    filter — partition pruning and column pruning pass straight
    through; meta columns are dropped so the result is the plain
    dimension shape a fact join consumes."""
    from pyspark.sql import functions as F

    t = int(seq)
    return hist.filter(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    ).drop("__bucket", "valid_from", "valid_to", "is_current")


def merge_scd2(
    spark: SparkSession,
    old_path: str,
    new_path: str,
    source: DataFrame,
    key_cols: "tuple[str, ...]",
    seq: int,
    delete_col: str | None = None,
    schema_evolution: bool = False,
    broadcast_source_max: int = 4_000_000,
) -> DataFrame:
    """Slowly-changing-dimension TYPE 2 merge on plain parquet — the
    history-keeping generalization of :func:`merge_table` (and of the
    reference's archive-instead-of-delete semantics,
    ``src/DataWarehouse.js:198-201``: where the reference soft-deletes
    the current row, SCD2 keeps EVERY version with its validity
    interval, the audit shape a warehouse dimension actually wants).

    The stored history (built by :func:`scd2_init`) is
    ``(__bucket, keys…, attrs…, valid_from, valid_to, is_current)``;
    applying a batch stamped ``seq`` does, per source row:

    - current version exists, attrs CHANGED → close it
      (``valid_to = seq``) and open a new version
      (``valid_from = seq``, open-ended)
    - current version exists, attrs identical → no-op (no spurious
      version — re-applying a batch is idempotent)
    - no current version → open a new version (works for brand-new
      keys and for keys whose last version was closed: the history
      chain resumes)
    - ``delete_col`` set true → close the current version WITHOUT
      opening a new one (the tombstone)

    Closed versions are immutable forever.  Copy-on-write is
    partition-scoped exactly like :func:`merge_table`: source keys
    hash to their ``__bucket`` values (the same stable ``xxhash64``
    the init used), only those buckets rewrite, clean buckets
    hardlink across.  Duplicate source keys are rejected (two versions
    of one key in one batch is ill-defined — which closes which?).
    Attr comparison is null-safe per column.

    ``schema_evolution=True`` accepts a source that GREW attribute
    columns (every non-key, non-``delete_col`` source column not yet in
    the history becomes an attr): stored versions back-fill NULL —
    closed versions stay immutable in VALUE, the new column reads NULL
    for them — and the null-safe attr compare then does the right
    thing (a source row whose only change is a non-NULL value in the
    added column closes + opens; NULL-in-source + otherwise identical
    is a no-op).  Dropped/retyped attrs refuse loudly.  An evolution
    batch rewrites every bucket once (footer schema), like
    :func:`merge_table`'s documented one-time cost.
    """
    from pyspark.sql import functions as F

    if os.path.exists(os.path.join(new_path, "_SUCCESS")):
        return read_table(spark, new_path)
    if not os.path.exists(os.path.join(old_path, "_SUCCESS")):
        raise ValueError(
            f"merge_scd2: no complete history at {old_path} — build it "
            "first (scd2_init + cached_parquet)"
        )
    hist = read_table(spark, old_path)
    keys = list(key_cols)
    meta = {"__bucket", "valid_from", "valid_to", "is_current"}
    added: "list[str]" = []
    if schema_evolution:
        src_types = {f.name: f.dataType for f in source.schema.fields}
        h_types = {f.name: f.dataType for f in hist.schema.fields}
        retyped = [
            f"{c}: history {h_types[c].simpleString()} vs source "
            f"{src_types[c].simpleString()}"
            for c in hist.columns
            if c not in meta and c in src_types and src_types[c] != h_types[c]
        ]
        if retyped:
            raise ValueError(
                f"merge_scd2: source retypes history columns "
                f"[{'; '.join(retyped)}] — schema evolution adds "
                "attrs, never changes existing types"
            )
        added = [
            c
            for c in source.columns
            if c not in hist.columns and c not in meta and c != delete_col
        ]
        for c in added:
            hist = hist.withColumn(c, F.lit(None).cast(src_types[c]))
    attr_cols = [c for c in hist.columns if c not in meta and c not in keys]
    payload = keys + attr_cols
    missing = [c for c in payload if c not in source.columns]
    if missing:
        raise ValueError(f"merge_scd2: source lacks history columns {missing}")
    dcol = []
    if delete_col is not None:
        if delete_col not in source.columns:
            raise ValueError(f"merge_scd2: source lacks {delete_col!r}")
        dcol = [F.coalesce(F.col(delete_col), F.lit(False)).alias("__del")]
    src = source.select(*payload, *dcol)
    if not dcol:
        src = src.withColumn("__del", F.lit(False))
    # the batch broadcasts WHOLE source rows (the attr compare needs
    # every payload column executor-side) — a corpus-sized "batch"
    # would OOM instead of refusing; bounded limit probe first, then
    # materialize once for the guards + probes + rewrite (merge_table's
    # loud-refusal + single-execution contract)
    if (
        src.select(*keys).limit(broadcast_source_max + 1).count()
        > broadcast_source_max
    ):
        raise ValueError(
            f"merge_scd2: source exceeds broadcast_source_max="
            f"{broadcast_source_max} rows — the SCD2 merge broadcasts "
            "whole source rows for the attr compare, which only scales "
            "for CDC-batch-sized sources; split the batch (idempotent "
            "per batch) or raise the cap if memory allows"
        )
    src = src.localCheckpoint()
    dup = src.groupBy(*keys).count().filter(F.col("count") > 1).limit(1).count()
    if dup:
        raise ValueError(
            "merge_scd2: duplicate keys in source — one version per key "
            "per batch"
        )
    knull = F.lit(False)
    for k in keys:
        knull = knull | F.col(k).isNull()
    if src.filter(knull).limit(1).count():
        raise ValueError(
            "merge_scd2: NULL key in source — a NULL key matches no "
            "current version, so every re-application would open another "
            "duplicate NULL-key version; coalesce keys first"
        )
    # the bucket modulus comes from the table's own sidecar (written by
    # init_scd2_history, hardlink-carried through every rewrite) — a
    # caller-supplied modulus that drifted from the init would silently
    # assign source keys to the wrong buckets
    meta = os.path.join(old_path, _SCD2_META)
    if not os.path.exists(meta):
        raise ValueError(
            f"merge_scd2: {old_path} has no {_SCD2_META} sidecar — build "
            "the history with init_scd2_history"
        )
    with open(meta) as fh:
        n_buckets = int(fh.read().strip())
    src = src.withColumn(
        "__bucket",
        F.pmod(F.xxhash64(*keys), F.lit(int(n_buckets))).cast("int"),
    )
    dirty_set = {r[0] for r in src.select("__bucket").distinct().collect()}
    if added:
        # an added attr changes the HISTORY schema: every bucket
        # rewrites once so no hardlinked file keeps the old footer
        # schema (bucket-count-bounded probe, same class as the modulus)
        dirty_set.update(
            r[0] for r in hist.select("__bucket").distinct().collect()
        )
    dirty = sorted(dirty_set)
    src_b = F.broadcast(src)
    # a batch stamped <= a matched CURRENT version's valid_from would
    # close that version with valid_to <= valid_from — an inverted
    # (never-visible) interval — and open a new version claiming
    # validity BEFORE it existed: the silent-corruption shape of a
    # replayed or out-of-order upstream.  merge_table's seq_col refuses
    # stale batches loudly; the audit-keeping variant must too.  The
    # CLOSED-version mirror matters just as much: a key tombstoned at
    # t has no current version, so a stale re-insert at seq < t would
    # sail past a currents-only probe and open [seq, ∞) OVERLAPPING the
    # closed [f, t) — scd2_as_of in [seq, t) then returns the key
    # TWICE (found by review, pinned in tests).  Overlap-free needs
    # seq >= every matched closed valid_to, so both shapes fold into
    # one bounded probe over the dirty buckets: current rows trip on
    # valid_from >= seq, closed rows on valid_to > seq (valid_to is
    # NULL on currents, so the disjunction can't cross-fire).
    stale = (
        hist.filter(F.col("__bucket").isin(dirty))
        .join(src_b.select(*keys), keys, "left_semi")
        .filter(
            (F.col("is_current") & (F.col("valid_from") >= F.lit(int(seq))))
            | (F.col("valid_to") > F.lit(int(seq)))
        )
        .limit(1)
        .count()
    )
    if stale:
        raise ValueError(
            f"merge_scd2: batch seq={seq} is not strictly newer than a "
            "matched key's history (a current version opened at "
            ">= seq, or a closed version still valid past seq) — a "
            "replayed or out-of-order batch would write an inverted or "
            "OVERLAPPING validity interval; stamp batches with strictly "
            "increasing seq"
        )
    same_attrs = None
    for c in attr_cols:
        eq = F.col(f"h.{c}").eqNullSafe(F.col(f"s.{c}"))
        same_attrs = eq if same_attrs is None else (same_attrs & eq)
    if same_attrs is None:  # key-only history: a row never "changes"
        same_attrs = F.lit(True)

    def _replacement() -> DataFrame:
        # hist is the (possibly NULL-widened) lazy frame over old_path
        resident = hist.filter(F.col("__bucket").isin(dirty))
        h, s = resident.alias("h"), src_b.alias("s")
        key_eq = [F.col(f"h.{k}") == F.col(f"s.{k}") for k in keys]
        joined = h.join(s, key_eq, "left")
        hit = F.col(f"s.{keys[0]}").isNotNull()
        closes = (
            F.col("h.is_current")
            & hit
            & (F.col("s.__del") | ~same_attrs)
        )
        kept = joined.select(
            F.col("h.__bucket").alias("__bucket"),
            *[F.col(f"h.{c}").alias(c) for c in payload],
            F.col("h.valid_from").alias("valid_from"),
            F.when(closes, F.lit(int(seq)).cast("bigint"))
            .otherwise(F.col("h.valid_to"))
            .alias("valid_to"),
            (F.col("h.is_current") & ~closes).alias("is_current"),
        )
        # source rows that must OPEN a new version: not deletes, and no
        # surviving identical current version
        cur = resident.filter(F.col("is_current"))
        c, s2 = cur.alias("h"), src_b.alias("s")
        unchanged_keys = (
            c.join(s2, key_eq, "inner")
            .filter(~F.col("s.__del") & same_attrs)
            .select(*[F.col(f"s.{k}").alias(k) for k in keys])
        )
        opens = (
            src.filter(~F.col("__del"))
            .join(F.broadcast(unchanged_keys), keys, "left_anti")
            .select(
                "__bucket",
                *payload,
                F.lit(int(seq)).cast("bigint").alias("valid_from"),
                F.lit(None).cast("bigint").alias("valid_to"),
                F.lit(True).alias("is_current"),
            )
        )
        return kept.unionByName(opens)

    return rewrite_partitioned_artifact(
        spark, old_path, new_path, _replacement, dirty, "__bucket"
    )


# ---------------------------------------------------------------------------
# IVF coarse quantizer
# ---------------------------------------------------------------------------


def save_ivf_centroids(spark: SparkSession, centroids: np.ndarray, path: str) -> None:
    """Store an (nlist × dim) centroid matrix as parquet (cell, centroid)."""
    C = np.asarray(centroids, dtype=np.float64)
    if C.ndim != 2:
        raise ValueError(f"centroids must be 2-D, got shape {C.shape}")
    rows = [(int(i), [float(v) for v in C[i]]) for i in range(C.shape[0])]
    df = spark.createDataFrame(rows, "cell int, centroid array<double>")
    # one file: the quantizer is nlist×dim doubles (KBs), and a single
    # footer keeps the load a one-task scan.  overwrite: an explicit
    # save of a retrained quantizer must replace the stored one.
    _install_atomic(df, path, single_file=True, overwrite=True)


def load_ivf_centroids(spark: SparkSession, path: str) -> np.ndarray:
    """Load a stored coarse quantizer back into the (nlist × dim) matrix
    ``ivf_topk(centroids=...)`` consumes.  Bounded driver transfer: nlist
    rows by construction."""
    rows = spark.read.parquet(path).orderBy("cell").collect()
    if not rows:
        raise ValueError(f"empty IVF centroid artifact at {path}")
    cells = [r["cell"] for r in rows]
    if cells != list(range(len(cells))):
        raise ValueError(f"IVF centroid artifact has gaps/dups in cell ids: {path}")
    return np.stack([np.asarray(r["centroid"], dtype=np.float64) for r in rows])


# ---------------------------------------------------------------------------
# PQ codebooks
# ---------------------------------------------------------------------------


def save_pq_codebooks(spark: SparkSession, books: np.ndarray, path: str) -> None:
    """Store (num_subspaces × num_centroids × dsub) PQ codebooks as
    parquet (subspace, code, centroid)."""
    B = np.asarray(books, dtype=np.float64)
    if B.ndim != 3:
        raise ValueError(f"codebooks must be 3-D, got shape {B.shape}")
    rows = [
        (int(m), int(j), [float(v) for v in B[m, j]])
        for m in range(B.shape[0])
        for j in range(B.shape[1])
    ]
    df = spark.createDataFrame(rows, "subspace int, code int, centroid array<double>")
    # overwrite: retrained codebooks replace the stored artifact
    _install_atomic(df, path, single_file=True, overwrite=True)


def load_pq_codebooks(spark: SparkSession, path: str) -> np.ndarray:
    """Load stored codebooks back into the ndarray ``pq_topk(codebooks=...)``
    consumes.  Bounded driver transfer: M·K rows by construction."""
    rows = spark.read.parquet(path).orderBy("subspace", "code").collect()
    if not rows:
        raise ValueError(f"empty PQ codebook artifact at {path}")
    n_sub = rows[-1]["subspace"] + 1
    n_code = rows[-1]["code"] + 1
    # exact-sequence check, not just a count: a duplicate plus a
    # compensating gap passes len == n_sub*n_code but would leave an
    # np.empty cell uninitialized — garbage served as a codebook
    want = [(m, j) for m in range(n_sub) for j in range(n_code)]
    if [(r["subspace"], r["code"]) for r in rows] != want:
        raise ValueError(f"PQ codebook artifact has gaps/dups: {path}")
    dsub = len(rows[0]["centroid"])
    B = np.empty((n_sub, n_code, dsub), dtype=np.float64)
    for r in rows:
        B[r["subspace"], r["code"]] = np.asarray(r["centroid"], dtype=np.float64)
    return B


# ---------------------------------------------------------------------------
# BPE merge table
# ---------------------------------------------------------------------------


def save_bpe_merges(
    spark: SparkSession, merges: list[tuple[str, str, int]], path: str
) -> None:
    """Store an ordered BPE merge table (``bpe_train`` output) as parquet
    (rank, left, right, cnt) — the trained-tokenizer artifact every LLM
    pipeline ships: train once on a bounded sample, apply corpus-wide
    forever (a tokenizer that changes between runs silently re-tokenizes
    the whole corpus differently)."""
    rows = [(i + 1, l, r, int(c)) for i, (l, r, c) in enumerate(merges)]
    df = spark.createDataFrame(rows, "rank int, left string, right string, cnt long")
    # overwrite: a retrained merge table replaces the stored tokenizer
    _install_atomic(df, path, single_file=True, overwrite=True)


def load_bpe_merges(spark: SparkSession, path: str) -> list[tuple[str, str, int]]:
    """Load a stored merge table back into the ordered list
    ``bpe_apply`` replays.  Rank contiguity is validated — merge ORDER
    is the tokenizer; a gap means a corrupt artifact."""
    rows = spark.read.parquet(path).orderBy("rank").collect()
    if not rows:
        raise ValueError(f"empty BPE merge artifact at {path}")
    if [r["rank"] for r in rows] != list(range(1, len(rows) + 1)):
        raise ValueError(f"BPE merge artifact has rank gaps/dups: {path}")
    return [(r["left"], r["right"], r["cnt"]) for r in rows]


def prune_stale_artifacts(
    sf_dir: str, live_keys: set[str] | None = None
) -> list[str]:
    """Delete stale artifact state for ``sf_dir``:

    - directories for OLD fingerprints (a regenerated corpus changes the
      fingerprint in :func:`artifact_path`, orphaning the previous one),
      including LEGACY bare-tag directories from before fingerprints
      existed (``.artifacts/<sf_tag>`` with no ``-<hash>`` suffix —
      unreachable by any current :func:`artifact_path`);
    - orphaned ``__building__`` staging dirs (a killed build) and
      ``__old__`` rename-aside dirs (a killed overwrite swap) inside the
      current fingerprint dir — never readable, but corpus-sized for
      lists/codes artifacts, so they accumulate forever unswept;
    - when ``live_keys`` is given, SUPERSEDED-KEY artifacts inside the
      current fingerprint dir: any key not in the live set (a version
      bump ``..._v1`` → ``..._v2`` is exactly the "stale derived state"
      this store exists to manage, and for lists/codes artifacts the
      superseded corpse is corpus-sized).  Pass the complete set of keys
      the deployment still serves — an incomplete set deletes a live
      index.

    Explicit call, not automatic — a path helper that deletes as a side
    effect would be a trap; run it from the same maintenance job that
    rebuilds artifacts after a corpus version bump.

    Returns the pruned directory paths (empty when nothing was stale).
    """
    current = os.path.dirname(artifact_path(sf_dir, "_"))
    sf_tag = os.path.basename(os.path.normpath(sf_dir)) or "default"
    root = artifact_root()
    pruned = []
    if not os.path.isdir(root):
        return pruned
    for name in sorted(os.listdir(root)):
        full = os.path.join(root, name)
        if not (
            os.path.isdir(full)
            and (name.startswith(f"{sf_tag}-") or name == sf_tag)
        ):
            continue
        if full != current:
            shutil.rmtree(full, ignore_errors=True)
            pruned.append(full)
            continue
        # current fingerprint: sweep builder/swap corpses, plus
        # superseded keys when the live set is known.  A LIVE racing
        # builder in this process cannot be swept (its staging dir
        # appears only between its write and its os.replace, and this
        # maintenance entry point is not called concurrently with
        # builds by contract — documented above as an explicit job).
        for sub in sorted(os.listdir(full)):
            stale = (
                "__building__" in sub
                or "__old__" in sub
                or (live_keys is not None and sub not in live_keys)
            )
            if stale:
                corpse = os.path.join(full, sub)
                shutil.rmtree(corpse, ignore_errors=True)
                pruned.append(corpse)
    return pruned
