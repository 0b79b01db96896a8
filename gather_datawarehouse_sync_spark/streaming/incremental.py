"""Streaming incremental dedup: each micro-batch of newly crawled
documents is checked against a STATIC reference corpus sketch — the
streaming form of ``operators/dedup.minhash_dedup_against`` (the "new
crawl vs existing corpus" operation, reference semantics at
SURVEY §2.14's incremental-dedup row).

Layout: ``foreachBatch`` applies the batch operator per micro-batch and
writes verdicts through the epoch-idempotent parquet sink
(``streaming/sink.py``).  This is deliberately NOT a stateful
stream-stream join:

* per-batch semantics are EXACTLY the batch operator's (the parity test
  pins stream output == batch output on the same files), including its
  adaptive kernel/banding strategy choice — no second implementation to
  drift;
* the reference sketch is a static table, re-broadcast per batch by the
  planner, matching the production shape where the corpus sketch is a
  persisted artifact updated per corpus version, not per crawl batch;
* zero streaming state: exactly-once comes from the epoch-overwrite
  sink, so a replayed epoch rewrites identical verdicts instead of
  growing join state forever (a watermarked stream-stream join would
  hold every unexpired signature in the state store for no benefit —
  the reference side never changes mid-run).

Cross-BATCH duplicates (two near-identical docs arriving in different
micro-batches, neither in the reference) are out of scope here by
design — that is corpus-version compaction: periodically fold accepted
docs into the reference sketch and bump the version, exactly like the
batch operator's 100 TB contract.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gather_datawarehouse_sync_spark.operators.dedup import (
    duplicate_spans_against,
    minhash_dedup_against,
    remove_frequent_units,
)
from gather_datawarehouse_sync_spark.streaming.sink import epoch_parquet_sink


def start_incremental_dedup(
    new_stream: DataFrame,
    reference: DataFrame | None,
    out_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int = 16,
    ngram: int = 3,
    reference_signatures: DataFrame | None = None,
):
    """Drain ``new_stream`` (AvailableNow) through per-batch incremental
    dedup against ``reference``; verdict rows (id, ref_match,
    est_jaccard) land in ``out_path`` epoch-partitioned.  Returns the
    started query (caller awaits).

    Pass ``reference_signatures`` (a stored :func:`minhash_signatures`
    table — e.g. loaded from the per-corpus-version parquet artifact)
    instead of ``reference`` to skip re-sketching the corpus text every
    micro-batch: only each batch's increment is sketched, the exact
    contract the batch operator realizes (same parameter, same parity
    guarantee).  The sketch's num_hashes is validated ONCE here at
    stream start — per-batch re-validation would be a blocking driver
    job per micro-batch for a property that cannot change mid-run."""
    sink = epoch_parquet_sink(out_path)

    if (reference is None) == (reference_signatures is None):
        # fail at stream START for both the both-given AND neither-given
        # misuse, not inside the first micro-batch (the batch operator
        # raises per batch — surfacing here gives the caller a stack
        # that points at the stream setup; the sibling span-dedup starter
        # uses the same XOR check)
        raise ValueError(
            "start_incremental_dedup: pass exactly one of reference / "
            "reference_signatures"
        )
    if reference_signatures is not None:
        probe = (
            reference_signatures.filter(
                reference_signatures["signature"].isNotNull()
            )
            .selectExpr("size(signature) AS n")
            .limit(1)
            .collect()
        )
        if probe and probe[0]["n"] != num_hashes:
            raise ValueError(
                "start_incremental_dedup: reference_signatures was built "
                f"with num_hashes={probe[0]['n']}, expected {num_hashes}"
            )

    def _dedup_batch(batch_df: DataFrame, epoch_id: int) -> None:
        verdicts = minhash_dedup_against(
            batch_df,
            reference,
            id_col=id_col,
            text_col=text_col,
            threshold=threshold,
            num_hashes=num_hashes,
            bands=bands,
            ngram=ngram,
            reference_signatures=reference_signatures,
            validate_signatures=False,
        )
        sink(verdicts, epoch_id)

    return (
        new_stream.writeStream.foreachBatch(_dedup_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def start_incremental_span_dedup(
    new_stream: DataFrame,
    reference: DataFrame | None,
    out_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 10,
    reference_keys: DataFrame | None = None,
):
    """Streaming SUBSTRING-span dedup: each micro-batch of crawled
    documents gets positioned span verdicts against a static reference
    corpus — the streaming form of
    ``operators/dedup.duplicate_spans_against``, completing the crawl
    ingest picture next to :func:`start_incremental_dedup` (which gives
    whole-doc MinHash verdicts; this gives the copied PASSAGES, so a
    downstream curation pass can cut spans instead of dropping docs).

    Same layout and for the same reasons: ``foreachBatch`` applies the
    batch operator per micro-batch (stream ≡ batch parity by
    construction — no second span implementation to drift), the epoch
    sink makes replays idempotent, and zero streaming state (the
    reference gram-key set never changes mid-run; cross-batch
    self-duplication is corpus-version compaction's job).

    Pass ``reference_keys`` (a stored :func:`reference_gram_keys` table
    — the per-corpus-version parquet artifact) instead of ``reference``
    to never read the reference TEXT: each batch costs one gram pass
    over the increment plus a semi-join against the stored key set.
    Exactly one of the two must be provided — validated at stream
    START, so a bad setup fails with a stack pointing here, not inside
    the first micro-batch.  Output rows: (``id_col``, span_start,
    span_end, span_tokens), epoch-partitioned under ``out_path``.
    """
    if (reference is None) == (reference_keys is None):
        # the batch operator raises the same errors per batch; stream
        # setup must fail at START (see start_incremental_dedup)
        raise ValueError(
            "start_incremental_span_dedup: pass reference OR "
            "reference_keys, not both / neither"
        )
    sink = epoch_parquet_sink(out_path)

    def _spans_batch(batch_df: DataFrame, epoch_id: int) -> None:
        spans = duplicate_spans_against(
            batch_df,
            reference,
            id_col=id_col,
            text_col=text_col,
            n=n,
            reference_keys=reference_keys,
        )
        sink(spans, epoch_id)

    return (
        new_stream.writeStream.foreachBatch(_spans_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def start_incremental_boilerplate(
    new_stream: DataFrame,
    frequent: DataFrame,
    out_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = " ",
):
    """Streaming BOILERPLATE removal: each micro-batch of crawled
    documents is cleaned against the STORED corpus-wide frequent-unit
    set (``operators/dedup.frequent_units`` — the per-corpus-version
    parquet artifact) — the streaming form of
    ``remove_frequent_units(frequent=)``, completing the crawl-ingest
    picture next to :func:`start_incremental_dedup` (whole-doc
    verdicts) and :func:`start_incremental_span_dedup` (copied
    passages): this one REWRITES the text, cutting the units the corpus
    already holds thousands of times.

    Same layout and for the same reasons: ``foreachBatch`` applies the
    batch operator per micro-batch (stream ≡ batch parity by
    construction — no second implementation to drift), the epoch sink
    makes replays idempotent, and zero streaming state.  A batch-local
    frequency threshold is deliberately NOT accepted: unit frequency
    over one micro-batch is meaningless for boilerplate (a banner is
    boilerplate because the CORPUS holds it, not the batch), so the
    stored set is required — validated at stream START.  Refreshing the
    set is corpus-version compaction's job, exactly like the reference
    sketch above.

    Output rows: (``id_col``, clean_text, units_removed, units_kept),
    epoch-partitioned under ``out_path``.
    """
    if frequent is None:
        raise ValueError(
            "start_incremental_boilerplate: a stored frequent_units set is "
            "required (batch-local thresholds are meaningless for "
            "boilerplate)"
        )
    sink = epoch_parquet_sink(out_path)

    def _clean_batch(batch_df: DataFrame, epoch_id: int) -> None:
        cleaned = remove_frequent_units(
            batch_df,
            id_col=id_col,
            text_col=text_col,
            sep=sep,
            frequent=frequent,
        )
        sink(cleaned, epoch_id)

    return (
        new_stream.writeStream.foreachBatch(_clean_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def start_incremental_index_append(
    new_stream: DataFrame,
    centroids: "np.ndarray",
    out_path: str,
    checkpoint: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sq: bool = True,
):
    """Streaming SERVING-INDEX maintenance: each micro-batch of newly
    embedded documents is cell-assigned and (optionally) int8-encoded
    under the PINNED coarse quantizer, landing as
    ``out_path/epoch=<id>/cell=<c>/part-*.parquet`` — so a crawl ingest
    keeps the retrieval index fresh per micro-batch instead of waiting
    for the next full rebuild.  The third leg of the ingest picture
    next to :func:`start_incremental_dedup` (whole-doc verdicts) and
    :func:`start_incremental_span_dedup` (copied passages).

    Same layout as those, for the same reasons: ``foreachBatch``
    applies the BATCH build operator (:func:`...similarity.
    ivf_sq_invert`, or :func:`...similarity.ivf_invert` with
    ``sq=False``) per micro-batch — stream ≡ batch parity by
    construction, no second encoder to drift — and the epoch-directory
    overwrite makes replays exactly-once.  ``cell`` stays a partition
    column UNDER epoch, so ``ivf_sq_topk(lists=spark.read.parquet(
    out_path))`` still prunes the scan to probed cells across every
    epoch directory.  Zero streaming state: a vector's cell/codes
    depend only on its own row and the broadcast quantizer.

    Appending under a RETRAINED quantizer would silently corrupt the
    index (stored cells probed under different centroids) — that is a
    rebuild, the same contract as
    ``sources/artifacts.append_partitioned_artifact``.  At version
    bump, ``sources/artifacts.compact_epoch_artifact`` folds the
    drained epochs into the flat per-corpus-version artifact (dropping
    the epoch level, one file per touched cell, clean cells hardlinked)
    — stream-append ≡ compact ≡ full-rebuild parity is pinned in
    tests/test_streaming.py.

    Returns the started query (caller awaits).
    """
    from gather_datawarehouse_sync_spark.operators.similarity import (
        ivf_invert,
        ivf_sq_invert,
    )

    C = np.asarray(centroids, dtype=np.float64)
    if C.ndim != 2 or not len(C):
        # fail at stream START (see start_incremental_dedup): a bad
        # quantizer would otherwise surface inside the first micro-batch
        raise ValueError(
            "start_incremental_index_append: centroids must be a "
            f"non-empty (nlist, dim) matrix, got shape {C.shape}"
        )

    def _append_batch(batch_df: DataFrame, epoch_id: int) -> None:
        from gather_datawarehouse_sync_spark.sources.artifacts import (
            _install_atomic,
        )

        invert = ivf_sq_invert if sq else ivf_invert
        lists = invert(batch_df, C, id_col=id_col, vec_col=vec_col)
        # epoch dir overwrite = exactly-once under replay, via the
        # artifact layer's atomic stage-then-rename (a direct in-place
        # overwrite exposes a half-deleted epoch to concurrent serving
        # scans); cell below epoch keeps partition pruning
        _install_atomic(
            lists,
            f"{out_path}/epoch={epoch_id}",
            partition_by=("cell",),
            overwrite=True,
        )

    return (
        new_stream.writeStream.foreachBatch(_append_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def start_cdc_apply(
    change_stream: DataFrame,
    base_path: str,
    versions_root: str,
    checkpoint: str,
    key_cols: "tuple[str, ...]",
    partition_col: str,
    delete_col: str = "is_del",
    seq_col: "str | None" = None,
    schema_evolution: bool = False,
):
    """Streaming CDC maintenance of a plain parquet table: each
    micro-batch of change rows (full replacement rows plus a boolean
    ``delete_col``) applies onto the latest table version through the
    BATCH :func:`...sources.artifacts.merge_table` verb — upserts
    first, then deletes — producing ``versions_root/v<epoch>_final``
    as the new current version.  The fourth leg of the ingest picture:
    the same foreachBatch-over-batch-operator layout (stream ≡ batch
    parity by construction, no second MERGE implementation to drift)
    and the same zero-streaming-state design as its siblings above.

    Exactly-once under replay comes from ``merge_table``'s own
    write-if-absent contract: every epoch's version paths are keyed by
    epoch id, so a replayed epoch finds its ``_SUCCESS`` markers and
    short-circuits — REGARDLESS of what the current-version pointer
    says, which makes the pointer-read/merge/pointer-write sequence
    deterministic even when a failure lands between steps.  The
    pointer (``versions_root/_cdc_current``) is swapped with
    ``os.replace`` (atomic) and names the table readers should scan;
    superseded versions remain on disk for time-travel until
    :func:`...sources.artifacts.prune_stale_artifacts`-style cleanup
    retires them — the copy-on-write version chain is the Delta-log
    picture on plain parquet.

    Each change row must carry EVERY target column (whole replacement
    rows — the ``merge_table`` contract) plus ``delete_col``; a delete
    row's payload beyond the key is ignored.  Returns the started
    query (caller awaits).

    **Per-key event order.**  The applier splits each micro-batch into
    upserts-then-deletes, so WITHOUT ``seq_col`` two events for one key
    inside one batch have no defined order (a delete + re-insert would
    net to a delete; two updates would trip merge_table's
    duplicate-key guard mid-stream) — that shape now refuses LOUDLY up
    front instead of corrupting or dying mid-merge.  Passing
    ``seq_col`` (a per-key monotonic sequence column the target table
    also carries — LSN, commit timestamp) lifts the restriction: each
    batch is first compacted to the max-seq event per key (ties on
    (key, seq) refuse — genuinely ambiguous), and both merges run
    sequence-guarded, so a replayed or REORDERED upstream batch can
    never regress a row past where the table already advanced.

    **Version-chain ownership.**  ``versions_root`` is claimed by this
    stream's checkpoint path (``_cdc_run`` marker): starting a stream
    with a DIFFERENT checkpoint against a populated chain refuses
    loudly — epoch numbering restarts at 0 under a fresh checkpoint,
    and the write-if-absent short-circuit would otherwise resurrect
    the stale v0 and roll the current pointer back.
    """
    import os

    from gather_datawarehouse_sync_spark.sources.artifacts import (
        claim_versions_root,
        merge_table,
        read_version_pointer,
        swap_version_pointer,
    )

    def _apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        va = os.path.join(versions_root, f"v{epoch_id}_upsert")
        vb = os.path.join(versions_root, f"v{epoch_id}_final")
        if seq_col is not None:
            from pyspark.sql import Window

            if (
                # aliased agg, not .count(): a key column literally named
                # 'count' would make the bare F.col('count') ambiguous
                batch_df.groupBy(*key_cols, seq_col)
                .agg(F.count(F.lit(1)).alias("__cdc_cnt"))
                .filter(F.col("__cdc_cnt") > 1)
                .limit(1)
                .count()
            ):
                raise ValueError(
                    "start_cdc_apply: two events with the same "
                    f"({', '.join(key_cols)}, {seq_col}) in one "
                    "micro-batch — their order is genuinely ambiguous; "
                    "the upstream must assign distinct sequence values"
                )
            if "__cdc_rn" in batch_df.columns:
                raise ValueError(
                    "start_cdc_apply: change rows already carry __cdc_rn"
                )
            w = Window.partitionBy(*[F.col(k) for k in key_cols]).orderBy(
                F.col(seq_col).desc()
            )
            batch_df = (
                batch_df.withColumn("__cdc_rn", F.row_number().over(w))
                .filter(F.col("__cdc_rn") == 1)
                .drop("__cdc_rn")
            )
        elif (
            batch_df.groupBy(*key_cols)
            .agg(F.count(F.lit(1)).alias("__cdc_cnt"))
            .filter(F.col("__cdc_cnt") > 1)
            .limit(1)
            .count()
        ):
            raise ValueError(
                "start_cdc_apply: multiple events for one key in a "
                "micro-batch with no seq_col — per-key order inside a "
                "batch is undefined (a delete + re-insert would net to "
                "a delete). Pass seq_col=<monotonic sequence column> "
                "or pre-compact the feed to one event per key per batch"
            )
        dflag = F.coalesce(F.col(delete_col), F.lit(False))
        ups = batch_df.filter(~dflag).drop(delete_col)
        dels = batch_df.filter(dflag).drop(delete_col)
        # schema_evolution lets an EVOLVED change stream (the upstream
        # grew a column) maintain a pre-evolution base: the first
        # evolved epoch's upsert merge widens the table (all-partition
        # re-footer, merge_table's documented one-time cost), after
        # which added=[] and every later epoch is partition-scoped
        # again.  Without the flag, merge_table's whole-replacement-row
        # contract would silently DROP the new column from every batch.
        merge_table(
            spark, read_version_pointer(versions_root, default=base_path),
            va, ups,
            key_cols=key_cols, partition_col=partition_col,
            seq_col=seq_col, schema_evolution=schema_evolution,
        )
        merge_table(
            spark, va, vb, dels,
            key_cols=key_cols, partition_col=partition_col,
            when_matched="delete", when_not_matched="ignore",
            seq_col=seq_col, schema_evolution=schema_evolution,
        )
        swap_version_pointer(versions_root, vb)

    claim_versions_root(versions_root, checkpoint)
    return (
        change_stream.writeStream.foreachBatch(_apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def start_quantile_refresh(
    change_stream: DataFrame,
    state_root: str,
    checkpoint: str,
    keys: "tuple[str, ...]",
    metric_col: str,
    lo: int,
    hi: int,
    bins: int = 256,
    base_path: "str | None" = None,
):
    """Streaming maintenance of the mergeable quantile materialized
    view — the streaming face of x_quantile_mv's nightly refresh: each
    micro-batch aggregates to its own fixed-bin histogram state
    (``quantile_state``, state-sized not data-sized) and monoid-merges
    onto the persisted state (``merge_quantile_states`` — exact
    integer counts, so stream ≡ batch BIT-IDENTICALLY, pinned in
    tests), producing one state version per epoch on the same
    version-chain machinery as every sibling: write-if-absent installs
    (``cached_parquet``'s ``_SUCCESS`` short-circuit → exactly-once
    under replay), atomic current pointer, checkpoint-bound root
    (``claim_versions_root``), zero Structured Streaming state.

    Readers serve quantiles at any moment from the pointer target via
    ``quantiles_from_state`` — the state is ≤ |groups|·bins rows, so
    the read path never touches the stream's history.  ``base_path``
    optionally seeds epoch 0 with a pre-existing state artifact (the
    batch-built corpus state); without it the chain starts empty.
    Returns the started query (caller awaits).
    """
    import os

    from gather_datawarehouse_sync_spark.operators.incremental_agg import (
        merge_quantile_states,
        quantile_state,
    )
    from gather_datawarehouse_sync_spark.sources.artifacts import (
        cached_parquet,
        claim_versions_root,
        read_version_pointer,
        swap_version_pointer,
    )

    def _apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        vb = os.path.join(state_root, f"v{epoch_id}_final")
        prev = read_version_pointer(state_root, default=base_path or "")

        def _build() -> DataFrame:
            delta = quantile_state(batch_df, keys, metric_col, lo, hi, bins)
            if not prev:
                return delta
            return merge_quantile_states(
                [spark.read.parquet(prev), delta], keys
            )

        cached_parquet(spark, vb, _build)
        swap_version_pointer(state_root, vb)

    claim_versions_root(state_root, checkpoint)
    return (
        change_stream.writeStream.foreachBatch(_apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def start_scd2_apply(
    change_stream: DataFrame,
    base_path: str,
    versions_root: str,
    checkpoint: str,
    key_cols: "tuple[str, ...]",
    delete_col: str = "is_del",
):
    """Streaming maintenance of an SCD2 dimension history —
    :func:`start_cdc_apply`'s sibling for the type-2 table: each
    micro-batch applies through the batch
    :func:`...sources.artifacts.merge_scd2` verb with ``seq = epoch
    + 1`` (the init's ``seq 0`` strictly precedes every epoch — a
    same-seq close would make the half-open interval [s, s) an empty
    lie), so the history's validity intervals ARE the stream's epoch
    numbers shifted by one and ``scd2_as_of(h, e + 1)`` replays the
    dimension exactly as micro-batch ``e`` left it.

    One version per epoch (``v<epoch>_final``), exactly-once under
    replay from merge_scd2's write-if-absent short-circuit, atomic
    current-version pointer, zero streaming state — the same layout
    and guarantees as every sibling above.  The base history must
    exist (``init_scd2_history``): batch-0 of a stream is still a
    batch, and the bucket-modulus sidecar must precede every merge.
    ``versions_root`` is claimed by this checkpoint path (the
    :func:`...sources.artifacts.claim_versions_root` contract — see
    :func:`start_cdc_apply`): a different checkpoint against a
    populated chain refuses loudly instead of resurrecting stale
    epoch-0 versions.
    """
    import os

    from gather_datawarehouse_sync_spark.sources.artifacts import (
        claim_versions_root,
        merge_scd2,
        read_version_pointer,
        swap_version_pointer,
    )

    def _apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        vb = os.path.join(versions_root, f"v{epoch_id}_final")
        merge_scd2(
            spark, read_version_pointer(versions_root, default=base_path),
            vb, batch_df,
            key_cols=key_cols, seq=int(epoch_id) + 1, delete_col=delete_col,
        )
        swap_version_pointer(versions_root, vb)

    claim_versions_root(versions_root, checkpoint)
    return (
        change_stream.writeStream.foreachBatch(_apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
