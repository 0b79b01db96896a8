"""Plan-shape tests: the 100 TB contract checked at sf0.001.

Correctness says the engine returns the right rows; these tests say it
returns them with the right *plan* — filters at the scan, columns
pruned, dimensions broadcast, no gratuitous shuffles.  A regression here
is a performance bug even while every oracle test stays green.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gather_datawarehouse_sync_spark.plans import (
    broadcast_join_count,
    codegen_stage_count,
    plan_str,
    pushed_filters,
    read_schemas,
    shuffle_count,
)
from gather_datawarehouse_sync_spark.queries import REGISTRY
from gather_datawarehouse_sync_spark.session import load_table


def test_filter_pushdown_reaches_parquet(spark, sf_dir):
    df = REGISTRY["q4"].spark(spark, sf_dir)
    pushed = " ".join(pushed_filters(df))
    # both predicates must reach the parquet reader (row-group pruning)
    assert "l_returnflag" in pushed and "l_quantity" in pushed


def test_column_pruning(spark, sf_dir):
    df = REGISTRY["q4"].spark(spark, sf_dir)
    schemas = [set(s) for s in read_schemas(df)]
    assert schemas, "no scan found"
    # 2 projected + 2 filtered columns; a 16-column lineitem read is wrong
    assert schemas[0] == {"l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"}


def test_star_join_broadcasts_dimensions(spark, sf_dir):
    # Q7: customer ⋈ nation ⋈ region — both dimension joins must be
    # broadcast-hash (zero shuffles of the fact side per join)
    df = REGISTRY["q7"].spark(spark, sf_dir)
    assert broadcast_join_count(df) >= 2


def test_agg_is_two_phase(spark, sf_dir):
    # partial (map-side) + final aggregate around one exchange: Q18 shape
    df = REGISTRY["q18"].spark(spark, sf_dir)
    plan = plan_str(df)
    assert plan.count("HashAggregate") >= 2
    assert "partial_sum" in plan or "partial_count" in plan


def test_scan_only_query_has_no_join_shuffle(spark, sf_dir):
    df = REGISTRY["q1"].spark(spark, sf_dir)
    # global count: partial agg per partition + single-partition exchange
    assert shuffle_count(df) <= 1


def test_groupby_costs_one_shuffle(spark, sf_dir):
    df = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    assert shuffle_count(df) == 1


def test_semi_and_anti_joins_stay_joins(spark, sf_dir):
    # Q8/Q9 compile to semi/anti joins, not subquery materialization
    plan8 = plan_str(REGISTRY["q8"].spark(spark, sf_dir), "simple")
    plan9 = plan_str(REGISTRY["q9"].spark(spark, sf_dir), "simple")
    assert "LeftSemi" in plan8
    assert "LeftAnti" in plan9


def test_whole_stage_codegen_covers_agg_pipeline(spark, sf_dir):
    df = REGISTRY["q18"].spark(spark, sf_dir)
    # scan→filter→partial-agg and exchange→final-agg→sort spans
    assert codegen_stage_count(df) >= 2


def test_dedup_window_costs_one_shuffle(spark, sf_dir):
    from gather_datawarehouse_sync_spark.operators.dedup import mark_duplicates

    docs = load_table(spark, sf_dir, "documents")
    df = mark_duplicates(docs, hash_col="text", id_col="doc_id")
    # one hash-partition exchange on the hash col; both window functions
    # and the sort ride the same partitioning
    assert shuffle_count(df) == 1


def test_cascading_join_broadcasts_small_dimension(spark, sf_dir):
    from gather_datawarehouse_sync_spark.operators.joins import cascading_join

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_custkey").alias("k"), F.col("c_mktsegment").alias("seg"))
    )
    df = cascading_join(
        orders,
        cust,
        tiers=[
            ("t1", lambda l, r: (l["o_custkey"] == r["k"]) & (r["seg"] == "BUILDING")),
            ("t2", lambda l, r: l["o_custkey"] == r["k"]),
        ],
    )
    # both tiers broadcast the dimension: the fact side is never shuffled
    assert broadcast_join_count(df) == 2
    assert shuffle_count(df) == 0


def test_band_join_avoids_nested_loop(spark, sf_dir):
    # the bucketed-range rewrite must plan as an equi-join on the bucket
    # key — a bare |a-b|<=band condition would pick BroadcastNestedLoopJoin
    df = REGISTRY["x_band_pairs"].spark(spark, sf_dir)
    plan = plan_str(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_band_join_multi_probe_grid_stays_equi_join(spark, sf_dir):
    # the auto-chosen finer grid (2k+1 probes) must keep the SAME plan
    # class as the classic 3-probe form: an equi-join on the bucket key,
    # never a nested loop — the grid only changes the explode fan-out
    df = REGISTRY["x_auto_bands"].spark(spark, sf_dir)
    plan = plan_str(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Generate explode" in plan or "Generate" in plan


def test_exact_cosine_pairs_avoids_nested_loop(spark, sf_dir):
    # block-grid all-pairs: the O(n²) pair space materializes through an
    # equi-join on grid-cell ids, never a BroadcastNestedLoopJoin — at
    # 100 TB neither side fits in one executor, so the NLJ formulation
    # would be a scale-killer by construction
    df = REGISTRY["x_embed_dup"].spark(spark, sf_dir)
    plan = plan_str(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_asof_join_is_single_shuffle_no_join(spark, sf_dir):
    # union-and-window as-of: ONE exchange on the key (plus the output
    # sort's exchange), and no join operator of any kind in the plan
    from gather_datawarehouse_sync_spark.operators.joins import asof_join

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    od = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"), "o_orderdate", "o_orderkey"
    )
    df = asof_join(ev, od, on="user_id", left_ts="ts", right_ts="o_orderdate")
    plan = plan_str(df)
    assert "Join" not in plan, "as-of must not plan a join"
    assert shuffle_count(df) == 1


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    from gather_datawarehouse_sync_spark.sources.layout import write_partitioned

    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "docs_by_lang")
    write_partitioned(docs, path, ["lang"])
    df = spark.read.parquet(path).filter(F.col("lang") == "en").select("doc_id")
    plan = plan_str(df)
    # the lang predicate must prune directories, not filter rows post-scan
    assert "PartitionFilters" in plan and "lang" in plan.split("PartitionFilters", 1)[1][:200]
    got = df.count()
    want = docs.filter(F.col("lang") == "en").count()
    assert got == want > 0


def test_bucketed_join_needs_no_exchange(spark, sf_dir, tmp_path):
    from gather_datawarehouse_sync_spark.sources.layout import (
        read_bucketed,
        write_bucketed,
    )

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed(
        orders, "b_orders", ["o_orderkey"], num_buckets=4,
        path=str(tmp_path / "b_orders"),
    )
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        ["o_orderkey"],
        num_buckets=4,
        path=str(tmp_path / "b_lineitem"),
    )
    bo, bl = read_bucketed(spark, "b_orders"), read_bucketed(spark, "b_lineitem")
    # bucketed-bucketed equi-join on the bucket key: the write-time
    # shuffle substitutes for both join exchanges
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bo.join(bl, "o_orderkey")
        assert shuffle_count(joined) == 0
        assert joined.count() == orders.join(
            li.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"
        ).count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_prefix_sum_avoids_global_window(spark, sf_dir):
    """The hierarchical prefix sum's full-data window must be partitioned
    (by the group id); only the n/group_size group-level rows may pass
    through a global (unpartitioned) window.  A plain SUM() OVER (ORDER
    BY id) would put ALL rows in one partition — the exact shape this
    operator exists to avoid — and the group offsets must come back via a
    broadcast join, not a shuffle."""
    df = REGISTRY["x_pack_chunks"].spark(spark, sf_dir)
    assert broadcast_join_count(df) >= 1
    # any unpartitioned window may exist only on the group-level branch,
    # which aggregates before windowing: an Aggregate must sit below it
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    lines = opt.splitlines()
    for i, ln in enumerate(lines):
        if "Window" in ln and "windowspecdefinition(" in ln and "_gid" not in ln:
            below = "\n".join(lines[i:])
            assert "Aggregate" in below, "global window not on aggregated branch"


def test_morton_code_matches_reference(spark):
    from gather_datawarehouse_sync_spark.sources.layout import morton_code

    def py_morton(a, b):
        out = 0
        for i in range(16):
            out |= ((a >> i) & 1) << (2 * i)
            out |= ((b >> i) & 1) << (2 * i + 1)
        return out

    rows = [(a, b) for a in (0, 1, 2, 3, 255, 65535) for b in (0, 1, 7, 65535)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = df.select("a", "b", morton_code(F.col("a"), F.col("b")).alias("z")).collect()
    for r in got:
        assert r["z"] == py_morton(r["a"], r["b"]), (r["a"], r["b"])


def test_zorder_layout_gives_two_dim_file_skipping(spark, tmp_path):
    """A box predicate must touch few z-ordered files; the same data
    written in row order gives no such locality (the min/max stats a
    parquet reader skips on are per-file ranges — we assert on exactly
    those ranges)."""
    import glob as globmod

    from gather_datawarehouse_sync_spark.sources.layout import write_zordered

    rows = [(i, (i * 7919) % 1024, (i * 104729) % 1024) for i in range(20000)]
    df = spark.createDataFrame(rows, "id long, x long, y long")

    zpath = str(tmp_path / "zorder")
    rpath = str(tmp_path / "roworder")
    write_zordered(df, zpath, "x", "y", num_files=16)
    df.repartitionByRange(16, "id").write.parquet(rpath)

    def files_hit(path):
        hit = 0
        for f in globmod.glob(f"{path}/part-*.parquet"):
            part = spark.read.parquet(f)
            n = part.filter(
                (F.col("x") < 128) & (F.col("y") < 128)
            ).count()
            hit += 1 if n > 0 else 0
        return hit, len(globmod.glob(f"{path}/part-*.parquet"))

    z_hit, z_total = files_hit(zpath)
    r_hit, r_total = files_hit(rpath)
    assert z_total >= 8 and r_total >= 8
    # 1/64 of the area → a handful of z files, but (hash-scattered)
    # nearly every row-order file
    assert z_hit <= z_total // 4
    assert r_hit >= (3 * r_total) // 4
    # layout must not lose rows
    assert spark.read.parquet(zpath).count() == 20000


def test_semi_prune_broadcasts_key_set(spark, sf_dir):
    from gather_datawarehouse_sync_spark.operators.prune import semi_prune

    big = load_table(spark, sf_dir, "lineitem")
    small = load_table(spark, sf_dir, "nation")
    pruned = semi_prune(big, small, [("l_orderkey", "n_nationkey")])
    p = plan_str(pruned, mode="simple")
    assert "BroadcastHashJoin" in p and "LeftSemi" in p
    # the fact side must not shuffle (the only Exchange allowed is the
    # tiny key-set distinct on the build side)
    assert "hashpartitioning(l_orderkey" not in p


def test_runtime_bloom_filter_injects(spark, sf_dir, tmp_path):
    """Catalyst's InjectRuntimeFilter must rewrite an eligible shuffle
    join to Bloom-test the fact side (the too-big-to-broadcast pruning
    tier enable_runtime_bloom turns on)."""
    from gather_datawarehouse_sync_spark.operators.prune import enable_runtime_bloom

    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.expectedNumItems",
            "spark.sql.optimizer.runtime.bloomFilter.maxNumBits",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        enable_runtime_bloom(spark)
        # force a shuffle join: broadcast would make the filter pointless
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        fact = load_table(spark, sf_dir, "lineitem")
        dim = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderstatus") == "F"  # selective build-side filter
        )
        joined = fact.join(dim, fact["l_orderkey"] == dim["o_orderkey"])
        p = plan_str(joined, mode="simple").lower()
        assert "might_contain" in p and "bloom_filter_agg" in p
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_minhash_kernel_path_is_map_heavy_no_sort_merge(spark, sf_dir):
    """The broadcast-kernel branch of minhash_dedup_against must stay a
    map-heavy plan: the grid scoring runs in one MapInPandas over the
    reference reps and the member fan-out is a pinned broadcast join —
    a SortMergeJoin anywhere means a verdict- or signature-sized shuffle
    crept back in."""
    from gather_datawarehouse_sync_spark.operators.dedup import (
        minhash_dedup_against,
    )

    docs = load_table(spark, sf_dir, "documents")
    out = minhash_dedup_against(
        docs.filter(F.col("doc_id") % 5 == 0),
        docs.filter(F.col("doc_id") % 5 != 0),
        threshold=0.8,
        ngram=1,
    )
    p = plan_str(out, mode="simple").lower()
    assert "mapinpandas" in p
    assert "sortmergejoin" not in p


def test_classifier_map_realization_is_shuffle_free(spark, sf_dir):
    """The literal-map classifier is a scan-side projection: zero
    exchanges, and the scan reads only the columns it needs."""
    from gather_datawarehouse_sync_spark.functions.classify import (
        classify_documents,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = classify_documents(docs)
    assert shuffle_count(df) == 0
    schemas = [set(s) for s in read_schemas(df)]
    assert schemas and schemas[0] == {"doc_id", "text"}


def test_self_dedup_transform_is_shuffle_free(spark, sf_dir):
    from gather_datawarehouse_sync_spark.functions.text import (
        dedup_repeated_units,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = docs.select(
        "doc_id", dedup_repeated_units(F.col("text")).alias("t")
    )
    assert shuffle_count(df) == 0


def test_semantic_dedup_single_shuffle_on_cell(spark, sf_dir):
    """SemDeDup's only exchange is the groupBy on cell id (plus AQE's
    optional coalesce) — assignment stays narrow."""
    from gather_datawarehouse_sync_spark.operators.similarity import (
        semantic_dedup,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    df = semantic_dedup(emb, threshold=0.6, nlist=2, max_iter=2)
    assert shuffle_count(df) <= 2


def test_token_budget_two_phase_shuffles(spark, sf_dir):
    """token_budget_sample is the two-phase skew-proof shape: exactly
    two exchanges — the (group, hash-shard) pre-prune window, then the
    exact (group) window over the budget-bounded survivors.  A third
    exchange (or a collapse back to one) means the decomposition
    regressed."""
    from gather_datawarehouse_sync_spark.operators.sampling import (
        token_budget_sample,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", F.size(F.split("text", " ")).cast("long").alias("t")
    )
    df = token_budget_sample(docs, "source", "t", 500, "doc_id")
    assert shuffle_count(df) == 2


def test_agg_state_merge_two_phase_no_extra_exchange(spark, sf_dir):
    """The state merge is union + ONE re-aggregate: two partial/final
    aggregate pairs (per-side states) feed a single merge exchange —
    no join operator anywhere."""
    from gather_datawarehouse_sync_spark.operators.incremental_agg import (
        agg_state,
        merge_agg_states,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_returnflag", F.col("l_quantity").cast("long").alias("q")
    )
    merged = merge_agg_states(
        [
            agg_state(li.filter("q < 25"), ["l_returnflag"], "q"),
            agg_state(li.filter("q >= 25"), ["l_returnflag"], "q"),
        ],
        ["l_returnflag"],
    )
    plan = plan_str(merged)
    assert "Join" not in plan
    assert plan.count("HashAggregate") >= 4  # partial+final per level


def test_rep_frac_is_shuffle_free(spark, sf_dir):
    """The Gopher duplicated-gram fraction is a pure scan-side
    projection — both gram counts evaluate inside the scan stage, no
    Exchange anywhere (the ORDER BY is the only allowed exchange and
    exists solely for deterministic driver comparison)."""
    from gather_datawarehouse_sync_spark.functions.text import repetition_bp

    df = load_table(spark, sf_dir, "documents").select(
        "doc_id", repetition_bp(F.col("text"), 3).alias("rep_bp")
    )
    assert shuffle_count(df) == 0


def test_cluster_split_serves_from_stored_map(spark, sf_dir, tmp_path, monkeypatch):
    """The persisted-cluster-map split: after the artifact exists, the
    query plan is scan + join + agg — the iterative CC (its localCheckpoint
    scans) is GONE, and the stored map is read from the artifact
    directory."""
    monkeypatch.setenv("SPARK_GRAFT_ARTIFACTS", str(tmp_path / "arts"))
    df = REGISTRY["x_cluster_split"].spark(spark, sf_dir)  # builds artifact
    df.collect()
    warm = REGISTRY["x_cluster_split"].spark(spark, sf_dir)
    plan = plan_str(warm)
    assert "jaccard_components" in plan  # FileScan on the stored map
    # CC's per-round localCheckpoint materializes as ExistingRDD scans;
    # a served split must have none
    assert "ExistingRDD" not in plan


def test_duplicate_spans_no_nested_loop(spark, sf_dir):
    """Span detection is gram-count + semi-join + window — never a
    cartesian/broadcast-nested-loop pair enumeration."""
    from gather_datawarehouse_sync_spark.operators.dedup import duplicate_spans

    df = duplicate_spans(load_table(spark, sf_dir, "documents"), n=10)
    plan = plan_str(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_hybrid_search_candidates_take_ordered_not_global_window(spark, sf_dir):
    """hybrid_rrf_topk's candidate lists must plan as
    TakeOrderedAndProject (per-partition top-n + bounded merge); the
    only windows may run over the ≤candidates-row lists, never the
    corpus."""
    import numpy as np

    from gather_datawarehouse_sync_spark.operators.similarity import (
        hybrid_rrf_topk,
    )

    docs = load_table(spark, sf_dir, "documents")
    vecs = load_table(spark, sf_dir, "embeddings")
    qv = [float(x) for x in np.ones(64)]
    df = hybrid_rrf_topk(docs, vecs, ["spark"], qv, k=5, candidates=50)
    plan = plan_str(df)
    assert "TakeOrderedAndProject" in plan
    # rank windows exist, but only downstream of the limited candidate
    # lists — the corpus-side scans must be under a TakeOrdered, not a
    # Window; cheap structural proxy: every Window node appears after
    # the first TakeOrderedAndProject in the plan tree text
    first_take = plan.index("TakeOrderedAndProject")
    assert "Window" not in plan[:first_take]


def test_ivf_stored_lists_scan_prunes_to_probed_cells(spark, sf_dir, tmp_path):
    """Serving an IVF query from cell-PARTITIONED stored lists must
    prune the lists scan to the probed partitions: the broadcast probe
    side feeds a dynamicpruningexpression into the lists scan's
    PartitionFilters (DPP).  Without this the probe-cells → equi-join
    plan reads every (cell, id, vector) row — at 100 TB that is the
    full-corpus pass an inverted file exists to avoid."""
    from gather_datawarehouse_sync_spark.operators.similarity import (
        ivf_invert,
        ivf_topk,
        kmeans_centroids,
    )
    from gather_datawarehouse_sync_spark.sources.artifacts import (
        cached_parquet,
    )

    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    C = kmeans_centroids(emb, nlist=4)
    lists = cached_parquet(
        spark,
        str(tmp_path / "ivf_lists"),
        lambda: ivf_invert(emb, C),
        partition_by=("cell",),
    )
    df = ivf_topk(
        emb.filter(F.col("vec_id") < 5), None, k=1, nlist=4, nprobe=2,
        centroids=C, lists=lists,
    )
    plan = plan_str(df)
    # the lists scan's PartitionFilters must carry the dynamic pruning
    # subquery on cell — directory-level skipping, not a post-scan filter
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters", 1)[1][:200]
    assert "dynamicpruning" in pf and "cell" in pf
    # and the registered serving query (x_ivf_ann) builds its artifact
    # through the same partition_by path — results unchanged vs v1
    assert df.count() > 0


def test_ivf_sq_stored_lists_scan_prunes_and_reads_no_vectors(
    spark, sf_dir, tmp_path
):
    """The composed IVF×SQ serving scan must (a) carry the dynamic
    partition pruning subquery on cell and (b) read ONLY the code
    columns — the full-precision vector never appears in the lists
    schema, so a query cannot touch it by construction."""
    from gather_datawarehouse_sync_spark.operators.similarity import (
        ivf_sq_invert,
        ivf_sq_topk,
        kmeans_centroids,
    )
    from gather_datawarehouse_sync_spark.sources.artifacts import (
        cached_parquet,
    )

    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    C = kmeans_centroids(emb, nlist=4)
    lists = cached_parquet(
        spark,
        str(tmp_path / "ivfsq_lists"),
        lambda: ivf_sq_invert(emb, C),
        partition_by=("cell",),
    )
    assert set(lists.columns) == {"cell", "vec_id", "codes", "scale_micro"}
    df = ivf_sq_topk(
        emb.filter(F.col("vec_id") < 5), C, lists, k=1, nprobe=2
    )
    plan = plan_str(df)
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters", 1)[1][:200]
    assert "dynamicpruning" in pf and "cell" in pf
    assert df.count() > 0


def test_delete_rewrite_reads_only_dirty_partitions(
    spark, sf_dir, tmp_path, monkeypatch
):
    """delete_from_partitioned_artifact's rewrite pass must READ only
    the dirty cells: the remaining-rows frame it hands to
    rewrite_partitioned_artifact carries a static `cell IN (...)`
    partition filter, so the scan prunes to those directories — the
    hardlink carry-over already proves clean cells aren't REWRITTEN
    (test_operators), this pins that they aren't even rescanned."""
    import gather_datawarehouse_sync_spark.sources.artifacts as A
    from gather_datawarehouse_sync_spark.operators.similarity import (
        ivf_invert,
        kmeans_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    C = kmeans_centroids(emb, nlist=8)
    old_path = str(tmp_path / "lists")
    A.cached_parquet(
        spark, old_path, lambda: ivf_invert(emb, C), partition_by=("cell",)
    )

    captured = {}
    real = A.rewrite_partitioned_artifact

    def spy(spark_, old, new, build, dirty, *a, **kw):
        captured["df"] = build()
        captured["dirty"] = dirty
        return real(spark_, old, new, build, dirty, *a, **kw)

    monkeypatch.setattr(A, "rewrite_partitioned_artifact", spy)
    A.delete_from_partitioned_artifact(
        spark,
        old_path,
        str(tmp_path / "lists_v2"),
        emb.filter(F.col("vec_id") < 3).select("vec_id"),
    )
    assert captured["dirty"]  # some cells contain the deleted ids
    plan = plan_str(captured["df"])
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters", 1)[1][:250]
    assert "cell" in pf and " IN " in pf.upper()
    # and the anti side arrives broadcast, not shuffled
    assert broadcast_join_count(captured["df"]) >= 1


def test_merge_table_rewrite_reads_only_dirty_partitions(
    spark, tmp_path, monkeypatch
):
    """merge_table's replacement frame must READ only the dirty
    partitions (static `p IN (...)` partition filter on the survivor
    scan) with the source keys arriving broadcast — the hardlink
    carry-over in test_operators proves clean partitions aren't
    REWRITTEN; this pins that they aren't even rescanned, the property
    that makes a 3-partition CDC batch O(3 partitions) at 100 TB."""
    import gather_datawarehouse_sync_spark.sources.artifacts as A

    rows = [(i, f"v{i}", ["a", "b", "c", "d"][i % 4]) for i in range(40)]
    old_path = str(tmp_path / "t_v1")
    A.cached_parquet(
        spark,
        old_path,
        lambda: spark.createDataFrame(rows, "id long, val string, p string"),
        partition_by=("p",),
    )
    src = spark.createDataFrame(
        [(0, "patched", "a"), (100, "fresh", "b")],
        "id long, val string, p string",
    )

    captured = {}
    real = A.rewrite_partitioned_artifact

    def spy(spark_, old, new, build, dirty, *a, **kw):
        captured["df"] = build()
        captured["dirty"] = dirty
        return real(spark_, old, new, build, dirty, *a, **kw)

    monkeypatch.setattr(A, "rewrite_partitioned_artifact", spy)
    A.merge_table(
        spark, old_path, str(tmp_path / "t_v2"), src,
        key_cols=("id",), partition_col="p",
    )
    assert sorted(captured["dirty"]) == ["a", "b"]
    plan = plan_str(captured["df"])
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters", 1)[1][:250]
    assert "p" in pf and " IN " in pf.upper()
    assert broadcast_join_count(captured["df"]) >= 1


def test_merge_scd2_rewrite_reads_only_dirty_buckets(
    spark, tmp_path, monkeypatch
):
    """merge_scd2's replacement frame must READ only the dirty hash
    buckets (static `__bucket IN (...)` partition filter) — a CDC batch
    over a handful of keys stays O(touched buckets) however wide the
    dimension history grows."""
    import gather_datawarehouse_sync_spark.sources.artifacts as A

    base = spark.createDataFrame(
        [(i, f"n{i}", 100 + i) for i in range(1, 33)],
        "k long, nm string, bal long",
    )
    old_path = str(tmp_path / "h0")
    A.init_scd2_history(spark, base, old_path, ("k",), seq=0, n_buckets=8)
    src = spark.createDataFrame(
        [(1, "n1", 999, False)], "k long, nm string, bal long, is_del boolean"
    )

    captured = {}
    real = A.rewrite_partitioned_artifact

    def spy(spark_, old, new, build, dirty, *a, **kw):
        captured["df"] = build()
        captured["dirty"] = dirty
        return real(spark_, old, new, build, dirty, *a, **kw)

    monkeypatch.setattr(A, "rewrite_partitioned_artifact", spy)
    A.merge_scd2(
        spark, old_path, str(tmp_path / "h1"), src, ("k",), seq=1,
        delete_col="is_del",
    )
    assert len(captured["dirty"]) == 1  # one key → one bucket
    plan = plan_str(captured["df"])
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters", 1)[1][:250]
    assert "__bucket" in pf


def test_integer_dot_hot_loops_have_no_interpreted_hof(spark, sf_dir):
    """The SQ / int_micro / MMR-relevance scoring loops must NOT run as
    aggregate(zip_with(...)) higher-order functions — HOFs evaluate
    interpreted per element in the |Q|·|C| scan loop (the round-5
    bitset-popcount pathology; a 3-10× constant on the compressed-scan
    tier's selling point).  The shipped fast path is exact int64 numpy
    kernels over Arrow batches — NOT an unrolled codegen expression,
    which was measured SLOWER (it outgrows the JIT method limit; see
    SCALE.md round 9) — so this test pins only the absence of the HOF
    node names from these physical plans."""
    from gather_datawarehouse_sync_spark.operators.similarity import (
        brute_force_topk,
        ivf_sq_invert,
        ivf_sq_topk,
        kmeans_centroids,
        sq_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    q = emb.filter(F.col("vec_id") < 3)
    C = kmeans_centroids(emb, nlist=4)
    lists = ivf_sq_invert(emb, C).localCheckpoint(eager=True)
    for df in (
        sq_topk(q, emb, k=2),
        brute_force_topk(q, emb, k=2, metric="int_micro"),
        ivf_sq_topk(q, C, lists, k=2, nprobe=2),
    ):
        plan = plan_str(df)
        assert "zip_with" not in plan and "aggregate(" not in plan
        assert df.count() > 0


def test_mmr_ivfsq_candidate_scan_prunes_to_probed_cells(spark, sf_dir, tmp_path):
    """The composed MMR serving query's candidate stage must read the
    stored code lists through the SAME DPP-pruned scan the plain IVF×SQ
    tier uses: the dynamic pruning subquery on cell appears in the
    lists scan's PartitionFilters, proving the docstring's 100 TB
    composition with a plan, not a sentence."""
    from gather_datawarehouse_sync_spark.operators.similarity import (
        ivf_sq_invert,
        kmeans_centroids,
        mmr_rerank_ivfsq,
    )
    from gather_datawarehouse_sync_spark.sources.artifacts import (
        cached_parquet,
    )

    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    C = kmeans_centroids(emb, nlist=4)
    lists = cached_parquet(
        spark,
        str(tmp_path / "ivfsq_lists"),
        lambda: ivf_sq_invert(emb, C),
        partition_by=("cell",),
    )
    df = mmr_rerank_ivfsq(
        emb.filter(F.col("vec_id") < 3), C, lists, emb,
        k=3, candidates=5, nprobe=2,
    )
    plan = plan_str(df)
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters", 1)[1][:200]
    assert "dynamicpruning" in pf and "cell" in pf
    assert df.count() > 0


def test_boilerplate_anti_join_broadcasts_frequent_set(spark, sf_dir):
    """remove_frequent_units' 100 TB contract: the frequent-unit set is
    anti-joined BROADCAST by default (a unit must clear the document
    threshold, so the set is tiny at boilerplate-grade thresholds —
    the hint makes that a guarantee, not a statistics gamble).  With
    broadcast_frequent=False the hint is absent and the strategy is the
    planner's statistics-based choice — at THIS corpus size it still
    picks broadcast (correct: the set IS tiny here), which is exactly
    the point of the flag: at a min_docs=2 full line-dedup scale the
    same plan compiles to a shuffle join instead of a forced OOM."""
    from gather_datawarehouse_sync_spark.operators.dedup import (
        remove_frequent_units,
    )

    docs = load_table(spark, sf_dir, "documents")
    bcast = remove_frequent_units(docs, min_doc_frac_bp=7800)
    plan = plan_str(bcast, "simple")
    assert "LeftAnti" in plan
    assert "BroadcastHashJoin" in plan
    # the escape hatch compiles to the same LeftAnti semantics with the
    # strategy left to the planner (no forced broadcast hint)
    shuffled = remove_frequent_units(
        docs, min_doc_frac_bp=7800, broadcast_frequent=False
    )
    assert "LeftAnti" in plan_str(shuffled, "simple")


def test_file_stats_index_prunes_zordered_scan(spark, tmp_path):
    """The job-level data-skipping pair: a z-ordered table's per-file
    stats boxes are tight, so a box predicate keeps only the files it
    can touch (files_kept < files_total), the pruned scan + row filter
    returns exactly the full scan's rows (superset guarantee), and an
    all-outside range prunes everything while preserving the schema."""
    from gather_datawarehouse_sync_spark.sources.layout import (
        file_stats_index,
        scan_with_file_pruning,
        write_zordered,
    )

    df = spark.createDataFrame(
        [(i % 100, (i * 37) % 100, i) for i in range(10_000)],
        "x long, y long, pay long",
    )
    path = str(tmp_path / "ztab")
    write_zordered(df, path, "x", "y", num_files=16)

    stats = file_stats_index(spark, path, ["x", "y"])
    assert stats.count() == 16

    box = {"x": (10, 20), "y": (10, 20)}
    reader, kept, total = scan_with_file_pruning(spark, stats, box)
    assert 0 < kept < total
    pred = (
        (F.col("x") >= 10) & (F.col("x") <= 20)
        & (F.col("y") >= 10) & (F.col("y") <= 20)
    )
    got = sorted(map(tuple, reader.filter(pred).collect()))
    want = sorted(map(tuple, spark.read.parquet(path).filter(pred).collect()))
    assert got == want and got

    empty, kept0, _ = scan_with_file_pruning(spark, stats, {"x": (500, 600)})
    assert kept0 == 0
    assert empty.columns == ["x", "y", "pay"] and empty.count() == 0

    import pytest as _pytest

    with _pytest.raises(ValueError, match="no parquet files"):
        file_stats_index(spark, str(tmp_path / "nope"), ["x"])


def test_refresh_file_stats_index_matches_rebuild(spark, tmp_path):
    """Incremental stats maintenance: after an append AND a file
    deletion, refresh(old index) is row-identical to a from-scratch
    rebuild — only the appended files' footers are read (the carried
    rows come from the stored index, not re-footering); no-op refresh
    returns the index unchanged; column-mismatch guard."""
    import os

    from gather_datawarehouse_sync_spark.sources.layout import (
        file_stats_index,
        refresh_file_stats_index,
    )

    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(i, i * 2) for i in range(1000)], "x long, y long"
    ).repartition(4).write.parquet(path)
    stats_v1 = file_stats_index(spark, path, ["x", "y"]).localCheckpoint()

    # append new files and delete one original file
    spark.createDataFrame(
        [(i, i * 2) for i in range(1000, 1500)], "x long, y long"
    ).repartition(2).write.mode("append").parquet(path)
    victim = sorted(
        f for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )[0]
    os.remove(os.path.join(path, victim))

    refreshed = refresh_file_stats_index(spark, path, stats_v1, ["x", "y"])
    rebuilt = file_stats_index(spark, path, ["x", "y"])
    assert sorted(map(tuple, refreshed.collect())) == sorted(
        map(tuple, rebuilt.collect())
    )
    # fixed point: refreshing an up-to-date index changes nothing
    again = refresh_file_stats_index(spark, path, refreshed, ["x", "y"])
    assert sorted(map(tuple, again.collect())) == sorted(
        map(tuple, rebuilt.collect())
    )

    import pytest as _pytest

    with _pytest.raises(ValueError, match="lacks"):
        refresh_file_stats_index(spark, path, stats_v1.drop("y_min"), ["x", "y"])
    with _pytest.raises(ValueError, match="no parquet files"):
        refresh_file_stats_index(
            spark, str(tmp_path / "nope"), stats_v1, ["x", "y"]
        )


def test_refresh_index_identity_mismatch_guard(spark, tmp_path):
    """A stored index that matches ZERO on-disk files is a path-identity
    mismatch (index persisted from a different/relative path, or a moved
    table), not 'everything is new': both refreshers refuse loudly
    instead of silently dropping every stored row and re-scanning the
    whole table as fresh (r13-ADVICE, layout.py `_list_parquet_files`
    abspath migration)."""
    import pytest as _pytest

    from gather_datawarehouse_sync_spark.sources.layout import (
        file_bloom_index,
        file_stats_index,
        refresh_file_bloom_index,
        refresh_file_stats_index,
    )

    path_a = str(tmp_path / "table_a")
    path_b = str(tmp_path / "table_b")
    for p in (path_a, path_b):
        spark.createDataFrame(
            [(i, i * 2) for i in range(100)], "x long, y long"
        ).repartition(2).write.parquet(p)

    stats = file_stats_index(spark, path_a, ["x", "y"])
    with _pytest.raises(ValueError, match="path-identity mismatch"):
        refresh_file_stats_index(spark, path_b, stats, ["x", "y"])

    bloom = file_bloom_index(spark, path_a, "x")
    with _pytest.raises(ValueError, match="path-identity mismatch"):
        refresh_file_bloom_index(spark, path_b, bloom, "x")

    # escape hatch (r14-ADVICE): an in-place full rewrite (e.g. a
    # foreign compactor replaced every file under the SAME path)
    # legitimately produces the zero-overlap state — allow_full_rebuild
    # accepts the announced O(table) re-scan, and the result must equal
    # a from-scratch build of the current files
    rebuilt = refresh_file_stats_index(
        spark, path_b, stats, ["x", "y"], allow_full_rebuild=True
    )
    want = file_stats_index(spark, path_b, ["x", "y"])
    assert sorted(map(tuple, rebuilt.collect())) == sorted(
        map(tuple, want.collect())
    )
    bloom_rebuilt = refresh_file_bloom_index(
        spark, path_b, bloom, "x", allow_full_rebuild=True
    )
    bloom_want = file_bloom_index(spark, path_b, "x")
    assert sorted(map(tuple, bloom_rebuilt.collect())) == sorted(
        map(tuple, bloom_want.collect())
    )


def test_file_bloom_index_point_lookup_pruning(spark, tmp_path):
    """Bloom-filter file skipping on a HIGH-CARDINALITY randomly
    distributed key (min/max boxes span everything — interval pruning
    cannot bite, membership bits do): present probes keep exactly the
    files holding them (no false negatives — pruned-scan rows ≡
    full-scan rows), an absent probe prunes (essentially) everything,
    an all-NULL file prunes exactly, and the incremental refresh is
    row-identical to a rebuild."""
    import os

    import pytest as _pytest

    from gather_datawarehouse_sync_spark.sources.layout import (
        file_bloom_index,
        refresh_file_bloom_index,
        scan_with_bloom_pruning,
    )

    path = str(tmp_path / "btab")
    # keys scrambled so every file's [min,max] box spans the domain
    spark.createDataFrame(
        [((i * 2654435761) % 100_000, i) for i in range(8_000)],
        "k long, pay long",
    ).repartition(8).write.parquet(path)
    # one extra file where the key is all-NULL — must prune exactly
    spark.createDataFrame(
        [(None, 10_000 + i) for i in range(50)], "k long, pay long"
    ).coalesce(1).write.mode("append").parquet(path)

    idx = file_bloom_index(spark, path, "k").localCheckpoint()
    total_files = idx.select("file").distinct().count()
    assert total_files == 9

    full = spark.read.parquet(path)
    some_keys = [r["k"] for r in full.filter(F.col("k").isNotNull())
                 .orderBy("k").limit(3).collect()]
    probes = spark.createDataFrame([(k,) for k in some_keys], "k long")
    reader, kept, total = scan_with_bloom_pruning(spark, idx, probes)
    assert total == 9 and 0 < kept < total
    got = sorted(
        map(tuple, reader.filter(F.col("k").isin(some_keys)).collect())
    )
    want = sorted(
        map(tuple, full.filter(F.col("k").isin(some_keys)).collect())
    )
    assert got == want and got

    # THE bloom guarantee, asserted directly against ground truth over
    # seeded probe subsets: the kept file set is a SUPERSET of the
    # files that actually contain any probe (false positives allowed,
    # false negatives never)
    import random

    from pyspark.sql.functions import input_file_name, regexp_replace

    truth = (
        full.withColumn(
            "f", regexp_replace(input_file_name(), "^file:(//)?", "")
        )
        .filter(F.col("k").isNotNull())
        .select("k", "f")
        .collect()
    )
    by_key = {}
    for r in truth:
        by_key.setdefault(r["k"], set()).add(r["f"])
    all_keys = sorted(by_key)
    for seed in range(5):
        sample = random.Random(seed).sample(all_keys, 7)
        rdr, kept_n, _ = scan_with_bloom_pruning(
            spark, idx, spark.createDataFrame([(k,) for k in sample], "k long")
        )
        must_keep = set().union(*(by_key[k] for k in sample))
        kept_files = {
            r["f"]
            for r in rdr.withColumn(
                "f", regexp_replace(input_file_name(), "^file:(//)?", "")
            ).select("f").distinct().collect()
        }
        assert must_keep <= kept_files, f"false negative at seed {seed}"

    # absent probe: nothing real can match; allow rare false-positive
    # files but the filtered result must be empty
    absent = spark.createDataFrame([(-12345,)], "k long")
    r2, kept2, _ = scan_with_bloom_pruning(spark, idx, absent)
    assert kept2 <= 1  # fp odds at this sizing are ~1e-9 per file
    assert r2.filter(F.col("k") == -12345).count() == 0

    # refresh after an append ≡ rebuild; fixed point on no change
    spark.createDataFrame(
        [(999_999_999, 1)], "k long, pay long"
    ).coalesce(1).write.mode("append").parquet(path)
    refreshed = refresh_file_bloom_index(spark, path, idx, "k")
    rebuilt = file_bloom_index(spark, path, "k")
    assert sorted(map(tuple, refreshed.collect())) == sorted(
        map(tuple, rebuilt.collect())
    )
    again = refresh_file_bloom_index(spark, path, refreshed, "k")
    assert sorted(map(tuple, again.collect())) == sorted(
        map(tuple, rebuilt.collect())
    )
    # the fresh key is findable through the refreshed index
    r3, kept3, total3 = scan_with_bloom_pruning(
        spark, refreshed, spark.createDataFrame([(999_999_999,)], "k long")
    )
    assert total3 == 10 and kept3 >= 1
    assert r3.filter(F.col("k") == 999_999_999).count() == 1

    with _pytest.raises(ValueError, match="no parquet files"):
        file_bloom_index(spark, str(tmp_path / "nope"), "k")
    with _pytest.raises(ValueError, match="one column"):
        scan_with_bloom_pruning(spark, idx, full)
    # geometry sentinels: probing or refreshing with parameters other
    # than the build's refuses loudly instead of silently pruning
    # matching files (hashing to the wrong bit positions)
    with _pytest.raises(ValueError, match="geometry|built with"):
        scan_with_bloom_pruning(spark, refreshed, probes, n_bits=1 << 19)
    with _pytest.raises(ValueError, match="geometry|built with"):
        refresh_file_bloom_index(spark, path, refreshed, "k", n_hashes=7)


def test_listing_skips_uncommitted_and_handles_evolution(spark, tmp_path):
    """The shared file listing must never index a crashed write's
    _temporary subtree (its part files would be read by explicit path
    and silently duplicate rows), must still walk hive partition dirs,
    and _footer_stats must NULL-fill (not crash) for a column absent
    from an old file's footer — the schema-evolution shape."""
    import os

    import pytest as _pytest

    from gather_datawarehouse_sync_spark.sources.layout import (
        _list_parquet_files,
        file_stats_index,
        refresh_file_stats_index,
        scan_with_file_pruning,
    )

    path = str(tmp_path / "evo_tab")
    spark.createDataFrame(
        [(i, i % 3) for i in range(300)], "x long, p long"
    ).write.partitionBy("p").parquet(path)
    committed = _list_parquet_files(path)
    assert committed and all("p=" in f for f in committed)
    # a crashed write's leftovers: garbage bytes under _temporary —
    # if the listing regressed, the footer read would crash on them
    junk = os.path.join(path, "_temporary", "0")
    os.makedirs(junk)
    with open(os.path.join(junk, "part-junk.parquet"), "wb") as fh:
        fh.write(b"not parquet")
    assert _list_parquet_files(path) == committed

    stats = file_stats_index(spark, path, ["x"]).localCheckpoint()
    assert stats.count() == len(committed)
    # clear the fake crash leftovers: _temporary is also the LIVE
    # staging dir of Hadoop's output committer, and the next append
    # would trip over the junk
    import shutil

    shutil.rmtree(os.path.join(path, "_temporary"))

    # schema evolution: append a file carrying a NEW column, then index
    # BOTH columns — old files get NULL stats (kept conservatively),
    # never a KeyError that kills the job
    spark.createDataFrame(
        [(1000, 0, 7.5)], "x long, p long, y double"
    ).coalesce(1).write.mode("append").parquet(path)
    evolved = file_stats_index(spark, path, ["x", "y"])
    rows = {r["file"]: r for r in evolved.collect()}
    assert len(rows) == len(committed) + 1
    old_rows = [rows[f] for f in committed]
    assert all(r["y_min"] is None and r["y_max"] is None for r in old_rows)
    # conservative keep: a y-predicate cannot prune stat-less files
    _, kept, total = scan_with_file_pruning(
        spark, evolved, {"y": (100.0, 200.0)}
    )
    assert kept == len(committed) and total == len(committed) + 1

    # refresh demands EXACT stat-column parity with the stored index
    with _pytest.raises(ValueError, match="carries extra"):
        refresh_file_stats_index(spark, path, evolved, ["x"])
