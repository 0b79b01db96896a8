"""Deterministic sampling & dataset splitting.

Driver-mandated extension surface (SURVEY §2.14); the reference has no
sampling concept (it always processes the full inventory,
``src/DataWarehouse.js:99``).

Training-data pipelines need splits that are (a) reproducible across
runs/engines/retries, (b) stable under repartitioning, and (c) derived
from the ROW, not from RNG state.  ``F.rand(seed)`` fails (a)/(b) — its
draw depends on partition layout; speculative re-execution can see
different values.  Everything here keys off ``xxhash64`` of an id column
instead: the same row always lands in the same split, on any cluster
layout, at any scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_BUCKETS = 1_000_000


def _stable_order_hash(seed: str, id_col: str) -> Column:
    """The shared stable pseudo-random ordering key,
    ``md5(seed:id)`` — ONE definition so :func:`shuffle_order`,
    :func:`cap_per_group`, and :func:`token_budget_sample` provably
    order rows identically (their cross-operator determinism claims
    depend on this expression staying byte-identical)."""
    return F.md5(F.concat_ws(":", F.lit(seed), F.col(id_col).cast("string")))


def _hash_bucket(id_col: str, salt: str = "", method: str = "xxhash64") -> Column:
    """Uniform bucket ∈ [0, 1e6) from the row id (optionally salted so
    independent samples decorrelate).

    ``method``:

    - ``"xxhash64"`` (default) — Spark's JVM-codegen 64-bit hash of the
      TYPED value; the fast path.
    - ``"md5"`` — the PORTABLE path: ``md5(salt:str(id))`` with the
      first 15 hex chars (60 bits) parsed as an integer.  Every engine
      that has md5 reproduces it bit-for-bit — DuckDB
      ``CAST('0x'||substr(md5(concat_ws(':',salt,CAST(id AS VARCHAR))),
      1,15) AS BIGINT)``, Python ``int(hashlib.md5(...).hexdigest()[:15],
      16)``, Trino ``from_base(...,16)`` — so a split/sample assignment
      can be RE-DERIVED outside Spark for audits, oracle checks, or a
      consumer pipeline on a different stack.  xxhash64's exact bits are
      a Spark implementation detail (seed handling + typed serialization)
      that no other engine reproduces.  ~2× the per-row hash cost; both
      stay whole-stage-codegen, and either is noise next to the scan.
    """
    if method == "xxhash64":
        h = (
            F.xxhash64(F.col(id_col), F.lit(salt))
            if salt
            else F.xxhash64(F.col(id_col))
        )
        return F.pmod(h, F.lit(_BUCKETS))
    if method == "md5":
        return _portable_bucket(F.col(id_col), salt)
    raise ValueError(f"unknown hash method {method!r} (xxhash64 | md5)")


def _portable_bucket(id_col: Column, salt: str = "") -> Column:
    """Engine-portable uniform bucket ∈ [0, 1e6): 60 bits of
    ``md5(salt:str(id))`` mod 1e6 (see :func:`_hash_bucket`).  15 hex
    chars keep the parse inside a signed 64-bit int in every dialect."""
    h = F.md5(F.concat_ws(":", F.lit(salt), id_col.cast("string")))
    return F.pmod(
        F.conv(F.substring(h, 1, 15), 16, 10).cast("long"), F.lit(_BUCKETS)
    )


def deterministic_sample(
    df: DataFrame,
    id_col: str,
    fraction: float,
    salt: str = "",
    method: str = "xxhash64",
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by id hash — reproducible and
    partition-invariant, unlike ``df.sample`` (rows tested in unit tests
    for exact stability across repartitioning).  ``method="md5"`` makes
    the choice engine-portable (see :func:`_hash_bucket`)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    return df.filter(_hash_bucket(id_col, salt, method) < int(fraction * _BUCKETS))


def train_test_split(
    df: DataFrame,
    id_col: str,
    test_fraction: float = 0.1,
    salt: str = "",
    split_col: str = "split",
    method: str = "xxhash64",
) -> DataFrame:
    """Append ``split ∈ {train, test}``: disjoint, exhaustive, and stable
    — a document keeps its split assignment even when the corpus around
    it grows (critical for avoiding train/test leakage across dataset
    versions).  ``method="md5"`` makes the assignment engine-portable —
    an eval-set auditor can re-derive every document's side from the id
    alone, in any stack (see :func:`_hash_bucket`)."""
    if not 0.0 <= test_fraction <= 1.0:
        raise ValueError("test_fraction must be in [0, 1]")
    is_test = _hash_bucket(id_col, salt, method) < int(test_fraction * _BUCKETS)
    return df.withColumn(
        split_col, F.when(is_test, F.lit("test")).otherwise(F.lit("train"))
    )


def stratified_deterministic_sample(
    df: DataFrame,
    id_col: str,
    strata_cols: Sequence[str],
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "",
    method: str = "xxhash64",
) -> DataFrame:
    """Per-stratum hash sampling (e.g. downsample web text to 10% while
    keeping 100% of code): ``fractions`` maps the stratum value (the
    concatenated strata columns) to its keep-rate.  ``method="md5"``
    makes the draw engine-portable (see :func:`_hash_bucket`)."""
    stratum = F.concat_ws("§", *[F.col(c) for c in strata_cols])
    frac = F.lit(default_fraction)
    for value, f in fractions.items():
        frac = F.when(stratum == value, F.lit(f)).otherwise(frac)
    return df.filter(
        _hash_bucket(id_col, salt, method) < (frac * _BUCKETS).cast("long")
    )


def shuffle_order(
    df: DataFrame,
    id_col: str,
    seed: str = "0",
    out_col: str = "train_rank",
    prefix_chars: int = 2,
    cache_input: bool = False,
) -> DataFrame:
    """Deterministic global shuffle for training-example order: rank rows
    by ``md5(seed:id)``.  Reproducible across runs, engines, cluster
    layouts, and retries — unlike ``df.orderBy(F.rand(seed))``, whose
    draws depend on partition layout.  Changing ``seed`` yields an
    independent permutation (epoch reshuffling).

    The rank is computed HIERARCHICALLY, not as one global ordered
    window (which Spark would execute in a single partition —
    ``WindowExec: No Partition Defined``, fatal at scale): the first
    ``prefix_chars`` hex chars of the hash bucket every row (row-local
    expression, and a hash PREFIX, so ordering by bucket-then-hash
    equals ordering by hash); within-bucket ranks run
    partition-parallel; the only sequential step is the cumulative
    bucket-count window over the 16^``prefix_chars`` bucket rows —
    constant-size, data-independent.  Same decomposition as
    :func:`...operators.packing.exclusive_prefix_sum`.

    **Sizing ``prefix_chars``**: each bucket's per-row window is one
    task holding ~n/16^p rows, while the offset window holds 16^p
    bucket rows on one task — pick p so BOTH stay bounded.  p=2 (256
    buckets) covers ~10⁹ rows at ~4M rows/task; 10¹¹-row corpora want
    p=3 (4096 buckets, ~24M rows/task); p=4 (65536) still keeps the
    offset window trivially small.  md5's hex alphabet is uniform, so
    buckets are balanced at any width.  The rank is IDENTICAL at every
    width (a prefix refines, never reorders — pinned as a property
    test), so the knob is purely physical.  When only the ORDER is
    needed (streaming examples to a trainer, no rank column),
    ``df.repartitionByRange(n, hash, id).sortWithinPartitions(hash,
    id)`` realizes it with just the range shuffle.

    The bucket-count branch RECOMPUTES the hash on a narrow
    ``select(id)`` projection instead of caching the input: Spark does
    not share common subtrees across plan branches, but the duplicated
    work is one extra scan of the id column + an md5 — while a
    ``localCheckpoint`` here would materialize EVERY input column
    (document text included) to executor storage just to count bucket
    sizes, the exact anti-pattern at corpus scale (and, measured on
    this box, a 4× wall-clock cliff past ~20M rows as the cached rows
    outgrow memory; the narrow recompute stays linear — SCALE.md r15).
    Same trade-off as :func:`...operators.packing.exclusive_prefix_sum`.
    ``cache_input=True`` restores the checkpoint for callers whose
    upstream is genuinely more expensive than its own re-scan (a long
    curation DAG feeding a SMALL survivor set) — or persist upstream
    yourself and leave it off."""
    if not 1 <= prefix_chars <= 8:
        raise ValueError("prefix_chars must be in [1, 8]")
    h = _stable_order_hash(seed, id_col)
    # double-underscore internals per repo convention; refuse rather
    # than silently overwrite a caller column
    for c in ("__so_h1", "__so_h2", "__so_h3", "__so_b", "__so_off", "__so_n"):
        if c in df.columns:
            raise ValueError(f"shuffle_order: input already has column {c}")
    if cache_input:
        df = df.localCheckpoint(eager=False)

    # The hash is CARRIED AS THREE LONGS (60+60+8 bits of the 128-bit
    # md5), not as its 32-char hex string: fixed-width lowercase hex
    # orders identically to its numeric value, so sorting by
    # (h1, h2, h3) IS sorting by the hex string — same ranks, but the
    # shuffled sort key shrinks from a 32-byte string to 24 bytes of
    # longs and every comparison is integer, not character-wise
    # (measured on this box: the string form GC-thrashed at 50M rows,
    # the long form stays linear — SCALE.md r15).  The bucket is then
    # h1 // 16^(15-p) — the hash PREFIX as an integer, monotone in the
    # string prefix, so bucket-then-key order still equals hash order.
    def _keyed(frame: DataFrame) -> DataFrame:
        return frame.select(
            *frame.columns,
            F.conv(F.substring(h, 1, 15), 16, 10).cast("long").alias("__so_h1"),
            F.conv(F.substring(h, 16, 15), 16, 10).cast("long").alias("__so_h2"),
            F.conv(F.substring(h, 31, 2), 16, 10).cast("long").alias("__so_h3"),
        ).withColumn(
            "__so_b",
            (F.col("__so_h1") / F.lit(16 ** (15 - prefix_chars))).cast("long"),
        )

    with_b = _keyed(df)
    bcounts = (
        _keyed(df.select(id_col))
        .groupBy("__so_b")
        .agg(F.count(F.lit(1)).alias("__so_n"))
    )
    # ≤ 16^prefix_chars rows: the global window is bounded by the bucket
    # alphabet, not the data
    wb = Window.orderBy("__so_b").rowsBetween(Window.unboundedPreceding, -1)
    boff = bcounts.select(
        "__so_b", F.coalesce(F.sum("__so_n").over(wb), F.lit(0)).alias("__so_off")
    )
    win = Window.partitionBy("__so_b").orderBy(
        "__so_h1", "__so_h2", "__so_h3", F.col(id_col)
    )
    return (
        with_b.join(F.broadcast(boff), "__so_b")
        # long, not int: the rank is a GLOBAL row number and this
        # operator's own sizing notes cover 10^10-10^11-row corpora —
        # an int would wrap negative past 2^31 rows
        .withColumn(
            out_col, (F.col("__so_off") + F.row_number().over(win)).cast("long")
        )
        .drop("__so_h1", "__so_h2", "__so_h3", "__so_b", "__so_off")
    )


def leakage_safe_split(
    df: DataFrame,
    pairs: DataFrame | None,
    id_col: str,
    test_fraction: float = 0.1,
    salt: str = "",
    split_col: str = "split",
    components: DataFrame | None = None,
    method: str = "xxhash64",
) -> DataFrame:
    """Train/test split at NEAR-DUP-CLUSTER granularity: a plain
    per-document split puts near-duplicates on opposite sides, leaking
    eval content into training — the standard fix is to split whole
    duplicate clusters, not documents.

    ``pairs`` is any near-dup edge list (a, b) — exact Jaccard,
    MinHash-LSH, embedding cosine; connected components collapse it to
    clusters, every document keys its split hash on its CLUSTER id
    (component minimum; un-paired documents key on themselves), so all
    members inherit one side.  Same hash-based determinism contract as
    :func:`train_test_split`: reproducible, partition-invariant, and
    stable as the corpus grows — a cluster keeps its side across
    dataset versions unless new edges merge it into another cluster
    (which genuinely changes its identity).

    Cost: the components rounds over the (sparse) edge list + one
    broadcast-sized join of the cluster map back onto the corpus — the
    corpus itself shuffles only if the planner declines the broadcast.

    At scale, pass ``components=`` — a PRECOMPUTED (id, component)
    cluster map (exactly what :func:`...dedup.connected_components`
    emits, typically a persisted per-corpus-version artifact): the
    iterative CC rounds are the expensive stage and belong to corpus
    curation, not to every split call.  With ``components`` given,
    ``pairs`` may be None and no CC runs here; the two paths are
    identical by construction (the map IS the CC output —
    parity-pinned in tests).
    """
    from gather_datawarehouse_sync_spark.operators.dedup import (
        connected_components,
    )

    if not 0.0 <= test_fraction <= 1.0:
        raise ValueError("test_fraction must be in [0, 1]")
    for c in ("__ls_id", "__ls_comp", "__ls_key"):
        if c in df.columns:
            raise ValueError(f"leakage_safe_split: input already has column {c}")
    if components is None:
        if pairs is None:
            raise ValueError("leakage_safe_split: pass pairs or components")
        components = connected_components(pairs.select("a", "b"))
    comp = components.select(
        F.col("id").alias("__ls_id"), F.col("component").alias("__ls_comp")
    )
    joined = df.join(
        comp, df[id_col] == comp["__ls_id"], "left"
    ).withColumn("__ls_key", F.coalesce(F.col("__ls_comp"), df[id_col]))
    if method == "md5":
        bucket = _portable_bucket(F.col("__ls_key"), salt)
    elif method == "xxhash64":
        bucket = F.pmod(
            F.xxhash64(F.col("__ls_key"), F.lit(salt))
            if salt
            else F.xxhash64(F.col("__ls_key")),
            F.lit(_BUCKETS),
        )
    else:
        raise ValueError(f"unknown hash method {method!r} (xxhash64 | md5)")
    is_test = bucket < int(test_fraction * _BUCKETS)
    return joined.withColumn(
        split_col, F.when(is_test, F.lit("test")).otherwise(F.lit("train"))
    ).drop("__ls_id", "__ls_comp", "__ls_key")


def weighted_interleave(
    df: DataFrame,
    source_col: str,
    weights_milli: dict[str, int],
    id_col: str,
    default_weight_milli: int = 1000,
    key_col: str = "mix_key",
    rn_col: str = "src_rn",
    id_block_size: int = 4096,
) -> DataFrame:
    """Training-mix construction by stride scheduling: append a
    deterministic interleave key so that ordering by (``key_col``,
    source, id) yields a stream where each source appears in proportion
    to its weight — the "sample source A at 3×" stage of building a
    training mixture, independent of the sources' raw corpus shares
    (until a source exhausts).

    Classic virtual-time scheduling: the n-th row of source s gets key
    ``⌊n·10⁶ / weight_s⌋`` — integer arithmetic only (``DIV``), so the
    key is bit-identical across engines and reruns.  Per-source
    positions are ordered by ``id_col``; for a *shuffled* mix feed the
    output of :func:`shuffle_order` and pass its rank as ``id_col``.

    The downstream ordering is a sort (range exchange), NOT a global
    window — consumers ``orderBy(key_col, source, id)`` or
    ``repartitionByRange(...).sortWithinPartitions(...)`` to stream the
    mix at scale.  A source absent from ``weights_milli`` weighs
    ``default_weight_milli``.

    The per-source ordinal does NOT serialize a source on one task
    when ``id_col`` is numeric: rows block by
    ``floor(id / id_block_size)`` (order-preserving, row-local), the
    per-source sequential window runs over the ~n/``id_block_size``
    BLOCK-count rows only, and within-block ranks run parallel per
    (source, block) — :func:`...operators.packing.exclusive_prefix_sum`
    with count as the summand.  A training mix has a handful of
    sources, so the one-window-partition-per-source fallback (kept for
    non-numeric ids) caps parallelism at ~10 tasks however large the
    corpus; the numeric path is what 10⁹-rows-per-source needs.  Pass
    :func:`shuffle_order`'s rank as ``id_col`` for a shuffled mix —
    it is numeric.
    """
    for c in (
        rn_col,
        key_col,
        "__wi_wm",
        "__wi_g",
        "__wi_off",
        "__wi_n",
        "__wi_s2",
        "__wi_g2",
    ):
        if c in df.columns:
            raise ValueError(f"weighted_interleave: column collision on {c}")
    if default_weight_milli <= 0 or any(v <= 0 for v in weights_milli.values()):
        # a zero weight would DIV to NULL (non-ANSI) and silently sort
        # the whole source to one end instead of erroring
        raise ValueError("weighted_interleave: weights must be positive")
    if id_block_size <= 0:
        raise ValueError("weighted_interleave: id_block_size must be positive")
    from pyspark.sql.types import NumericType

    from gather_datawarehouse_sync_spark.functions.scalar import lit_map

    wmap = lit_map(weights_milli)
    if isinstance(df.schema[id_col].dataType, NumericType):
        blk = F.floor(F.col(id_col) / F.lit(id_block_size))
        bcounts = (
            df.select(F.col(source_col), blk.alias("__wi_g"))
            .groupBy(source_col, "__wi_g")
            .agg(F.count(F.lit(1)).alias("__wi_n"))
        )
        wg = (
            Window.partitionBy(source_col)
            .orderBy("__wi_g")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        goff = bcounts.select(
            source_col,
            "__wi_g",
            F.coalesce(F.sum("__wi_n").over(wg), F.lit(0)).alias("__wi_off"),
        )
        wl = Window.partitionBy(source_col, "__wi_g").orderBy(F.col(id_col))
        # null-SAFE join: a NULL id blocks to a NULL __wi_g (and the
        # source itself may be NULL) — an equi-join on those keys would
        # silently DROP the rows, whereas the window fallback below
        # keeps them (window partition/order treat NULL as a value,
        # NULLS FIRST ascending — which is exactly where the NULL block
        # sorts in the offset cumsum, so ranks stay consistent)
        goff2 = goff.select(
            F.col(source_col).alias("__wi_s2"),
            F.col("__wi_g").alias("__wi_g2"),
            "__wi_off",
        )
        ranked = (
            df.withColumn("__wi_g", blk)
            .join(
                F.broadcast(goff2),
                F.col(source_col).eqNullSafe(F.col("__wi_s2"))
                & F.col("__wi_g").eqNullSafe(F.col("__wi_g2")),
            )
            .withColumn(
                rn_col, (F.col("__wi_off") + F.row_number().over(wl)).cast("long")
            )
            .drop("__wi_g", "__wi_off", "__wi_s2", "__wi_g2")
        )
    else:
        w = Window.partitionBy(source_col).orderBy(F.col(id_col))
        ranked = df.withColumn(rn_col, F.row_number().over(w).cast("long"))
    return (
        ranked.withColumn(
            "__wi_wm",
            F.coalesce(wmap[F.col(source_col)], F.lit(default_weight_milli)).cast(
                "long"
            ),
        )
        .withColumn(
            key_col, F.expr(f"CAST(({rn_col} * 1000000) DIV __wi_wm AS BIGINT)")
        )
        .drop("__wi_wm")
    )


def temperature_resample(
    df: DataFrame,
    group_col: str = "lang",
    id_col: str = "doc_id",
    alpha_milli: int = 500,
    seed: str = "temp",
    copy_col: str = "copy",
    max_groups: int = 100_000,
) -> DataFrame:
    """Temperature-based group rebalancing — the multilingual-pretraining
    resampling recipe (Lample & Conneau 2019 §3.1; XLM-R): draw groups
    with probability ``q_g ∝ n_g^α`` instead of their raw share, so
    low-resource groups are UPsampled (docs replicated) and huge groups
    DOWNsampled (docs dropped), keeping the output size ≈ the input
    size.  ``α = alpha_milli/1000`` ∈ (0, 1]; 1000 = no change, smaller
    = flatter.

    Exact-integer contract: per-group weights are
    ``w_g = ⌊√n_g · 10⁶⌋`` (α = 0.5; IEEE sqrt is correctly rounded, so
    every engine computes the identical integer — for other α the
    ``pow`` is engine-libm-dependent and the operator documents
    approximate cross-engine identity only).  Shares quantize to milli
    (``q_milli = w·1000 DIV Σw``) and each group's micro replication
    factor is ``r_micro = N · q_milli · 1000 DIV n_g`` — int64-safe to
    ~9·10⁹ docs.  A doc emits ``r_micro DIV 10⁶`` copies plus one more
    when its hash fraction (first 8 hex chars of ``md5(seed:id)`` mod
    10⁶ — engine-portable, unlike xxhash) clears the remainder, making
    the materialized epoch reproducible row-for-row on any engine or
    layout.

    Scale shape: ONE tiny aggregation (a row per group, driver-collected
    — the vocab-bounded-collect class, guarded by ``max_groups``), then
    a scan-side map lookup + explode; no corpus-sized shuffle, no RNG
    state.  Rows whose group is NULL drop (no defensible share exists
    for them; filter or coalesce upstream to keep them).

    Returns the resampled table: every input column plus ``copy_col``
    (1-based copy index) — rows with zero copies are gone, upsampled
    rows appear once per copy.
    """
    import math

    if not 1 <= alpha_milli <= 1000:
        raise ValueError("alpha_milli must be in [1, 1000]")
    from gather_datawarehouse_sync_spark.functions.scalar import lit_map
    from gather_datawarehouse_sync_spark.session import spread

    for c in (copy_col, "__tr_nc", "__tr_rm"):
        if c in df.columns:
            raise ValueError(f"temperature_resample: column collision on {c}")
    counts = (
        # no spread: a pre-aggregation repartition only ADDS an exchange
        # to a count that already combines map-side into ≤ |groups| rows
        # and reads one column (r19; spread stays on the OUTPUT path,
        # where the per-row md5 is the heavy map work)
        df.filter(F.col(group_col).isNotNull())
        .groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .limit(max_groups + 1)
        .collect()
    )
    if len(counts) > max_groups:
        raise ValueError(
            f"temperature_resample: over {max_groups} groups - this keys "
            "off a bounded group column (language, domain), not an id"
        )
    n_by = {r[group_col]: r["n"] for r in counts}
    if not n_by:
        return df.withColumn(copy_col, F.lit(1).cast("bigint")).limit(0)
    total = sum(n_by.values())
    if alpha_milli == 1000:
        w_by = {g: n * 1_000_000 for g, n in n_by.items()}
    elif alpha_milli == 500:
        w_by = {g: math.floor(math.sqrt(n) * 1_000_000.0) for g, n in n_by.items()}
    else:  # engine-libm-dependent; see docstring
        w_by = {
            g: math.floor(math.pow(n, alpha_milli / 1000.0) * 1_000_000.0)
            for g, n in n_by.items()
        }
    s = sum(w_by.values())
    r_micro_by = {
        g: (total * ((w_by[g] * 1000) // s) * 1000) // n_by[g] for g in n_by
    }
    rmap = lit_map(r_micro_by)
    r_micro = rmap[F.col(group_col)]
    hfrac = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(":", F.lit(seed), F.col(id_col).cast("string"))
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 1_000_000
    )
    return (
        spread(df)
        .withColumn("__tr_rm", r_micro.cast("bigint"))
        # integer DIV, not float '/': r_micro reaches total·10⁶/n_g,
        # which exceeds 2^53 exact-double range on multi-billion-row
        # corpora with tiny groups — a float quotient there would be
        # off by a ulp and mint a wrong copy count
        .withColumn(
            "__tr_nc",
            F.expr("CAST(__tr_rm DIV 1000000 AS BIGINT)")
            + F.when(hfrac < F.pmod(F.col("__tr_rm"), 1_000_000), 1)
            .otherwise(0).cast("bigint"),
        )
        .drop("__tr_rm")
        # explode(NULL) drops the row: covers null groups (map miss) and
        # zero-copy docs without a sequence(1, 0) = [1, 0] footgun
        .withColumn(
            copy_col,
            F.explode(
                F.when(
                    F.col("__tr_nc") >= 1,
                    F.sequence(F.lit(1).cast("bigint"), F.col("__tr_nc")),
                )
            ),
        )
        .drop("__tr_nc")
    )


def token_budget_sample(
    df: DataFrame,
    group_col: str,
    tokens_col: str,
    budget_tokens: int,
    id_col: str,
    seed: str = "0",
) -> DataFrame:
    """Select documents until each group's TOKEN budget is spent — the
    "build an N-token mix per source" stage (domain caps bound rows;
    training budgets are token-denominated).

    Docs are taken in deterministic ``md5(seed:id)`` hash order (the
    same stable pseudo-random order as :func:`cap_per_group`); a doc is
    kept while the running token total BEFORE it is still under budget,
    so the budget may overshoot by at most one document (greedy
    prefix — the standard corpus-assembly rule; a doc is never split).
    One shuffle (the per-group window); exact integer arithmetic
    end-to-end, so the selection is reproducible on any engine or
    cluster layout.  Adds ``cum_tokens`` (running total INCLUDING the
    row) to the kept rows.

    A skewed group does NOT serialize on one task: selection runs in
    TWO phases.  Phase 1 computes the running total within
    (group, hash-prefix shard) — parallel across 256 shards per group
    (two hex chars of the hash) — and drops every row whose SHARD-local
    cumulative-before already exceeds the budget (shard predecessors
    are a subset of group predecessors, so the shard total is a lower
    bound on the true one: the drop is provably safe).  Phase 2 runs
    the exact group window on the survivors, whose per-group volume is
    bounded by ~256 × ``budget_tokens`` worth of tokens,
    independent of the group's row count (and if no phase-1
    row was dropped, the survivor cumsum IS the full cumsum; if one
    was, its shard's surviving prefix alone already exceeds the
    budget, so every later row is still correctly dropped — exactness
    is pinned by the serial-oracle property test).  Requires
    non-negative token counts (the running total must be monotone for
    the shard bound to hold).
    """
    if budget_tokens <= 0:
        raise ValueError("budget_tokens must be positive")
    for c in ("cum_tokens", "__tb_h", "__tb_b", "__tb_c"):
        if c in df.columns:
            raise ValueError(f"token_budget_sample: input already has column {c}")
    h = _stable_order_hash(seed, id_col)
    w1 = (
        Window.partitionBy(group_col, "__tb_b")
        .orderBy("__tb_h", F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pre = (
        df.withColumn("__tb_h", h)
        .withColumn("__tb_b", F.substring(F.col("__tb_h"), 1, 2))
        .withColumn("__tb_c", F.sum(F.col(tokens_col)).over(w1).cast("long"))
        .filter(F.col("__tb_c") - F.col(tokens_col) < budget_tokens)
        .drop("__tb_c")
    )
    w2 = (
        Window.partitionBy(group_col)
        .orderBy("__tb_h", F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        pre.withColumn("cum_tokens", F.sum(F.col(tokens_col)).over(w2).cast("long"))
        .filter(F.col("cum_tokens") - F.col(tokens_col) < budget_tokens)
        .drop("__tb_h", "__tb_b")
    )


def cap_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    id_col: str,
    cap: int,
    seed: str = "0",
) -> DataFrame:
    """Domain balancing (C4/RefinedWeb-style): keep at most ``cap`` rows
    per group, chosen by id-hash order so the survivors are a stable
    pseudo-random subset — a dominant domain can't flood the corpus, and
    reruns/engine-swaps keep exactly the same rows.

    A dominant group does NOT serialize on one task: the cap applies in
    TWO phases (the classic distributed top-k-per-key shape).  Phase 1
    ranks within (group, hash-prefix shard) — 256 shards per group,
    parallel — and drops rows ranked past ``cap`` there: shard
    predecessors are a subset of group predecessors, so shard rank
    lower-bounds group rank and the drop is provably lossless.  Phase 2
    ranks the survivors exactly, on a partition bounded by
    256 × ``cap`` rows regardless of group size.  (Phase-2 ranks over
    survivors equal full-set ranks for every kept row: any dropped row
    carries ≥ ``cap`` surviving shard predecessors, so rows after it
    already rank past the cap.)"""
    if cap <= 0:
        raise ValueError("cap must be positive")
    for c in ("__cap_rn", "__cap_h", "__cap_b"):
        if c in df.columns:
            raise ValueError(f"cap_per_group: input already has column {c}")
    h = _stable_order_hash(seed, id_col)
    w1 = Window.partitionBy(*group_cols, "__cap_b").orderBy(
        "__cap_h", F.col(id_col)
    )
    pre = (
        df.withColumn("__cap_h", h)
        .withColumn("__cap_b", F.substring(F.col("__cap_h"), 1, 2))
        .withColumn("__cap_rn", F.row_number().over(w1))
        .filter(F.col("__cap_rn") <= cap)
        .drop("__cap_rn")
    )
    w2 = Window.partitionBy(*group_cols).orderBy("__cap_h", F.col(id_col))
    return (
        pre.withColumn("__cap_rn", F.row_number().over(w2))
        .filter(F.col("__cap_rn") <= cap)
        .drop("__cap_rn", "__cap_h", "__cap_b")
    )


def bucketed_negatives(
    df: DataFrame,
    id_col: str,
    k: int = 3,
    seed: str = "0",
    bucket_chars: int = 2,
    out_col: str = "neg_id",
) -> DataFrame:
    """Deterministic in-shard NEGATIVE SAMPLING for contrastive training
    (retrieval / embedding models): each row gets ``k`` pseudo-random
    negatives drawn from its hash shard — the distributed form of
    in-batch negatives, with the reproducibility contract the rest of
    the sampling family carries (md5 order: stable across engines,
    layouts, retries, and corpus growth within a shard).

    Mechanics: rows shard by the first ``bucket_chars`` hex chars of
    ``md5(seed:id)`` (uniform — md5's hex alphabet is unbiased);
    within a shard, rows rank by the same hash, and row r's j-th
    negative is the row at rank ``((r−1+j) mod cnt)+1`` — the j-th
    successor on the shard's hash ring.  ``j`` is capped at ``cnt−1``
    (a full ring lap would revisit rows), so every row gets
    ``min(k, cnt−1)`` DISTINCT negatives — never itself, never a
    duplicate — and every row is sampled AS a negative equally often
    (each rank is hit by exactly min(k, cnt−1) predecessors).

    Cost: one shuffle on the shard key + a shard-local rank join —
    no global window, no RNG state; shards are hash-balanced so the
    rank window stays bounded (16^``bucket_chars`` shards; size the
    width like :func:`shuffle_order`'s ``prefix_chars``).

    Returns (``id_col``, j, ``out_col``) with j ∈ 1..k.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if not 1 <= bucket_chars <= 8:
        raise ValueError("bucket_chars must be in [1, 8]")
    for c in ("__bn_h", "__bn_b", "__bn_rn", "__bn_cnt", "__bn_j"):
        if c in df.columns:
            raise ValueError(f"bucketed_negatives: input already has column {c}")
    h = _stable_order_hash(seed, id_col)
    ranked = (
        df.select(id_col)
        .withColumn("__bn_h", h)
        .withColumn("__bn_b", F.substring(F.col("__bn_h"), 1, bucket_chars))
        .withColumn(
            "__bn_rn",
            F.row_number().over(
                Window.partitionBy("__bn_b").orderBy("__bn_h", F.col(id_col))
            ),
        )
        .withColumn(
            "__bn_cnt", F.count(F.lit(1)).over(Window.partitionBy("__bn_b"))
        )
        .localCheckpoint(eager=False)
    )
    probes = (
        ranked.select(
            F.col(id_col),
            "__bn_b",
            "__bn_cnt",
            F.explode(F.sequence(F.lit(1), F.lit(k))).alias("__bn_j"),
            F.col("__bn_rn"),
        )
        # j ≤ cnt−1: a full ring lap would revisit rows — this is what
        # makes the k negatives DISTINCT (and drops singleton shards)
        .filter(F.col("__bn_j") <= F.col("__bn_cnt") - 1)
        .withColumn(
            "__bn_tgt",
            (F.pmod(F.col("__bn_rn") - 1 + F.col("__bn_j"), F.col("__bn_cnt")) + 1),
        )
    )
    ring = ranked.select(
        F.col("__bn_b").alias("__bn_b2"),
        F.col("__bn_rn").alias("__bn_tgt2"),
        F.col(id_col).alias(out_col),
    )
    return (
        probes.join(
            ring,
            (F.col("__bn_b") == F.col("__bn_b2"))
            & (F.col("__bn_tgt") == F.col("__bn_tgt2")),
        )
        .filter(F.col(out_col) != F.col(id_col))
        .select(F.col(id_col), F.col("__bn_j").alias("j"), F.col(out_col))
    )
