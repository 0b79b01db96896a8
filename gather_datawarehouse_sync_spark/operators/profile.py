"""Data-quality profiling: per-column completeness/cardinality/range.

Driver-mandated extension surface (SURVEY §2.14); the closest reference
concept is the post-sync verify count (``src/DataWarehouse.js:688-704``),
which checks one number — this generalizes it to the Great-Expectations
style table profile a training pipeline gates ingests on (null-rate
spikes, cardinality collapse, range drift).

Scale shape: ONE aggregate job for the whole profile — all columns'
stats are computed in a single ``agg`` pass (Catalyst plans multiple
``count_distinct`` via one Expand + two-phase aggregate), then the
1-row × k-column result is unpivoted driver-side to the long format.
The naive per-column loop would scan the table k times.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """Long-format quality profile: one row per column with total/null/
    distinct counts and min/max rendered as strings (``%.2f`` for
    floating columns so the rendering is engine-portable, raw cast for
    the rest)."""
    cols = list(cols) if cols is not None else df.columns
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        is_float = dict(df.dtypes)[c] in ("double", "float")
        fmt = (
            (lambda x: F.format_string("%.2f", x))
            if is_float
            else (lambda x: x.cast("string"))
        )
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"_null_{c}"),
            F.count_distinct(F.col(c)).alias(f"_dist_{c}"),
            fmt(F.min(c)).alias(f"_min_{c}"),
            fmt(F.max(c)).alias(f"_max_{c}"),
        ]
    wide = df.agg(*aggs)
    per_col = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("_n").alias("n"),
            F.col(f"_null_{c}").alias("n_null"),
            F.col(f"_dist_{c}").alias("n_distinct"),
            F.col(f"_min_{c}").alias("min_s"),
            F.col(f"_max_{c}").alias("max_s"),
        )
        for c in cols
    ]
    return wide.select(F.explode(F.array(*per_col)).alias("s")).select("s.*")


def score_histogram(
    df: DataFrame,
    score_col: str,
    bin_width: int = 1000,
    count_col: str = "ref_n",
) -> DataFrame:
    """Fixed-width integer histogram (bin, count) of ``score_col`` —
    the persistable half of the drift gate: store the REFERENCE
    corpus's histogram once per version (a few-row parquet artifact)
    and every acceptance check joins against it instead of re-scanning
    the reference."""
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    b = (F.col(score_col) - F.pmod(F.col(score_col), F.lit(bin_width))) / F.lit(
        bin_width
    )
    return (
        df.select(b.cast("long").alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias(count_col))
    )


def drift_against_profile(
    profile_hist: DataFrame,
    new: DataFrame,
    score_col: str,
    bin_width: int = 1000,
) -> DataFrame:
    """Drift report of ``new`` against a PRECOMPUTED reference
    histogram (:func:`score_histogram` output, typically a persisted
    per-corpus-version artifact): only the new side is scanned — the
    incremental form :func:`distribution_drift` delegates to, and the
    per-micro-batch shape the streaming monitor uses.  Output columns
    and exact-integer share arithmetic identical to
    :func:`distribution_drift`."""
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    return share_drift(
        profile_hist, score_histogram(new, score_col, bin_width, count_col="new_n")
    )


def share_drift(ref_hist: DataFrame, new_hist: DataFrame) -> DataFrame:
    """Share-delta report between two prebuilt (bin, count) histograms
    — the join/arithmetic core shared by the score-distribution drift
    gates here and the quantizer cell-share drift gate
    (``operators/similarity.quantizer_drift``): anything that bins is
    comparable.  Inputs: (bin, ref_n) and (bin, new_n)."""
    # lazy checkpoint: `joined` feeds BOTH the totals aggregate and the
    # output projection, and Spark does not share common subtrees
    # across plan branches — without it both bin aggregations and the
    # full-outer join execute twice (the shuffle_order pattern)
    joined = (
        ref_hist.select("bin", "ref_n")
        .join(new_hist.select("bin", "new_n"), "bin", "full_outer")
        .select(
            "bin",
            F.coalesce("ref_n", F.lit(0)).alias("ref_n"),
            F.coalesce("new_n", F.lit(0)).alias("new_n"),
        )
        .localCheckpoint(eager=False)
    )
    totals = joined.agg(
        F.sum("ref_n").alias("__rt"), F.sum("new_n").alias("__nt")
    )
    out = joined.crossJoin(F.broadcast(totals))
    share = lambda c, t: F.when(  # noqa: E731
        F.col(t) > 0,
        (F.col(c) * 10000 - F.pmod(F.col(c) * 10000, F.col(t))) / F.col(t),
    ).otherwise(0).cast("long")
    return out.select(
        "bin",
        "ref_n",
        "new_n",
        share("ref_n", "__rt").alias("ref_share_bp"),
        share("new_n", "__nt").alias("new_share_bp"),
        (share("new_n", "__nt") - share("ref_n", "__rt")).alias("delta_bp"),
    )


def distribution_drift(
    ref: DataFrame,
    new: DataFrame,
    score_col: str,
    bin_width: int = 1000,
) -> DataFrame:
    """Binned distribution-drift report between two corpus versions —
    the quality-monitoring gate a crawl pipeline runs before accepting
    a new batch (a PSI-style check, kept in exact integers so it
    hash-compares across engines; consumers needing the PSI scalar
    apply ln() to the share columns, the one genuinely float step).

    ``score_col`` must be an integer metric (e.g. quality basis points);
    rows bin at ``bin_width`` (integer DIV — fixed bins, no quantile
    pass, no global window).  Output: one row per bin present on either
    side, with counts and per-side shares in basis points (integer DIV
    of each side's total) plus the share delta.

    Scale shape: one groupBy per side over (bin), a broadcast-sized
    full-outer join of the two bin tables, and two scalar totals
    carried via window-free cross-join of 1-row aggregates — the corpus
    shuffles only the (bin, count) pairs.  Delegates to
    :func:`score_histogram` + :func:`drift_against_profile`, so the
    incremental (stored-histogram) form is the SAME code path.
    """
    return drift_against_profile(
        score_histogram(ref, score_col, bin_width), new, score_col, bin_width
    )
