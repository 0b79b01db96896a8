"""Join pruning: shrink the fact side before it shuffles.

Driver-mandated extension surface (SURVEY §2.14).  The reference joins
in driver memory (``src/DataWarehouse.js:204``) so pruning never
matters; at 100 TB the dominant join cost is shuffling fact rows whose
keys have no match at all.  Two tiers, both exact:

1. :func:`semi_prune` / :func:`prefiltered_join` — the explicit form:
   broadcast the build side's *distinct keys* and left-semi the fact
   side against them at the scan.  Right whenever the distinct key set
   fits a broadcast (the common dimension-join case); the semi join is
   exact, so this is pruning with zero false positives.

2. :func:`enable_runtime_bloom` — the Catalyst-native form for build
   sides too big to broadcast: Spark's InjectRuntimeFilter rewrites
   eligible shuffle joins to test the fact side against a Bloom filter
   aggregated from the build side (``BloomFilterMightContain`` in the
   plan).  False positives only — the join still computes the exact
   result.  We enable and bound it rather than re-implement it: the
   optimizer's version runs inside codegen and handles fallback
   heuristics (Spark-first: declare, let Catalyst pick).

``tests/test_plans.py`` pins both shapes: the semi-prune must plan a
broadcast (never a shuffle) for the key set, and the runtime filter
must actually appear in an eligible join's physical plan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def semi_prune(big: DataFrame, small: DataFrame, on: Sequence[tuple[str, str]]) -> DataFrame:
    """Filter ``big`` to rows whose keys appear in ``small`` — an exact
    pre-join prune.  ``on`` maps big→small key columns.  The distinct
    key projection keeps the broadcast minimal (keys only, deduped)."""
    keys = small.select(*[F.col(s).alias(f"_k_{b}") for b, s in on]).distinct()
    cond = [F.col(b) == F.col(f"_k_{b}") for b, _ in on]
    return big.join(F.broadcast(keys), cond, "left_semi")


def prefiltered_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    how: str = "inner",
) -> DataFrame:
    """Exact join with the big side semi-pruned first.  Only flavors
    that don't preserve unmatched right rows are allowed: pruning drops
    big rows *before* the join, which would corrupt right/full outer
    results (the same guard family as ``skew.salted_join``)."""
    if how not in ("inner", "left_semi", "leftsemi"):
        raise ValueError(f"pre-join pruning would corrupt how={how!r}")
    pruned = semi_prune(big, small, [(big_key, small_key)])
    return pruned.join(small, pruned[big_key] == small[small_key], how)


def enable_runtime_bloom(
    spark: SparkSession,
    creation_side_threshold: str = "100MB",
    expected_items: int = 4_000_000,
    max_bits: int = 67_108_864,
) -> None:
    """Turn on Catalyst's runtime Bloom-filter injection for shuffle
    joins whose build side carries a selective filter, and drop the
    application-side size floor so it also fires at test scale (the
    default floor of 10GB targets real clusters; the *mechanism* is the
    same).  Bounded by ``max_bits`` (8MB of filter at the default)."""
    c = spark.conf
    c.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    c.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        creation_side_threshold,
    )
    c.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "0",
    )
    c.set(
        "spark.sql.optimizer.runtime.bloomFilter.expectedNumItems",
        str(expected_items),
    )
    c.set("spark.sql.optimizer.runtime.bloomFilter.maxNumBits", str(max_bits))
