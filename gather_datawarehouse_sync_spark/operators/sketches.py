"""Bounded-memory frequency sketches (extension surface).

The reference has no frequency analysis at all; this module adds the
mergeable-summary tier next to the exact tier (``x_heavy_tokens``'s
full groupBy) and Spark's built-in Datasketches HLL functions (already
exercised in ``tests/test_operators.py::test_hll_sketches_merge_across_shards``).

Why it matters at 100 TB: an exact global ``groupBy(token)`` shuffles
one row per DISTINCT item — fine for a bounded vocabulary, fatal when
the item domain is huge (URLs, n-grams, user ids).  A Misra-Gries
summary caps per-task state at ``k = ⌈1/ε⌉`` counters, ships only those
tiny summaries, and a second exact pass over the (bounded) candidate
set makes the final answer EXACT — so the operator is differentially
testable against plain SQL even though the sketch itself is lossy.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def mg_heavy_hitters(
    df: DataFrame,
    item_col: str,
    eps_milli: int = 10,
) -> DataFrame:
    """EXACT heavy hitters (items with share > ``eps_milli``/1000 of all
    rows) computed with bounded memory: Misra-Gries candidate generation
    + exact verification, the classic two-pass layout.

    Pass 1 — one Misra-Gries summary per task (``mapInPandas``, at most
    ``k = ⌈1000/eps_milli⌉`` counters each; batch-merge then prune by
    the (k+1)-th largest count, the mergeable-summaries operation).
    Pigeonhole guarantees the candidate union is a SUPERSET of the true
    heavy hitters: an item above the global threshold must exceed the
    per-partition threshold in at least one partition, and Misra-Gries
    never evicts an item above its partition threshold.  Candidate
    volume is ≤ partitions·k rows — independent of the item domain.

    Pass 2 — exact counts restricted to candidates (broadcast semi
    join), filtered by the integer-exact share test
    ``count·1000 > N·eps_milli``.

    Because the final filter re-checks EXACT counts, the output is
    identical for any partitioning (property-tested) and equals the
    plain ``GROUP BY ... HAVING`` answer — which is the DuckDB oracle.
    Returns (item, cnt) for items strictly above the share threshold.

    NULL items are excluded entirely — from the candidates AND from the
    denominator (the SQL equivalent carries ``WHERE item IS NOT NULL``);
    pandas ``value_counts`` never counts NULL and a null join key would
    silently drop it from the verify pass, so an explicit contract
    beats a silent half-answer.

    Exactly TWO scans of the input: the sketch pass also carries each
    partition's row count (one sentinel row per summary — items are
    non-null after the filter, so a null item marks the sentinel
    unambiguously), which gives N for the share threshold without a
    third ``count()`` pass.
    """
    if eps_milli <= 0:
        raise ValueError("eps_milli must be positive")
    k = math.ceil(1000 / eps_milli)
    items = df.select(F.col(item_col).alias("item")).filter(
        F.col(item_col).isNotNull()
    )

    def _mg_partial(batches):
        counts: dict = {}
        n_part = 0
        for pdf in batches:
            n_part += len(pdf)
            vc = pdf["item"].value_counts()
            for it, c in vc.items():
                counts[it] = counts.get(it, 0) + int(c)
            if len(counts) > k:
                vals = sorted(counts.values(), reverse=True)
                m = vals[k]  # (k+1)-th largest
                counts = {i: c - m for i, c in counts.items() if c > m}
        yield pd.DataFrame(
            {
                "item": list(counts.keys()) + [None],
                "mg": list(counts.values()) + [n_part],
            }
        )

    # tiny (≤ partitions·(k+1) rows); materialize once — it feeds both
    # the candidate set and the total, and the sketch pass would
    # otherwise re-scan the input per consumer
    summaries = items.mapInPandas(
        _mg_partial, f"item {df.schema[item_col].dataType.simpleString()}, mg long"
    ).localCheckpoint(eager=True)
    n_total = (
        summaries.filter(F.col("item").isNull()).agg(F.sum("mg")).collect()[0][0]
        or 0
    )
    cand = summaries.filter(F.col("item").isNotNull()).select("item").distinct()
    return (
        items.join(F.broadcast(cand), "item")
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") * 1000 > F.lit(n_total) * eps_milli)
    )
