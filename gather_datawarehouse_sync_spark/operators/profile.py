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
