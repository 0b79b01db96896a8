"""Vector similarity search over an embedding column (extension surface).

Not present in the reference (its only notion of similarity is exact md5
equality, ``src/DataWarehouse.js:558``); mandated by the driver's
LLM-pipeline extension list.  Two tiers:

- brute-force exact top-k: fine to ~1e6 vectors × small k — the
  correctness baseline and the oracle for the approximate path;
- LSH-bucketed (random hyperplane signs) approximate top-k: candidates
  only within matching buckets, the 100 TB path (bounded fan-out instead
  of an all-pairs cross join).

Dot products use ``F.zip_with`` + ``F.aggregate`` — JVM-side, codegen'd,
no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from gather_datawarehouse_sync_spark.operators.dedup import spread


def dot(a: Column, b: Column) -> Column:
    """Elementwise product then sum — all JVM-side."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "dot",
) -> DataFrame:
    """Exact top-k neighbors for each query vector.

    Cross join (queries × corpus) → score → ``row_number`` per query.
    The cross join broadcasts the smaller side; cost is |Q|·|C| scoring
    ops spread over the cluster — the exact baseline you validate the
    approximate path against.  Ties broken by minimum neighbor id
    (deterministic, matches the Q43 oracle).

    Returns (query_id, neighbor_id, score, rank).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    # the corpus is the big side: spread it so the per-pair scoring loop
    # parallelizes even when the input arrives as one parquet file
    c = spread(corpus).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    )
    score = {
        "dot": dot(F.col("__qv"), F.col("__cv")),
        "cosine": cosine(F.col("__qv"), F.col("__cv")),
    }[metric]
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("score", score)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    num_planes: int = 8,
    num_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k via random-hyperplane LSH (sign sketches).

    ``num_tables`` independent sketches of ``num_planes`` hyperplanes
    each; a query only scores corpus vectors sharing a bucket in at least
    one table.  Join key = (table, bucket) — a plain shuffle join with
    bounded fan-out, no cross join: the scale path.  Recall improves with
    more tables; exactness is *not* guaranteed (validated against
    :func:`brute_force_topk` in tests, never hash-compared).
    """
    import random

    rng = random.Random(seed)
    planes = [
        [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(num_planes)]
        for _ in range(num_tables)
    ]

    def bucket_col(vec: Column, table: int) -> Column:
        bits = []
        for p, plane in enumerate(planes[table]):
            proj = dot(vec, F.array(*[F.lit(v) for v in plane]))
            bits.append(F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0)))
        acc = bits[0]
        for b in bits[1:]:
            acc = acc + b
        return acc

    def with_buckets(df: DataFrame, idn: str, vecn: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(idn),
            F.col(vec_col).alias(vecn),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("table"),
                            bucket_col(F.col(vec_col), t).alias("bucket"),
                        )
                        for t in range(num_tables)
                    ]
                )
            ).alias("tb"),
        ).select(idn, vecn, "tb.table", "tb.bucket")

    qb = with_buckets(queries, "query_id", "__qv")
    cb = with_buckets(spread(corpus), "neighbor_id", "__cv")
    cand = (
        qb.join(cb, ["table", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "__qv", "__cv")
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("score", dot(F.col("__qv"), F.col("__cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )
