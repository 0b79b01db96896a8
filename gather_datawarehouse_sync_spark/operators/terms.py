"""Term-statistics operators (LLM-pipeline extension surface).

No reference counterpart (the reference never inspects file *content*
beyond its md5, ``src/DataWarehouse.js:44``); these are the standard
corpus-analysis passes a training-data pipeline runs: per-document
distinctive terms (TF-IDF-shaped) and corpus vocabulary statistics.

Scale design: everything is expressed as explode → hash-aggregate →
join → per-group window, i.e. the same shuffle-based shapes the dedup
family uses.  Document-frequency is a vocabulary-keyed aggregation
(bounded by |vocab|, not corpus size); the per-document top-k window
partitions by doc_id, so no global sort or single-partition window
appears anywhere.  Ranking is integer-only (tf desc, df asc, term asc)
— no floating-point scores need to cross the engine boundary, which
keeps the DuckDB oracle hash-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def term_counts(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-(document, term) frequencies over the ascii tokenization the
    dedup/oracle surface shares (``operators.dedup.tokens`` — one
    definition, so the cross-engine hash contract cannot drift)."""
    from gather_datawarehouse_sync_spark.operators.dedup import tokens
    from gather_datawarehouse_sync_spark.session import spread

    return (
        spread(docs)
        .select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def tfidf_topk(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` most distinctive terms per document.

    TF-IDF with an integer-only ordering: rank by term frequency
    descending, document frequency ascending (rarer wins), then term —
    the same ordering ``tf * log(N/df)`` induces for fixed tf, without
    a float score whose last ulp could differ between engines.

    Returns (``id_col``, term, tf, df, rn) with rn ∈ [1, k].
    """
    tf = term_counts(docs, id_col, text_col)
    # document frequency: vocabulary-keyed, bounded by |vocab|; at
    # corpus scale this is the small side and broadcasts back
    df_tbl = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy(id_col).orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("term").asc()
    )
    return (
        tf.join(df_tbl, "term")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(id_col, "term", "tf", "df", "rn")
    )
