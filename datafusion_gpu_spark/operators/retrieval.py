"""Ranked retrieval over the corpus: BM25 scoring.

The reference engine's surface is SQL analytics; a training-data
pipeline additionally needs lightweight corpus retrieval (inspecting
near-neighbors of an eval prompt, mining hard negatives, building
dedup-audit samples). BM25 is the standard lexical ranker and is fully
relational: term frequencies, document frequencies, and length
normalization are three aggregates and two joins — no index structure,
no Python, exactly replayable by a SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datafusion_gpu_spark.operators.dedup import normalize_text


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents by BM25 (Robertson/Sparck Jones, the Lucene
    ``ln(1 + (N - df + 0.5)/(df + 0.5))`` IDF variant) for a bag of
    query terms.

    Shape at scale: the corpus is touched twice map-side (doc lengths
    from an array expression — no explode; term frequencies from an
    explode FILTERED to the query terms, so the tf relation is
    query-sized, not corpus-sized). Document frequencies and the
    (N, avgdl) scalars are dimension-sized aggregates that broadcast.
    The only corpus-keyed shuffle is the final per-doc score sum, and
    the top-k is TakeOrderedAndProject (per-partition heaps), never a
    global sort. Scores round(6) so the DuckDB oracle's fold order
    can't flip ties; doc_id breaks remaining ties.
    """
    from datafusion_gpu_spark.context import ensure_parallelism

    docs = ensure_parallelism(docs)
    words_arr = F.split(normalize_text(F.col(text_col)), " ")
    lens = docs.select("doc_id", F.size(words_arr).alias("dl"))
    stats = lens.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )

    words = docs.select(
        "doc_id", F.explode(words_arr).alias("word")
    ).where(F.col("word").isin(query_terms))
    tf = words.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    df_t = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))

    idf = F.log(
        1.0
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf_norm = (
        F.col("tf")
        * (k1 + 1.0)
        / (
            F.col("tf")
            + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
        )
    )
    scored = (
        tf.join(F.broadcast(df_t), "word")
        .join(lens, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.round(F.sum(idf * tf_norm), 6).alias("bm25"))
    )
    return scored.orderBy(F.col("bm25").desc(), "doc_id").limit(k)
