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


def tfidf_top_terms(
    docs: DataFrame, k: int = 5, min_df: int = 2, text_col: str = "text"
) -> DataFrame:
    """Top-k characteristic terms per document by TF-IDF — the standard
    keyword-extraction / doc-vector step before clustering or topic
    labeling a training corpus.

    tf = in-doc count; idf = ln((N + 1) / (df + 1)) + 1 (the smoothed
    variant, always > 0, so rare-term spam can't divide by zero);
    ``min_df`` drops hapax noise. Shape at scale: one explode, two
    map-side-combining group-bys (doc term counts; corpus df), the df
    relation is vocabulary-sized and broadcast, and the per-doc top-k
    window partitions by doc_id — rows per partition bounded by distinct
    terms per doc, never corpus size. Ranking is (tfidf DESC, term ASC)
    on the rounded score so the oracle's fold order can't flip ties.
    """
    from datafusion_gpu_spark.context import ensure_parallelism
    from pyspark.sql.window import Window

    docs = ensure_parallelism(docs)
    words = docs.select(
        "doc_id", F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("word")
    )
    tf = words.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    df_t = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df")).where(
        F.col("df") >= min_df
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df_t), "word")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "word",
            "tf",
            F.round(
                F.col("tf")
                * (F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("word"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("doc_id", "word", "tf", "tfidf", "rank")
    )


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
