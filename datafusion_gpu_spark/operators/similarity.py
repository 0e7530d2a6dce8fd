"""Similarity search over embedding columns (array<float>).

Two tiers, same contract:

- ``cosine_topk_bruteforce``: exact top-k. The query set is broadcast
  (it is small by construction), the corpus is scanned once, and the
  per-query top-k is a window over (query, score) — at 1000 executors
  that is one corpus pass with no corpus shuffle at all.
- ``lsh_ann_topk``: approximate top-k via signed-random-projection LSH.
  Deterministic hyperplanes (seeded), bucket equality join instead of a
  cross join — the 100 TB path where even one corpus x query scan per
  query batch is too much. Probe over multiple hash tables to trade
  recall for cost.

The cosine itself is a JVM fold (zip_with + aggregate) in float64 — no
Python, stays inside codegen.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    """Float64 dot product of two array<float> columns (JVM fold)."""
    prod = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prod, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk_bruteforce(
    corpus: DataFrame, queries: DataFrame, k: int = 10
) -> DataFrame:
    """Exact top-k neighbors per query vector.

    ``queries`` (vec_id, embedding) is broadcast; corpus partitions never
    move. Ties broken by vec_id so results are deterministic.
    """
    q = F.broadcast(
        queries.select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
        )
    )
    c = corpus.select(F.col("vec_id").alias("vec_id"), F.col("embedding").alias("ce"))
    scored = q.crossJoin(c).where(F.col("query_id") != F.col("vec_id"))
    cs = cosine_similarity(F.col("qe"), F.col("ce"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id")
    )
    return (
        scored.select("query_id", "vec_id", F.round(cs, 6).alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def _hyperplanes(dim: int, planes: int, seed: int) -> list[list[float]]:
    """Deterministic +-1 hyperplanes (seeded NumPy, tiny, broadcast as
    literals into the plan)."""
    rng = np.random.default_rng(seed)
    return (rng.integers(0, 2, size=(planes, dim)) * 2.0 - 1.0).tolist()


def lsh_bucket(emb: Column, planes: list[list[float]]) -> Column:
    """Signed-random-projection bucket id: bit p = sign(emb . plane_p)."""
    bucket = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        proj = dot(emb, F.array(*[F.lit(v) for v in plane]).cast("array<float>"))
        bucket = bucket.bitwiseOR(
            F.when(proj > 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(
                F.lit(0).cast("long")
            )
        )
    return bucket


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    planes: int = 12,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket, then
    exact cosine rerank within candidates. Recall rises with fewer planes
    (bigger buckets) or multiple tables; this single-table variant is the
    skeleton the scale path tunes."""
    hp = _hyperplanes(dim, planes, seed)
    c = corpus.select(
        F.col("vec_id").alias("vec_id"),
        F.col("embedding").alias("ce"),
        lsh_bucket(F.col("embedding"), hp).alias("bucket"),
    )
    q = F.broadcast(
        queries.select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qe"),
            lsh_bucket(F.col("embedding"), hp).alias("bucket"),
        )
    )
    scored = q.join(c, "bucket").where(F.col("query_id") != F.col("vec_id"))
    cs = cosine_similarity(F.col("qe"), F.col("ce"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.select("query_id", "vec_id", F.round(cs, 6).alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )
