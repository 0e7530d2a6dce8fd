"""Similarity search over embedding columns (array<float>).

Three tiers, same contract (query_id, vec_id, cosine, rank):

- ``cosine_topk_bruteforce`` / ``cosine_topk_vectorized``: exact top-k.
  The query set is collected to the driver (it is small by construction
  — the same assumption a broadcast join makes) and shipped in the task
  closure; the corpus is scanned once and each Arrow batch is scored as
  one (batch x dim) @ (dim x queries) float64 GEMM with the
  partition-local top-k prune fused into the same pass. At 1000
  executors that is one corpus pass with no corpus-sized shuffle
  anywhere. Measured ~22x the scoring throughput of the interpreted
  JVM fold it replaced (SCALE.md).
- ``lsh_ann_topk``: approximate top-k via signed-random-projection LSH.
  Deterministic hyperplanes (seeded), bucket equality join instead of a
  cross join — the 100 TB path where even one corpus x query scan per
  query batch is too much. Probe over multiple hash tables to trade
  recall for cost. Buckets and the candidate rerank are both GEMM.
- ``ivf_topk``: inverted-file ANN — corpus partitioned into Voronoi
  cells, queries probe their n_probe nearest cells only.

``cosine_topk_jvm_fold`` keeps the pure-JVM ``zip_with``/``aggregate``
spelling for cross-checking the GEMM paths (tests pin their equality);
it is intentionally NOT the production scorer — the interpreted
higher-order-function fold measured ~0.8M cosines/s vs ~17M for the
GEMM on 64-dim vectors.

Parity: the reference ships vector compute as custom kernels over Arrow
buffers (/root/reference/src/cudarc_sum_udaf.rs:115-161 — device GEMV-
style reduction); the Spark-first equivalent is Arrow-batched NumPy
inside mapInPandas, which BLAS-vectorizes on the executor.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    """Float64 dot product of two array<float> columns (JVM fold).

    Column-expression spelling for use inside larger codegen expressions
    (dedup pair scoring, parity tests). Hot loops should prefer the
    GEMM paths below — the interpreted lambda costs ~16x per element.
    """
    prod = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prod, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


_SCORED_SCHEMA = StructType(
    [
        StructField("query_id", LongType()),
        StructField("vec_id", LongType()),
        StructField("cosine", DoubleType()),
    ]
)

_BUCKET_SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("table", IntegerType()),
        StructField("bucket", LongType()),
    ]
)


def _rows_matrix(col: pd.Series) -> np.ndarray:
    """Stack an Arrow list column into an (n, dim) float64 matrix."""
    return np.stack(col.to_list()).astype(np.float64)


def _l2_normalize(M: np.ndarray) -> np.ndarray:
    """Row-normalize with a zero-vector guard: an all-zero embedding
    keeps cosine 0 instead of NaN (whose sort placement differs between
    NumPy and the JVM/SQL paths)."""
    n = np.linalg.norm(M, axis=1, keepdims=True)
    return M / np.where(n == 0, 1.0, n)


def _query_matrix(queries: DataFrame) -> tuple[np.ndarray, np.ndarray]:
    """Collect the (small) query set: (ids, L2-normalized float64 rows)."""
    qpd = queries.select("vec_id", "embedding").toPandas()
    qids = qpd["vec_id"].to_numpy().astype("int64")
    return qids, _l2_normalize(_rows_matrix(qpd["embedding"]))


def _merge_topk(best: pd.DataFrame | None, batch: pd.DataFrame, k: int) -> pd.DataFrame:
    """Running per-query top-k merge across Arrow batches — partition
    memory stays O(queries_seen * k), never partition size."""
    cand = batch if best is None else pd.concat((best, batch))
    cand = cand.sort_values(
        ["query_id", "cosine", "vec_id"], ascending=[True, False, True]
    )
    return cand.groupby("query_id", sort=False).head(k)


def _final_topk(pruned: DataFrame, k: int, round_cosine: bool = True) -> DataFrame:
    """Stage 2 of the two-stage top-k: rank the n_partitions * k
    survivors per query — a tiny relation regardless of corpus size.
    Ranking is (cosine DESC, vec_id ASC) at full double precision, so
    results are identical to a single window over all scores.
    ``round_cosine=False`` keeps the full double for internal consumers
    (MMR reranks on it; rounding first could flip a near-tie against
    this very ranking)."""
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    cos = F.round(F.col("cosine"), 6) if round_cosine else F.col("cosine")
    return (
        pruned.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", cos.alias("cosine"), "rank")
    )


def _two_stage_topk(scored: DataFrame, k: int) -> DataFrame:
    """Exact per-query top-k over a pre-scored relation without a window
    over the full scored set: partition-local prune (mapInPandas, NO
    shuffle), then the global window ranks n_partitions * n_queries * k
    rows. At 100 TB this replaces "shuffle every score into n_queries
    tasks" with "shuffle n_partitions * k rows per query"."""

    def local_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        best: pd.DataFrame | None = None
        for pdf in batches:
            best = _merge_topk(best, pdf, k)
        if best is not None:
            yield best

    pruned = scored.select("query_id", "vec_id", "cosine").mapInPandas(
        local_topk, _SCORED_SCHEMA
    )
    return _final_topk(pruned, k)


def _rerank_pairs_vectorized(
    cand: DataFrame, corpus: DataFrame, queries: DataFrame, k: int
) -> DataFrame:
    """Exact-cosine rerank of a (query_id, vec_id) candidate relation.

    Embeddings are joined back only for the candidate set; scoring is a
    vectorized row-wise dot per Arrow batch (einsum — each row pairs
    with its own query, so no full GEMM is needed), with the partition-
    local top-k prune fused into the same pass. The query matrix rides
    the task closure; the candidate x corpus join is the only shuffle.
    """
    qids, Qn = _query_matrix(queries)
    qindex = pd.Series(np.arange(len(qids)), index=qids)

    joined = cand.join(
        corpus.select("vec_id", F.col("embedding").alias("ce")), "vec_id"
    ).select("query_id", "vec_id", "ce")

    def score_prune(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        best: pd.DataFrame | None = None
        for pdf in batches:
            if pdf.empty:
                continue
            Cn = _l2_normalize(_rows_matrix(pdf["ce"]))
            qi = qindex[pdf["query_id"].to_numpy()].to_numpy()
            cos = np.einsum("ij,ij->i", Cn, Qn[qi])
            batch = pd.DataFrame(
                {
                    "query_id": pdf["query_id"].to_numpy().astype("int64"),
                    "vec_id": pdf["vec_id"].to_numpy().astype("int64"),
                    "cosine": cos,
                }
            )
            best = _merge_topk(best, batch, k)
        if best is not None:
            yield best

    pruned = joined.mapInPandas(score_prune, _SCORED_SCHEMA)
    return _final_topk(pruned, k)


def cosine_topk_vectorized(
    corpus: DataFrame, queries: DataFrame, k: int = 10, round_cosine: bool = True
) -> DataFrame:
    """Exact top-k neighbors per query vector — NumPy-GEMM scoring AND
    partition-local pruning fused into one Arrow pass over the corpus.

    Each Arrow batch becomes one (batch x dim) @ (dim x queries) float64
    matrix multiply. Results are identical to the JVM fold spelling
    modulo float64 summation order (~1e-16), which round(6) absorbs;
    ties break by vec_id in both. Same 100 TB shape: one corpus pass,
    no shuffle until the n_partitions x k survivors merge in the final
    tiny window.
    """
    qids, Qn = _query_matrix(queries)

    def score_prune(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        best: pd.DataFrame | None = None
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["vec_id"].to_numpy().astype("int64")
            Cn = _l2_normalize(_rows_matrix(pdf["embedding"]))
            cos = Cn @ Qn.T  # (batch, n_queries)
            frames = []
            for j, qid in enumerate(qids):
                mask = ids != qid  # self excluded
                cj, ij = cos[mask, j], ids[mask]
                # lexsort keeps the (cosine DESC, vec_id ASC) tie rule
                # exact even at the k-th-place boundary
                order = np.lexsort((ij, -cj))[:k]
                frames.append(
                    pd.DataFrame(
                        {"query_id": qid, "vec_id": ij[order], "cosine": cj[order]}
                    )
                )
            best = _merge_topk(best, pd.concat(frames), k)
        if best is not None:
            yield best

    pruned = corpus.select("vec_id", "embedding").mapInPandas(
        score_prune, _SCORED_SCHEMA
    )
    return _final_topk(pruned, k, round_cosine=round_cosine)


def cosine_topk_bruteforce(
    corpus: DataFrame, queries: DataFrame, k: int = 10
) -> DataFrame:
    """Exact top-k neighbors per query vector (production spelling).

    Delegates to the GEMM scorer — brute force means every (query,
    corpus) pair is scored, not that the scoring loop is interpreted.
    ``cosine_topk_jvm_fold`` retains the pure-JVM spelling for parity
    checks.
    """
    return cosine_topk_vectorized(corpus, queries, k)


def _label_masked_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    label_col: str,
    same_label: bool,
) -> DataFrame:
    """Fused GEMM score+prune with a label mask INSIDE the batch kernel:
    the exact top-k among same-label (positives) or different-label
    (negatives) neighbors, never a post-filter of the global top-k
    (which can come up short when the other class crowds the head).
    Same 100 TB shape as :func:`cosine_topk_vectorized` — one corpus
    pass, partition state bounded by queries x k, no corpus shuffle."""
    qpd = queries.select("vec_id", label_col, "embedding").toPandas()
    qids = qpd["vec_id"].to_numpy().astype("int64")
    qlabels = qpd[label_col].to_numpy()
    Qn = _l2_normalize(_rows_matrix(qpd["embedding"]))

    def score_prune(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        best: pd.DataFrame | None = None
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["vec_id"].to_numpy().astype("int64")
            labels = pdf[label_col].to_numpy()
            Cn = _l2_normalize(_rows_matrix(pdf["embedding"]))
            cos = Cn @ Qn.T
            frames = []
            for j, (qid, qlabel) in enumerate(zip(qids, qlabels)):
                same = labels == qlabel
                mask = (ids != qid) & (same if same_label else ~same)
                cj, ij = cos[mask, j], ids[mask]
                order = np.lexsort((ij, -cj))[:k]
                frames.append(
                    pd.DataFrame(
                        {"query_id": qid, "vec_id": ij[order], "cosine": cj[order]}
                    )
                )
            best = _merge_topk(best, pd.concat(frames), k)
        if best is not None:
            yield best

    pruned = corpus.select("vec_id", label_col, "embedding").mapInPandas(
        score_prune, _SCORED_SCHEMA
    )
    return _final_topk(pruned, k)


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining for contrastive training: the exact top-k
    cosine neighbors of each query that carry a DIFFERENT label — the
    high-similarity wrong-class examples a contrastive or reranker
    objective learns the most from."""
    return _label_masked_topk(corpus, queries, k, label_col, same_label=False)


def contrastive_triplets(
    corpus: DataFrame,
    queries: DataFrame,
    label_col: str = "label",
) -> DataFrame:
    """(anchor, positive, hard-negative) triplet generation: per query,
    the nearest same-label neighbor (excluding self) and the nearest
    different-label neighbor, each exact via the label-masked GEMM
    kernel. Two corpus passes (one per mask), then a join of two
    queries-sized relations — nothing corpus-sized ever shuffles.
    The triplet margin (pos_cosine - neg_cosine) is the quantity a
    contrastive loss pushes apart; emitting both cosines lets a
    curriculum sort by margin without rescoring."""
    pos = _label_masked_topk(corpus, queries, 1, label_col, same_label=True)
    neg = _label_masked_topk(corpus, queries, 1, label_col, same_label=False)
    return (
        pos.select(
            "query_id",
            F.col("vec_id").alias("pos_id"),
            F.col("cosine").alias("pos_cosine"),
        )
        .join(
            neg.select(
                "query_id",
                F.col("vec_id").alias("neg_id"),
                F.col("cosine").alias("neg_cosine"),
            ),
            "query_id",
        )
        .withColumn(
            "margin", F.round(F.col("pos_cosine") - F.col("neg_cosine"), 6)
        )
    )


def cosine_topk_jvm_fold(
    corpus: DataFrame, queries: DataFrame, k: int = 10
) -> DataFrame:
    """Exact top-k with the cosine as a JVM ``zip_with``/``aggregate``
    fold — zero Python in the scoring loop, but the higher-order
    functions run interpreted (~0.8M cos/s measured). Kept as the
    cross-check twin for the GEMM paths; not used by any gated query.
    """
    q = F.broadcast(
        queries.select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
        )
    )
    c = corpus.select(F.col("vec_id").alias("vec_id"), F.col("embedding").alias("ce"))
    scored = q.crossJoin(c).where(F.col("query_id") != F.col("vec_id"))
    cs = cosine_similarity(F.col("qe"), F.col("ce"))
    return _two_stage_topk(
        scored.select("query_id", "vec_id", cs.alias("cosine")), k
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """IVF (inverted-file) ANN: the corpus is partitioned into Voronoi
    cells around centroid vectors; a query searches only its ``n_probe``
    nearest cells, cutting scored candidates to ~n_probe/n_clusters of
    the corpus.

    Centroids here are a deterministic corpus sample (lowest vec_ids) so
    the correctness oracle can replay cell assignment exactly; at scale
    you would k-means them (``ivf_kmeans_centroids`` below) — the
    operator contract (assign, probe, rerank) is unchanged by how
    centroids are chosen. Cell assignment is one GEMM argmax per Arrow
    batch (centroids ride the closure; ties to the LOWEST cid, matching
    the oracle's ORDER BY ccos DESC, cid); query probes are computed on
    the driver from the same matrices (the query set is already
    collected for the rerank). The rerank is the shared vectorized
    candidate scorer.
    """
    cids, Centn = deterministic_centroids(corpus, n_clusters)
    return _ivf_probe_rerank(corpus, queries, cids, Centn, k, n_probe)


def cell_assignments(
    corpus: DataFrame, cids: np.ndarray, Centn: np.ndarray
) -> DataFrame:
    """(vec_id, cell): nearest-centroid assignment by cosine — one GEMM
    argmax per Arrow batch, centroids ride the task closure, no shuffle.
    ``cids`` must be ascending so argmax's first-max tiebreak picks the
    lowest cell id (matching a SQL ``ORDER BY ccos DESC, cid`` replay).
    Shared by IVF probing and semantic dedup's cluster blocking."""
    assign_schema = StructType(
        [StructField("vec_id", LongType()), StructField("cell", LongType())]
    )

    def assign_cells(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            Cn = _l2_normalize(_rows_matrix(pdf["embedding"]))
            cell = cids[np.argmax(Cn @ Centn.T, axis=1)]
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"].to_numpy().astype("int64"), "cell": cell}
            )

    return corpus.select("vec_id", "embedding").mapInPandas(
        assign_cells, assign_schema
    )


def deterministic_centroids(
    corpus: DataFrame, n_clusters: int
) -> tuple[np.ndarray, np.ndarray]:
    """(cids, L2-normalized centroid matrix) from the lowest ``n_clusters``
    vec_ids — the oracle-replayable centroid choice (``ivf_kmeans_centroids``
    is the learned alternative)."""
    cent_pd = (
        corpus.where(F.col("vec_id") < n_clusters)
        .select("vec_id", "embedding")
        .toPandas()
        .sort_values("vec_id")  # ascending cid => argmax tie -> lowest cid
    )
    cids = cent_pd["vec_id"].to_numpy().astype("int64")
    return cids, _l2_normalize(_rows_matrix(cent_pd["embedding"]))


def _ivf_probe_rerank(
    corpus: DataFrame,
    queries: DataFrame,
    cids: np.ndarray,
    Centn: np.ndarray,
    k: int,
    n_probe: int,
) -> DataFrame:
    """Shared IVF back half: GEMM cell assignment, driver-side probe
    selection, vectorized candidate rerank. ``cids`` must be ascending
    so argmax's first-max tiebreak picks the lowest cell id."""
    assign = cell_assignments(corpus, cids, Centn)

    # Query probes: n_probe nearest cells per query, computed on the
    # driver (queries are tiny and already collected for the rerank).
    qids, Qn = _query_matrix(queries)
    qcos = Qn @ Centn.T  # (n_queries, n_clusters)
    probe_rows = []
    for i, qid in enumerate(qids):
        order = np.lexsort((cids, -qcos[i]))[:n_probe]  # ccos DESC, cid ASC
        probe_rows.extend((int(qid), int(c)) for c in cids[order])
    probes = F.broadcast(
        corpus.sparkSession.createDataFrame(
            probe_rows, schema="query_id long, cell long"
        )
    )

    # each corpus vector lives in exactly one cell -> no duplicate pairs
    cand = (
        probes.join(assign, "cell")
        .where(F.col("query_id") != F.col("vec_id"))
        .select("query_id", "vec_id")
    )
    return _rerank_pairs_vectorized(cand, corpus, queries, k)


def ivf_kmeans_centroids(
    corpus: DataFrame, n_clusters: int = 16, n_iter: int = 20, seed: int = 42
) -> np.ndarray:
    """K-means centroids for IVF via Spark ML KMeans (k-means|| init,
    distributed Lloyd iterations, cosine distance — the real-recall
    path the deterministic id-sample mode trades away for oracle
    replayability). Returns the (n_clusters, dim) L2-normalized
    centroid matrix; cell ids are the 0..n_clusters-1 row positions.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = corpus.select(
        array_to_vector(F.col("embedding").cast("array<double>")).alias("features")
    )
    model = KMeans(
        k=n_clusters, maxIter=n_iter, seed=seed, distanceMeasure="cosine"
    ).fit(feat)
    return _l2_normalize(np.stack(model.clusterCenters()))


def ivf_topk_kmeans(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 4,
    n_iter: int = 20,
    seed: int = 42,
) -> DataFrame:
    """IVF ANN with k-means centroids — same assign/probe/rerank contract
    as ``ivf_topk``, but cells are learned (Spark ML k-means||, cosine
    distance) instead of sampled, so cell populations are balanced and
    probe recall is governed by cluster geometry rather than luck of the
    id order. Not SQL-replayable (k-means|| is iterative and
    initialization-dependent), so the gate records a rows-only check;
    the planted-cluster recall test pins that this mode beats the
    id-sample baseline.
    """
    Centn = ivf_kmeans_centroids(corpus, n_clusters, n_iter, seed)
    cids = np.arange(n_clusters, dtype=np.int64)
    return _ivf_probe_rerank(corpus, queries, cids, Centn, k, n_probe)


def _hyperplanes(dim: int, planes: int, seed: int) -> list[list[float]]:
    """Deterministic +-1 hyperplanes (seeded NumPy, tiny, shipped in the
    task closure / inlined by the oracle)."""
    rng = np.random.default_rng(seed)
    return (rng.integers(0, 2, size=(planes, dim)) * 2.0 - 1.0).tolist()


def lsh_bucket(emb: Column, planes: list[list[float]]) -> Column:
    """Signed-random-projection bucket id: bit p = sign(emb . plane_p).
    Column-expression spelling (interpreted fold) — the hot path uses
    the GEMM bucketing inside ``lsh_ann_topk``."""
    bucket = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        proj = dot(emb, F.array(*[F.lit(v) for v in plane]).cast("array<float>"))
        bucket = bucket.bitwiseOR(
            F.when(proj > 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(
                F.lit(0).cast("long")
            )
        )
    return bucket


def _bucket_ids(E: np.ndarray, H: np.ndarray, planes: int, num_tables: int) -> np.ndarray:
    """(n, num_tables) int64 bucket ids from one (n, T*P) projection GEMM.

    Bit p of table t is sign(e . H[t*P + p]) — float64 dot, strictly
    positive test, matching the JVM/SQL fold bit-for-bit away from the
    measure-zero proj==0 boundary.
    """
    bits = (E @ H.T > 0).astype(np.int64)  # (n, T*P)
    weights = 1 << np.arange(planes, dtype=np.int64)
    return np.stack(
        [bits[:, t * planes : (t + 1) * planes] @ weights for t in range(num_tables)],
        axis=1,
    )


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    planes: int = 8,
    num_tables: int = 4,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates share the query's bucket in ANY of
    ``num_tables`` independent hash tables, then exact cosine rerank.

    Recall knobs: fewer ``planes`` -> bigger buckets; more ``num_tables``
    -> more chances to collide (miss prob for a pair with cosine angle
    theta is (1 - (1 - theta/pi)^planes)^num_tables). Corpus buckets are
    one projection GEMM per Arrow batch (hyperplanes ride the closure);
    query buckets are computed on the driver. The bucket relation is
    slim (ids + bucket only); embeddings are joined back only for the
    candidate set — at scale the corpus side of that join is a
    pre-bucketed index, so the probe is co-partitioned, and the top-k is
    the same two-stage prune as the exact path.
    """
    tables = [
        np.array(_hyperplanes(dim, planes, seed + t)) for t in range(num_tables)
    ]
    H = np.concatenate(tables, axis=0)  # (T*P, dim)

    def corpus_buckets(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            E = _rows_matrix(pdf["embedding"])
            B = _bucket_ids(E, H, planes, num_tables)  # (n, T)
            n = len(pdf)
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(
                        pdf["vec_id"].to_numpy().astype("int64"), num_tables
                    ),
                    "table": np.tile(
                        np.arange(num_tables, dtype=np.int32), n
                    ),
                    "bucket": B.reshape(-1),
                }
            )

    cb = corpus.select("vec_id", "embedding").mapInPandas(
        corpus_buckets, _BUCKET_SCHEMA
    )

    qpd = queries.select("vec_id", "embedding").toPandas()
    QB = _bucket_ids(_rows_matrix(qpd["embedding"]), H, planes, num_tables)
    q_rows = [
        (int(qid), int(t), int(QB[i, t]))
        for i, qid in enumerate(qpd["vec_id"].to_numpy())
        for t in range(num_tables)
    ]
    qb = F.broadcast(
        corpus.sparkSession.createDataFrame(
            q_rows, schema="query_id long, table int, bucket long"
        )
    )

    candidates = (
        qb.join(cb, ["table", "bucket"])
        .where(F.col("query_id") != F.col("vec_id"))
        .select("query_id", "vec_id")
        .distinct()
    )
    return _rerank_pairs_vectorized(candidates, corpus, queries, k)


def quantize_embeddings(embs: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """(vec_id, scale, qvec): symmetric int8 quantization — per-vector
    max-abs scale, elements rounded to [-127, 127]. The standard 4x
    memory/bandwidth reduction before an ANN index is built; at 100 TB
    the win is shuffle and cache volume, the dot products themselves
    rerank in float on the tiny candidate sets.

    Pure column expressions (the per-element lambda runs interpreted,
    but over 64-element arrays it is a few ns per row — the measured
    16x HOF penalty only bites on per-token lambdas over long arrays).
    Zero vectors quantize to zeros (scale stays 0, not NaN).
    """
    x = F.col(vec_col)
    scale = F.array_max(F.transform(x, lambda v: F.abs(v.cast("double"))))
    qvec = F.when(scale == 0, F.transform(x, lambda v: F.lit(0))).otherwise(
        F.transform(x, lambda v: F.round(v.cast("double") / scale * 127).cast("int"))
    )
    return embs.select(
        "vec_id",
        F.round(scale, 6).alias("scale"),
        qvec.alias("qvec"),
    )


# -- Product quantization (ADC) ----------------------------------------------


def pq_codebooks(
    corpus: DataFrame, m: int = 8, ksub: int = 16
) -> np.ndarray:
    """Deterministic per-subspace PQ codebooks: the ``ksub`` lowest-id
    vectors, L2-normalized, sliced into ``m`` contiguous subvectors —
    the same replayable-sample convention as ``deterministic_centroids``
    (an SQL oracle can rebuild them bit-for-bit). Production would train
    each subspace with k-means (see ``ivf_kmeans_centroids`` for the
    iterative pattern); the operator contract — encode, LUT, ADC scan,
    exact rerank — is identical either way.

    Returns an (m, ksub, dim/m) float64 array, collected driver-side
    (ksub rows — the same "small by construction" assumption a broadcast
    join makes).
    """
    rows = (
        corpus.select("vec_id", "embedding").orderBy("vec_id").limit(ksub).toPandas()
    )
    M = _l2_normalize(_rows_matrix(rows["embedding"]))
    ksub_actual, dim = M.shape
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    return M.reshape(ksub_actual, m, dim // m).transpose(1, 0, 2)


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    m: int = 8,
    ksub: int = 16,
    oversample: int = 4,
) -> DataFrame:
    """Approximate top-k via product quantization with asymmetric
    distance computation (Jegou et al. 2011, "Product Quantization for
    Nearest Neighbor Search" — the ADC half of IVFADC), then an exact
    rerank of the surviving candidates.

    100 TB shape: the corpus is ONE mapInPandas pass that encodes each
    Arrow batch against the (m x ksub x dim/m) codebook riding the task
    closure — 8 uint8 codes per vector instead of 64 floats, a 32x
    compression of what an index shard must hold — and scores every
    query against the batch through an (n_queries x m x ksub) lookup
    table: m table lookups + adds per (query, vector), no dim-length
    dot products in the scan. The partition-local top-(k*oversample)
    prune is fused into the same pass, so the only shuffled relations
    are n_partitions*k*oversample survivors per query and the tiny
    candidate rerank join. Nothing corpus-sized moves.

    Parity: the reference's device kernels reduce Arrow buffers in
    block-local shared memory before a global combine
    (/root/reference/src/sum.cu:1-30); the LUT scan + local prune is
    the same two-phase shape on the CPU path.
    """
    cb = pq_codebooks(corpus, m, ksub)  # (m, ksub, dsub)
    dsub = cb.shape[2]
    qids, Qn = _query_matrix(queries)
    Qsub = Qn.reshape(len(qids), m, dsub)
    lut = np.einsum("qmd,mcd->qmc", Qsub, cb)  # LUT[q, j, c] = q_sub . code
    cb_sq = np.einsum("mcd,mcd->mc", cb, cb)  # ||code||^2 per (subspace, code)
    n_cand = k * oversample

    def encode_score_prune(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        best: pd.DataFrame | None = None
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["vec_id"].to_numpy().astype("int64")
            Cn = _l2_normalize(_rows_matrix(pdf["embedding"]))
            Csub = Cn.reshape(len(ids), m, dsub)
            # argmin_c ||v - c||^2 == argmin_c (||c||^2 - 2 v.c): the
            # ||v||^2 term is constant per (vector, subspace)
            cross = np.einsum("nmd,mcd->nmc", Csub, cb)
            codes = np.argmin(cb_sq[None, :, :] - 2.0 * cross, axis=2)  # (n, m)
            scores = np.zeros((len(ids), len(qids)))
            for j in range(m):  # ADC: m LUT gathers, no dot products
                scores += lut[:, j, codes[:, j]].T
            frames = []
            for qj, qid in enumerate(qids):
                mask = ids != qid  # self excluded
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": qid,
                            "vec_id": ids[mask],
                            "cosine": scores[mask, qj],
                        }
                    )
                )
            best = _merge_topk(best, pd.concat(frames), n_cand)
        if best is not None:
            yield best

    pruned = corpus.select("vec_id", "embedding").mapInPandas(
        encode_score_prune, _SCORED_SCHEMA
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id")
    )
    cand = (
        pruned.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= n_cand)
        .select("query_id", "vec_id")
    )
    return _rerank_pairs_vectorized(cand, corpus, queries, k)



def _topk_order(cos: np.ndarray, kk: int) -> np.ndarray:
    """Exact (cosine DESC, column-index ASC) top-kk column indices per
    row, without a full-row argsort (which dominates the GEMM past ~10k
    columns — measured 9M pair-scores/s full-sort vs GEMM-bound with
    argpartition).

    argpartition narrows each row to m = max(4kk, 64) candidates in
    O(n); two stable argsorts of those m order them exactly. A
    value-tie spanning the partition BOUNDARY could swap which tied
    column (higher vs lower index) survives, so any row whose kk-th
    value equals its candidate minimum falls back to the exact full
    sort — measure-zero on real embeddings, cheap insurance on
    degenerate ones (e.g. thousands of all-zero vectors at cosine 0).
    """
    n = cos.shape[1]
    if n <= max(4 * kk, 64):
        return np.argsort(-cos, kind="stable", axis=1)[:, :kk]
    m = max(4 * kk, 64)
    part = np.argpartition(-cos, m - 1, axis=1)[:, :m]
    part.sort(axis=1)  # candidate columns ascending -> stable sort = id tiebreak
    cand = np.take_along_axis(cos, part, axis=1)
    sub = np.argsort(-cand, kind="stable", axis=1)[:, :kk]
    order = np.take_along_axis(part, sub, axis=1)
    kth = np.take_along_axis(cand, sub[:, -1:], axis=1)[:, 0]
    risky = kth <= cand.min(axis=1)
    if risky.any():
        full = np.argsort(-cos[risky], kind="stable", axis=1)[:, :kk]
        order[risky] = full
    return order


def knn_graph(corpus: DataFrame, k: int = 10) -> DataFrame:
    """Exact k-nearest-neighbor graph over the corpus: for EVERY vector,
    its top-``k`` cosine neighbors (self excluded) — the substrate for
    graph-based dedup clustering, kNN classification, and diversity
    analysis of an embedding corpus.

    Kernel shape: the full corpus rides the task closure as one
    L2-normalized (n, dim) float64 matrix with columns pre-sorted by
    vec_id; each Arrow batch of rows then scores against it in a single
    GEMM, and a STABLE row-wise argsort on -cosine yields exactly the
    (cosine DESC, vec_id ASC) order — no per-query Python loop, no
    cross-batch merge (every row's neighbor list is final in one pass).

    Cost shape: the corpus is read TWICE — once collected to the driver
    at plan-construction time (an EAGER toPandas(), it fires even if the
    returned DataFrame is never executed) to build the closure matrix,
    and once streamed through mapInPandas at execution. The executed
    plan itself has zero shuffles (plan-asserted); the collect is the
    price of the broadcast-exact design, same as the query-side collect
    in the ANN family but corpus-sized.

    Scale: broadcast-exact is right up to ~1e6 x 768 floats (~3 GB
    closure); past that, block the pair space first (lsh_ann_topk /
    ivf_topk with queries = corpus) and rerank per block — the same
    discipline as the dedup family. Beyond-reference surface (the
    reference has no ANN operator family).
    """
    cpd = (
        corpus.select("vec_id", "embedding")
        .toPandas()
        .sort_values("vec_id", ignore_index=True)
    )
    all_ids = cpd["vec_id"].to_numpy().astype("int64")
    An = _l2_normalize(_rows_matrix(cpd["embedding"]))
    kk = min(k, len(all_ids) - 1)

    def neighbors(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["vec_id"].to_numpy().astype("int64")
            Bn = _l2_normalize(_rows_matrix(pdf["embedding"]))
            cos = Bn @ An.T  # (batch, n)
            pos = np.searchsorted(all_ids, ids)
            own = (pos < len(all_ids)) & (all_ids[np.minimum(pos, len(all_ids) - 1)] == ids)
            cos[np.arange(len(ids))[own], pos[own]] = -np.inf  # mask self
            order = _topk_order(cos, kk)
            rows = np.repeat(ids, kk)
            cols = order.ravel()
            yield pd.DataFrame(
                {
                    "query_id": rows,
                    "vec_id": all_ids[cols],
                    "cosine": np.take_along_axis(cos, order, axis=1).ravel(),
                    "rank": np.tile(np.arange(1, kk + 1), len(ids)).astype("int64"),
                }
            )

    out_schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField("vec_id", LongType()),
            StructField("cosine", DoubleType()),
            StructField("rank", LongType()),
        ]
    )
    return (
        corpus.select("vec_id", "embedding")
        .mapInPandas(neighbors, out_schema)
        .select("query_id", "vec_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


def _knn_avg(M: np.ndarray, N: np.ndarray, k: int) -> np.ndarray:
    """Per-row mean of the top-k cosines of M's rows against N's rows
    (both pre-normalized). Sort-based so ties resolve identically to the
    SQL oracle's (cos DESC) window."""
    cos = M @ N.T
    kk = min(k, cos.shape[1])
    if kk >= cos.shape[1]:
        return cos.mean(axis=1)
    # a MEAN of the top-k is tie-insensitive (tied elements are equal),
    # so O(n) partition replaces the full sort exactly
    part = -np.partition(-cos, kk - 1, axis=1)[:, :kk]
    return part.mean(axis=1)


def mine_bitext(
    side_x: DataFrame,
    side_y: DataFrame,
    k: int = 4,
    margin_threshold: float = 1.0,
) -> DataFrame:
    """Margin-based parallel-text mining (Artetxe & Schwenk 2019 — the
    CCMatrix/LASER primitive): for every x in X, its best y in Y by
    margin score cos(x,y) / ((avg_k(x, Y) + avg_k(y, X)) / 2), kept when
    the margin clears ``margin_threshold``. The margin normalizes away
    hubness — a y that is everyone's neighbor has a high avg_k(y, X)
    denominator, so only genuinely-aligned pairs score > 1.

    Two broadcast passes: (1) one scan of Y against the broadcast X
    matrix yields the |Y|-sized avg_k(y, X) vector (collected — it is
    one double per Y row); (2) one scan of X against the broadcast Y
    matrix + that vector computes each x's full margin row and emits its
    argmax (margin DESC, y_id ASC) — no shuffle in either pass, exact.
    Scale: X and Y are per-language shards (tens of millions x 1024 in
    CCMatrix); past broadcast size, block both sides with LSH/IVF cells
    first, same discipline as knn_graph.
    """
    yids, Yn = _query_matrix(side_y)
    order = np.argsort(yids)
    yids, Yn = yids[order], Yn[order]
    xids, Xn = _query_matrix(side_x)
    xorder = np.argsort(xids)
    xids, Xn = xids[xorder], Xn[xorder]

    ay = _knn_avg(Yn, Xn, k)  # |Y| doubles, rides the closure below

    def mine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["vec_id"].to_numpy().astype("int64")
            Bn = _l2_normalize(_rows_matrix(pdf["embedding"]))
            cos = Bn @ Yn.T  # (batch, |Y|)
            kk = min(k, cos.shape[1])
            ax = (-np.sort(-cos, axis=1)[:, :kk]).mean(axis=1)
            margin = cos / ((ax[:, None] + ay[None, :]) / 2.0)
            best = np.argmax(margin, axis=1)  # first max = lowest y_id
            yield pd.DataFrame(
                {
                    "x_id": ids,
                    "y_id": yids[best],
                    "cosine": cos[np.arange(len(ids)), best],
                    "margin": margin[np.arange(len(ids)), best],
                }
            )

    out_schema = StructType(
        [
            StructField("x_id", LongType()),
            StructField("y_id", LongType()),
            StructField("cosine", DoubleType()),
            StructField("margin", DoubleType()),
        ]
    )
    mined = side_x.select("vec_id", "embedding").mapInPandas(mine, out_schema)
    # threshold compares the ROUNDED margin so boundary pairs resolve
    # identically in the SQL oracle
    return (
        mined.select(
            "x_id",
            "y_id",
            F.round("cosine", 6).alias("cosine"),
            F.round("margin", 6).alias("margin"),
        )
        .where(F.col("margin") >= margin_threshold)
    )


def mmr_rerank(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    lambda_: float = 0.5,
    pool: int = 50,
) -> DataFrame:
    """Maximal Marginal Relevance rerank (Carbonell & Goldstein 1998):
    per query, greedily pick k results maximizing
    ``lambda * relevance - (1 - lambda) * max_similarity_to_selected`` —
    the standard diversity rerank for retrieval-augmented pipelines
    (vanilla top-k returns k near-copies whenever a dense cluster sits
    near the query; training-data retrieval wants coverage).

    Two stages, both scale-shaped:
    1. candidate pool = exact GEMM top-``pool`` per query
       (cosine_topk_vectorized: one corpus pass, no corpus shuffle),
       then one hash join back to the corpus for candidate embeddings;
    2. the greedy selection runs in applyInPandas per query group —
       each group is <= pool rows, O(pool^2 * dim) NumPy work,
       embarrassingly parallel across queries, never more than the
       pool in memory.

    Deterministic: relevance ties and MMR-score ties both break by
    vec_id ascending. Returns (query_id, rank, vec_id, relevance)
    with rank 1..k in selection order.
    """
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    cands = cosine_topk_vectorized(corpus, queries, k=pool, round_cosine=False)
    # broadcast the candidate list (n_queries x pool rows) into the
    # embedding lookup so the corpus is never shuffled for the join
    with_emb = corpus.select("vec_id", "embedding").join(
        F.broadcast(cands), "vec_id"
    ).select("query_id", "vec_id", "cosine", "embedding")
    out_schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField("rank", IntegerType()),
            StructField("vec_id", LongType()),
            StructField("relevance", DoubleType()),
        ]
    )
    lam = float(lambda_)
    k_ = int(k)

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        # stable candidate order: relevance DESC, vec_id ASC
        pdf = pdf.sort_values(
            ["cosine", "vec_id"], ascending=[False, True]
        ).reset_index(drop=True)
        ids = pdf["vec_id"].to_numpy().astype("int64")
        rel = pdf["cosine"].to_numpy().astype("float64")
        E = _l2_normalize(_rows_matrix(pdf["embedding"]))
        n = len(ids)
        chosen: list[int] = []
        max_sim = np.zeros(n)  # max cosine to any selected item
        picked = np.zeros(n, dtype=bool)
        for _ in range(min(k_, n)):
            score = lam * rel - (0.0 if not chosen else (1.0 - lam)) * max_sim
            score = np.where(picked, -np.inf, score)
            # argmax with vec_id ASC tie-break
            best = np.lexsort((ids, -score))[0]
            chosen.append(best)
            picked[best] = True
            max_sim = np.maximum(max_sim, E @ E[best])
        return pd.DataFrame(
            {
                "query_id": pdf["query_id"].iloc[0],
                "rank": np.arange(1, len(chosen) + 1, dtype="int32"),
                "vec_id": ids[chosen],
                "relevance": rel[chosen],
            }
        )

    return with_emb.groupBy("query_id").applyInPandas(greedy, out_schema)


def random_projection(
    embeddings: DataFrame,
    dim: int,
    k: int = 8,
    seed: int = 7,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Johnson-Lindenstrauss dimensionality reduction by signed random
    projection: proj_j = (emb . s_j) / sqrt(k) with s_j the seeded +-1
    hyperplanes every LSH operator here already uses (Achlioptas 2003:
    +-1 entries satisfy the JL lemma with the same distortion bound as
    Gaussians, and multiply-free). The cheap front half of an ANN /
    clustering pipeline: 64-dim float vectors become k-dim sketches in
    one embarrassingly parallel projection pass — no shuffle, and the
    k x dim sign matrix ships in the task closure (the closed form a
    SQL oracle replays term-for-term).

    Emits one SCALAR column per output dim (proj_0..proj_{k-1}, rounded
    to 6) — distance-preserving enough for band-bucketing, and canon-
    friendly for the gate's hash compare."""
    planes = _hyperplanes(dim, k, seed)
    scale = float(np.sqrt(k))
    cols = [
        F.round(
            dot(
                F.col(emb_col),
                F.array(*[F.lit(v) for v in p]).cast("array<float>"),
            )
            / scale,
            6,
        ).alias(f"proj_{j}")
        for j, p in enumerate(planes)
    ]
    return embeddings.select(F.col(id_col), *cols)
