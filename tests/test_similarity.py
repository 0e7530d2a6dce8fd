"""Similarity search: exact top-k vs a NumPy reference, two-stage prune
correctness, LSH recall on planted near-duplicates."""

from __future__ import annotations

import numpy as np
import pytest

from datafusion_gpu_spark.operators.similarity import (
    cosine_topk_bruteforce,
    lsh_ann_topk,
)

DIM = 16


@pytest.fixture(scope="module")
def embeddings(spark):
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(60, DIM)).astype(np.float32)
    vecs[50] = vecs[0] + rng.normal(scale=0.01, size=DIM).astype(np.float32)  # planted
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df, vecs


def _numpy_topk(vecs, qid, k):
    n = vecs / np.linalg.norm(vecs.astype(np.float64), axis=1, keepdims=True)
    cos = n @ n[qid]
    order = sorted(range(len(vecs)), key=lambda i: (-cos[i], i))
    return [i for i in order if i != qid][:k]


def test_bruteforce_matches_numpy(embeddings):
    df, vecs = embeddings
    res = cosine_topk_bruteforce(df, df.where("vec_id < 4"), k=7).toPandas()
    for qid in range(4):
        got = res[res.query_id == qid].sort_values("rank")["vec_id"].tolist()
        assert got == _numpy_topk(vecs, qid, 7), f"query {qid}"


def test_two_stage_prune_is_exact_across_partitionings(embeddings):
    df, _ = embeddings
    q = df.where("vec_id < 3")
    a = cosine_topk_bruteforce(df.repartition(1), q, k=5).toPandas()
    b = cosine_topk_bruteforce(df.repartition(16), q, k=5).toPandas()
    key = lambda d: d.sort_values(["query_id", "rank"]).reset_index(drop=True)  # noqa: E731
    assert key(a).equals(key(b))


def test_lsh_recall_on_planted_near_dup(embeddings):
    df, _ = embeddings
    # vec 50 is a 1% perturbation of vec 0 (cosine ~0.9999): with 4
    # planes x 8 tables the miss probability is < 1e-6
    res = lsh_ann_topk(
        df, df.where("vec_id = 0"), k=3, planes=4, num_tables=8, dim=DIM
    ).toPandas()
    assert 50 in res["vec_id"].tolist()
    assert res.sort_values("rank")["vec_id"].iloc[0] == 50


def test_lsh_scores_are_exact_cosines(embeddings):
    df, vecs = embeddings
    res = lsh_ann_topk(
        df, df.where("vec_id = 0"), k=3, planes=4, num_tables=8, dim=DIM
    ).toPandas()
    n = vecs / np.linalg.norm(vecs.astype(np.float64), axis=1, keepdims=True)
    for _, row in res.iterrows():
        true_cos = float(n[0] @ n[int(row.vec_id)])
        assert row.cosine == pytest.approx(true_cos, abs=1e-6)


def test_quantize_int8_roundtrip_error_bound(spark):
    import numpy as np

    from datafusion_gpu_spark.operators.similarity import quantize_embeddings

    rng = np.random.default_rng(7)
    rows = [(i, [float(x) for x in rng.normal(size=16)]) for i in range(50)]
    rows.append((50, [0.0] * 16))  # zero vector must not NaN
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.vec_id: r for r in quantize_embeddings(df).collect()}
    originals = dict(rows)
    for vid, r in out.items():
        x = np.array(originals[vid], dtype=np.float64)
        assert len(r.qvec) == 16
        assert max(abs(q) for q in r.qvec) <= 127
        if r.scale == 0:
            assert all(q == 0 for q in r.qvec)
            continue
        deq = np.array(r.qvec, dtype=np.float64) * r.scale / 127
        # symmetric quantization: error <= half a quantization step
        assert np.max(np.abs(deq - np.float32(x).astype(np.float64))) <= (
            r.scale / 127 / 2 + 1e-6
        )


def test_vectorized_topk_equals_jvm_spelling(spark):
    import numpy as np

    from datafusion_gpu_spark.operators.similarity import (
        cosine_topk_jvm_fold,
        cosine_topk_vectorized,
    )

    rng = np.random.default_rng(11)
    rows = [(i, [float(x) for x in rng.normal(size=24)]) for i in range(300)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.where("vec_id < 5")
    key = lambda r: (r.query_id, r.rank)  # noqa: E731
    jvm = sorted(cosine_topk_jvm_fold(df, q, k=7).collect(), key=key)
    vec = sorted(cosine_topk_vectorized(df, q, k=7).collect(), key=key)
    assert [(r.query_id, r.vec_id, r.cosine, r.rank) for r in jvm] == [
        (r.query_id, r.vec_id, r.cosine, r.rank) for r in vec
    ]


def test_zero_vector_corpus_row_does_not_nan(spark):
    # an all-zero embedding must score cosine 0, not NaN (NaN sort
    # placement differs between NumPy and the JVM/SQL paths)
    import numpy as np

    from datafusion_gpu_spark.operators.similarity import cosine_topk_vectorized

    rng = np.random.default_rng(3)
    rows = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(20)]
    rows.append((20, [0.0] * 8))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    res = cosine_topk_vectorized(df, df.where("vec_id < 2"), k=21).toPandas()
    assert not res["cosine"].isna().any()
    zero_rows = res[res.vec_id == 20]
    assert (zero_rows["cosine"] == 0.0).all()


def test_ivf_kmeans_recall_beats_id_sample(spark):
    # planted corpus adversarial to the id-sample centroid mode: the 8
    # lowest vec_ids (the sampled centroids) all sit in ONE cluster, so
    # sample-mode cell assignment is noise and probing 2 of 8 cells
    # recalls ~25%; k-means recovers the true cells and the query's
    # top-k neighbors live in its own cluster
    import numpy as np

    from datafusion_gpu_spark.operators.similarity import (
        cosine_topk_vectorized,
        ivf_topk,
        ivf_topk_kmeans,
    )

    rng = np.random.default_rng(13)
    centers = rng.normal(size=(8, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    # ids 0..7 — the centroids id-sample mode will pick — are a NEAR-
    # IDENTICAL sub-blob of cluster 0 (0.01 noise): every other point's
    # cell scores then differ only by its own 0.15 noise projection, so
    # sample-mode assignment is ~uniform across the 8 cells and a
    # 2-of-8 probe recalls ~25%
    degenerate = centers[0] + 0.01 * rng.normal(size=(8, DIM))
    vecs = [degenerate]
    for c in range(8):
        vecs.append(centers[c] + 0.15 * rng.normal(size=(40, DIM)))
    all_vecs = np.concatenate(vecs)
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(all_vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # one query per distinct cluster (first point of clusters 1, 3, 5)
    qids = [48, 128, 208]
    q = df.where(f"vec_id IN ({','.join(map(str, qids))})")

    def recall(res, exact):
        tot = 0.0
        for qid in qids:
            e = set(exact[exact.query_id == qid]["vec_id"])
            a = set(res[res.query_id == qid]["vec_id"])
            tot += len(e & a) / len(e)
        return tot / len(qids)

    exact = cosine_topk_vectorized(df, q, k=10).toPandas()
    sample = ivf_topk(df, q, k=10, n_clusters=8, n_probe=2).toPandas()
    kmeans = ivf_topk_kmeans(df, q, k=10, n_clusters=8, n_probe=2).toPandas()
    r_sample, r_kmeans = recall(sample, exact), recall(kmeans, exact)
    assert r_kmeans > r_sample
    assert r_kmeans >= 0.9


def test_ivf_topk_matches_bruteforce_on_probed_cells(spark):
    # with n_probe == n_clusters every cell is searched, so IVF must
    # reduce to the exact answer
    import numpy as np

    from datafusion_gpu_spark.operators.similarity import (
        cosine_topk_vectorized,
        ivf_topk,
    )

    rng = np.random.default_rng(5)
    rows = [(i, [float(x) for x in rng.normal(size=DIM)]) for i in range(120)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.where("vec_id < 3")
    key = lambda d: d.sort_values(["query_id", "rank"]).reset_index(drop=True)  # noqa: E731
    exact = key(cosine_topk_vectorized(df, q, k=5).toPandas())
    ivf = key(ivf_topk(df, q, k=5, n_clusters=8, n_probe=8).toPandas())
    assert exact.equals(ivf)


def test_hard_negatives_excludes_query_label_exactly(spark):
    # two tight clusters with distinct labels + a stray same-label point
    # sitting closest to the query: the mask must drop it even though it
    # would top the unmasked ranking
    from datafusion_gpu_spark.operators.similarity import (
        cosine_topk_vectorized,
        hard_negatives,
    )

    rng = np.random.default_rng(7)
    base_a = rng.normal(size=32)
    base_b = rng.normal(size=32)
    rows = []
    for i in range(30):
        base, label = (base_a, 0) if i % 2 == 0 else (base_b, 1)
        vec = base + rng.normal(scale=0.05, size=32)
        rows.append((i, [float(x) for x in vec], label))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    queries = df.where("vec_id = 0")

    k = 5
    out = hard_negatives(df, queries, k=k).collect()
    labels = {r[0]: r[2] for r in rows}
    assert len(out) == k
    assert all(labels[r.vec_id] == 1 for r in out)  # query label is 0
    # the unmasked top-k would be dominated by same-label cluster mates
    plain = cosine_topk_vectorized(df, queries, k=k).collect()
    assert any(labels[r.vec_id] == 0 for r in plain)
    # ranks are 1..k among negatives only
    assert sorted(r.rank for r in out) == list(range(1, k + 1))


def test_contrastive_triplets_margin_and_exclusions(spark):
    from datafusion_gpu_spark.operators.similarity import contrastive_triplets

    rng = np.random.default_rng(11)
    base_a, base_b = rng.normal(size=16), rng.normal(size=16)
    rows = []
    for i in range(24):
        base, label = (base_a, 0) if i % 2 == 0 else (base_b, 1)
        vec = base + rng.normal(scale=0.05, size=16)
        rows.append((i, [float(x) for x in vec], label))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {r.query_id: r for r in contrastive_triplets(df, df.where("vec_id < 4")).collect()}
    labels = {r[0]: r[2] for r in rows}
    assert set(out) == {0, 1, 2, 3}
    for qid, r in out.items():
        assert labels[r.pos_id] == labels[qid] and r.pos_id != qid
        assert labels[r.neg_id] != labels[qid]
        # tight clusters: same-label neighbor is closer than cross-label
        assert r.margin > 0
        assert abs(r.margin - round(r.pos_cosine - r.neg_cosine, 6)) < 1e-9


def test_knn_graph_exact_on_planted_clusters(spark):
    import numpy as np

    from datafusion_gpu_spark.operators.similarity import knn_graph

    rng = np.random.default_rng(7)
    # two tight clusters far apart: neighbors must stay in-cluster
    base_a, base_b = rng.normal(size=8), rng.normal(size=8)
    rows = []
    for i in range(6):
        v = base_a + rng.normal(scale=0.01, size=8)
        rows.append((i, [float(x) for x in v]))
    for i in range(6, 12):
        v = -base_a + rng.normal(scale=0.01, size=8)  # antipodal cluster
        rows.append((i, [float(x) for x in v]))
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = knn_graph(embs, k=3).collect()
    assert len(out) == 36  # 12 vectors x 3 neighbors
    for r in out:
        same = (r.query_id < 6) == (r.vec_id < 6)
        assert same, f"{r.query_id} crossed clusters to {r.vec_id}"
        assert r.vec_id != r.query_id
    ranks = {(r.query_id, r.rank) for r in out}
    assert len(ranks) == 36  # dense 1..3 per query


def test_knn_graph_matches_bruteforce_topk(spark):
    from datafusion_gpu_spark.operators.similarity import (
        cosine_topk_vectorized,
        knn_graph,
    )
    from datafusion_gpu_spark.context import read_parquet

    embs = read_parquet(
        spark, "/root/testdata/sf0.001/embeddings.parquet"
    ).limit(60)
    g = {
        (r.query_id, r.rank): (r.vec_id, r.cosine)
        for r in knn_graph(embs, k=4).collect()
    }
    bf = {
        (r.query_id, r.rank): (r.vec_id, r.cosine)
        for r in cosine_topk_vectorized(embs, embs, k=4).collect()
    }
    assert g == bf


def test_mine_bitext_finds_planted_alignments_despite_hub(spark):
    import numpy as np

    from datafusion_gpu_spark.operators.similarity import mine_bitext

    rng = np.random.default_rng(11)
    X, Y = [], []
    for i in range(8):
        v = rng.normal(size=16)
        X.append((i, [float(t) for t in v]))
        # the true translation: same direction + small noise
        Y.append((100 + i, [float(t) for t in v + rng.normal(scale=0.05, size=16)]))
    # a hub: the mean direction, near-ish to EVERY x
    hub = np.mean([np.array(e) for _, e in X], axis=0)
    Y.append((999, [float(t) for t in hub]))
    sx = spark.createDataFrame(X, "vec_id long, embedding array<float>")
    sy = spark.createDataFrame(Y, "vec_id long, embedding array<float>")
    out = {r.x_id: r for r in mine_bitext(sx, sy, k=4, margin_threshold=1.0).collect()}
    # every x pairs with ITS planted y — the margin demotes the hub
    assert {i: out[i].y_id for i in out} == {i: 100 + i for i in range(8)}
    assert all(r.margin >= 1.0 for r in out.values())


def test_topk_order_mass_ties_match_full_sort():
    import numpy as np

    from datafusion_gpu_spark.operators.similarity import _topk_order

    rng = np.random.default_rng(3)
    # 500 columns where most values tie at 0.0 (the all-zero-vector
    # degenerate case) plus a few distinct tops — the partition boundary
    # is guaranteed to split a tie, forcing the exact-fallback path
    rows = []
    for _ in range(40):
        r = np.zeros(500)
        idx = rng.choice(500, size=3, replace=False)
        r[idx] = rng.normal(size=3)
        rows.append(r)
    cos = np.array(rows)
    got = _topk_order(cos, 10)
    want = np.argsort(-cos, kind="stable", axis=1)[:, :10]
    assert (got == want).all()


def test_topk_order_small_n_and_exact_values():
    import numpy as np

    from datafusion_gpu_spark.operators.similarity import _topk_order

    rng = np.random.default_rng(5)
    for n, k in ((50, 10), (300, 7), (1000, 10)):
        cos = rng.normal(size=(17, n))
        got = _topk_order(cos, k)
        want = np.argsort(-cos, kind="stable", axis=1)[:, :k]
        assert (got == want).all(), (n, k)


def test_mmr_rerank_diversity_and_determinism(spark):
    import numpy as np

    from datafusion_gpu_spark.operators.similarity import (
        cosine_topk_vectorized,
        mmr_rerank,
    )

    rng = np.random.default_rng(7)
    dim = 8
    a = rng.normal(size=dim); a /= np.linalg.norm(a)
    b = rng.normal(size=dim); b /= np.linalg.norm(b)
    rows = []
    for i in range(10):   # cluster A: ids 0..9
        rows.append((i, [float(x) for x in a + 0.05 * rng.normal(size=dim)]))
    for i in range(10, 20):  # cluster B: ids 10..19
        rows.append((i, [float(x) for x in b + 0.05 * rng.normal(size=dim)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.where("vec_id = 0")

    vanilla = cosine_topk_vectorized(df, q, k=4).collect()
    assert all(r.vec_id < 10 for r in vanilla)  # drowns in cluster A

    out = mmr_rerank(df, q, k=4, lambda_=0.2, pool=19).collect()
    assert len(out) == 4
    picked = [r.vec_id for r in sorted(out, key=lambda r: r.rank)]
    # rank 1 is the exact top-1 (pure relevance), later ranks cross over
    assert picked[0] == vanilla[0].vec_id
    assert any(v >= 10 for v in picked), picked  # diversity: cluster B appears
    # deterministic: identical on re-run
    out2 = mmr_rerank(df, q, k=4, lambda_=0.2, pool=19).collect()
    assert sorted((r.query_id, r.rank, r.vec_id) for r in out) == sorted(
        (r.query_id, r.rank, r.vec_id) for r in out2
    )


def test_mmr_rerank_lambda_one_is_vanilla_topk(spark):
    import numpy as np

    from datafusion_gpu_spark.operators.similarity import (
        cosine_topk_vectorized,
        mmr_rerank,
    )

    rng = np.random.default_rng(11)
    rows = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.where("vec_id IN (3, 17)")
    mmr = {(r.query_id, r.rank): r.vec_id
           for r in mmr_rerank(df, q, k=5, lambda_=1.0, pool=20).collect()}
    van = {(r.query_id, r.rank): r.vec_id
           for r in cosine_topk_vectorized(df, q, k=5).collect()}
    assert mmr == van  # lambda=1 disables the diversity term exactly


def test_random_projection_matches_numpy_and_preserves_norms(spark):
    import numpy as np

    from datafusion_gpu_spark.operators.similarity import (
        _hyperplanes,
        random_projection,
    )

    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(40, 16)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(v) for v in vecs[i]]) for i in range(len(vecs))],
        "vec_id long, embedding array<float>",
    )
    k = 8
    out = random_projection(df, dim=16, k=k, seed=7).collect()
    S = np.array(_hyperplanes(16, k, 7))  # (k, d) of +-1
    proj_ref = (vecs.astype(np.float64) @ S.T) / np.sqrt(k)
    ratios = []
    for r in out:
        got = np.array([r[f"proj_{j}"] for j in range(k)])
        assert np.allclose(got, np.round(proj_ref[r["vec_id"]], 6), atol=1e-6)
        n_in = np.linalg.norm(vecs[r["vec_id"]].astype(np.float64))
        ratios.append(np.linalg.norm(got) / n_in)
    # JL with +-1 signs: norms preserved in expectation — the MEAN
    # squared ratio concentrates near 1 even at k=8
    assert 0.7 < float(np.mean(np.square(ratios))) < 1.3


def test_corpus_dispersion_centroid_identity(spark):
    """The centroid identity vs brute-force pairs: identical vectors
    give avg pairwise cosine ~1 and centroid_norm ~1; mutually
    orthogonal vectors give avg cosine ~ 0 (exact up to the 1e-6
    quantization grid); a mixed corpus matches the O(n^2) replay within
    the documented quantization bias."""
    import itertools
    import math

    from datafusion_gpu_spark.queries.pipeline_eval import _DISPERSION_SPARK

    def run(vecs):
        rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        ).createOrReplaceTempView("embeddings")
        return spark.sql(_DISPERSION_SPARK).collect()[0]

    dim = 64
    same = [[1.0] + [0.0] * (dim - 1)] * 5
    r = run(same)
    assert r.n_docs == 5 and r.dim == dim
    assert abs(r.avg_pairwise_cosine - 1.0) < 1e-5
    assert abs(r.centroid_norm - 1.0) < 1e-5

    ortho = [[1.0 if j == i else 0.0 for j in range(dim)] for i in range(8)]
    r = run(ortho)
    assert abs(r.avg_pairwise_cosine) < 1e-5
    assert abs(r.centroid_norm - math.sqrt(8) / 8) < 1e-5

    mixed = [
        [math.sin(0.7 * i * j + i) for j in range(dim)] for i in range(1, 13)
    ]
    r = run(mixed)

    def cos(a, b):
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return sum(x * y for x, y in zip(a, b)) / (na * nb)

    # float32 storage: replay on the float32-rounded values
    import struct

    f32 = lambda v: [struct.unpack("f", struct.pack("f", x))[0] for x in v]
    mixed32 = [f32(v) for v in mixed]
    pairs = [cos(a, b) for a, b in itertools.combinations(mixed32, 2)]
    brute = sum(pairs) * 2 / (12 * 11)  # directed-pair mean
    assert abs(r.avg_pairwise_cosine - brute) < 2e-5
