"""Distributed PCA / whitening (operators/decomposition.py): the
distributed fit must equal exact numpy PCA on the same rows, be
partitioning-invariant, and whitening must identity-ize the covariance."""

from __future__ import annotations

import numpy as np
import pytest

from datafusion_gpu_spark.operators.decomposition import (
    pca_contract,
    pca_fit,
    pca_project,
)


def _planted(spark, n=400, seed=7):
    """Anisotropic cloud: axis j has stddev 8/(j+1) — distinct, known
    variance ordering (dims 0,1,2,... in decreasing variance)."""
    rng = np.random.default_rng(seed)
    d = 6
    x = rng.standard_normal((n, d)) * (8.0 / (np.arange(d) + 1.0))
    rows = [(int(i), x[i].tolist()) for i in range(n)]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        .repartition(5),
        x,
    )


def test_fit_matches_exact_numpy_pca(spark):
    df, x = _planted(spark)
    k = 4
    model = pca_fit(df, k)
    mean = x.mean(axis=0)
    cov = np.cov(x, rowvar=False, bias=True)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    vals, vecs = vals[order], vecs[:, order]
    assert np.allclose(model.mean, mean, atol=1e-9)
    assert np.allclose(model.eigvals, vals, atol=1e-9)
    # same subspace with the canonical sign: compare |dot| == 1 per col
    dots = np.abs(np.sum(model.components * vecs, axis=0))
    assert np.allclose(dots, 1.0, atol=1e-9)


def test_fit_is_partitioning_invariant(spark):
    df, _ = _planted(spark)
    m1 = pca_fit(df.repartition(1), 3)
    m7 = pca_fit(df.repartition(7), 3)
    assert np.allclose(m1.components, m7.components, atol=1e-9)
    assert np.allclose(m1.eigvals, m7.eigvals, atol=1e-9)


def test_projection_variances_equal_eigvals(spark):
    df, _ = _planted(spark)
    model = pca_fit(df, 3)
    proj = np.stack(
        [r["projection"] for r in pca_project(df, model).collect()]
    )
    pvar = proj.var(axis=0)  # population
    assert np.allclose(pvar, model.eigvals, rtol=1e-9)
    assert np.all(np.diff(pvar) <= 1e-9)


def test_whitening_gives_identity_covariance(spark):
    df, _ = _planted(spark)
    model = pca_fit(df, 4)
    proj = np.stack(
        [r["w"] for r in pca_project(df, model, out_col="w", whiten=True).collect()]
    )
    cov = np.cov(proj, rowvar=False, bias=True)
    assert np.allclose(cov, np.eye(4), atol=1e-6)


def test_contract_relation_all_green(spark):
    df, _ = _planted(spark)
    [row] = pca_contract(df, k=3).collect()
    assert row["orthonormal"] and row["component_variances_ok"]
    assert row["explained_ratio_ok"] and row["total_var"] > 0


def test_fit_rejects_bad_k(spark):
    df, _ = _planted(spark)
    with pytest.raises(ValueError):
        pca_fit(df, 0)
    with pytest.raises(ValueError):
        pca_fit(df, 99)
