"""Distributed PCA / whitening over embedding columns.

The dimensionality-reduction half of an embedding pipeline (train PCA on
the corpus, project before IVF/PQ indexing — the standard recipe for
shrinking ANN index cost). Spark-first split of the math:

- **fit** is one `mapInPandas` pass that reduces each partition to a
  (count, sum-vector, Gram-matrix) summary — d=64 means 4 KB + 32 KB per
  partition — followed by a driver-side merge and `numpy.linalg.eigh` on
  the d x d covariance. The only collect is P partition summaries
  (driver-sized by construction, like the Bloom build); the data itself
  never moves. At 100 TB this is a single scan with a tiny shuffle-free
  reduce.
- **project** is one broadcast-GEMM `mapInPandas` pass (the same kernel
  shape as the similarity operators): y = W^T (x - mean), optionally
  whitened by 1/sqrt(eigenvalue) so the output covariance is identity.

Determinism: eigenvectors get a canonical sign (largest-|component|
coordinate forced positive), so refits on reshuffled data produce the
same projection up to float noise.
"""

from __future__ import annotations

from typing import Iterator, NamedTuple

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

_PARTIAL_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("s", ArrayType(DoubleType())),
        StructField("g", ArrayType(DoubleType())),
    ]
)


class PcaModel(NamedTuple):
    mean: np.ndarray        # (d,)
    components: np.ndarray  # (d, k), orthonormal columns
    eigvals: np.ndarray     # (k,) descending, population covariance
    total_var: float        # trace of the full covariance (all d eigvals)


def pca_fit(df: DataFrame, k: int, vec_col: str = "embedding") -> PcaModel:
    """Fit a k-component PCA on an ``array<float>`` column.

    One scan: per-partition (n, sum, X^T X) partials, merged on the
    driver into the population covariance C = G/n - mean mean^T, then
    ``eigh`` (exact, d x d). Population (1/n) convention so a plain SQL
    ``var_pop`` replays ``total_var`` exactly.
    """
    import pandas as pd

    if k < 1:
        # d is only known after the scan, but k < 1 never is valid —
        # fail before paying the full corpus pass
        raise ValueError(f"pca_fit: k={k} must be >= 1")

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n, s, g = 0, None, None
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            n += x.shape[0]
            s = x.sum(axis=0) if s is None else s + x.sum(axis=0)
            gg = x.T @ x
            g = gg if g is None else g + gg
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "g": [g.flatten().tolist()]}
            )

    rows = df.select(vec_col).mapInPandas(partials, _PARTIAL_SCHEMA).collect()
    if not rows:
        raise ValueError("pca_fit: empty input")
    n = sum(r["n"] for r in rows)
    s = np.sum([np.asarray(r["s"]) for r in rows], axis=0)
    d = s.shape[0]
    g = np.sum([np.asarray(r["g"]).reshape(d, d) for r in rows], axis=0)
    if not 1 <= k <= d:
        raise ValueError(f"pca_fit: k={k} outside [1, d={d}]")
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)          # ascending
    order = np.argsort(vals)[::-1][:k]
    vals, vecs = vals[order], vecs[:, order]
    # canonical sign: the largest-|coordinate| entry of each component
    # is positive, so the fit is reshuffle-invariant
    flip = np.sign(vecs[np.abs(vecs).argmax(axis=0), np.arange(k)])
    flip[flip == 0] = 1.0
    return PcaModel(
        mean=mean,
        components=vecs * flip,
        eigvals=np.maximum(vals, 0.0),
        total_var=float(np.trace(cov)),
    )


def pca_project(
    df: DataFrame,
    model: PcaModel,
    vec_col: str = "embedding",
    out_col: str = "projection",
    whiten: bool = False,
    eps: float = 1e-9,
) -> DataFrame:
    """Project each vector onto the fitted components: one broadcast-GEMM
    ``mapInPandas`` pass, keeping every other column. ``whiten=True``
    scales each coordinate by 1/sqrt(eigenvalue) so the projected
    covariance is the identity."""
    import pandas as pd

    w = model.components
    if whiten:
        w = w / np.sqrt(model.eigvals + eps)
    mean = model.mean  # closure-captured with w, auto-broadcast per task

    out_fields = [f for f in df.schema.fields if f.name != out_col]
    schema = StructType(
        [*out_fields, StructField(out_col, ArrayType(DoubleType()))]
    )

    def gemm(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            y = (x - mean) @ w
            pdf = pdf.copy()
            pdf[out_col] = list(y)
            yield pdf

    return df.mapInPandas(gemm, schema)


def pca_contract(
    df: DataFrame, k: int = 8, vec_col: str = "embedding", atol: float = 1e-8
) -> DataFrame:
    """One-row contract relation for the correctness gate: the parts of
    a PCA fit a SQL engine CAN replay (total population variance, from
    raw coordinates) next to the parts it cannot but that must hold by
    construction (orthonormal components, descending projected
    variances that match the eigenvalues, explained ratio in (0, 1]).
    The booleans are computed from the DISTRIBUTED fit + a distributed
    re-aggregation of the projection — not from the model object alone —
    so a projection bug flips them.
    """
    spark = df.sparkSession
    model = pca_fit(df, k, vec_col=vec_col)
    proj = pca_project(df, model, vec_col=vec_col)
    # per-component population variance of the projected coordinates,
    # re-derived from the data (one aggregation over exploded coords)
    stats = (
        proj.select(F.posexplode("projection").alias("pos", "v"))
        .groupBy("pos")
        .agg(F.var_pop("v").alias("vp"), F.avg("v").alias("mu"))
        .orderBy("pos")
        .collect()
    )
    pvars = np.array([r["vp"] for r in stats])
    orthonormal = bool(
        np.allclose(model.components.T @ model.components, np.eye(k), atol=1e-6)
    )
    descending = bool(np.all(np.diff(pvars) <= atol))
    matches_eigvals = bool(np.allclose(pvars, model.eigvals, rtol=1e-6))
    ratio = float(model.eigvals.sum() / model.total_var)
    # the cross-engine number: total variance from the RAW coordinates
    # via the same stable var_pop aggregation the SQL oracle runs (the
    # Gram-trace spelling in the model would differ only by float noise,
    # but matching the algorithm keeps the rounded comparison exact)
    [total_var_sql] = (
        df.select(F.posexplode(vec_col).alias("pos", "v"))
        .groupBy("pos")
        .agg(F.var_pop("v").alias("vp"))
        .agg(F.round(F.sum("vp"), 6).alias("tv"))
        .collect()
    )[0][:1]
    return spark.createDataFrame(
        [
            (
                k,
                orthonormal,
                descending and matches_eigvals,
                bool(0.0 < ratio <= 1.0 + 1e-12),
                float(total_var_sql),
            )
        ],
        "k int, orthonormal boolean, component_variances_ok boolean, "
        "explained_ratio_ok boolean, total_var double",
    )
