"""Scale probe: sim_corpus_dispersion exactness at 2M documents.

The operator's scale claim is the centroid identity: the mean pairwise
cosine over all n*(n-1) pairs costs one per-dimension fold — no pair
space exists at any n. This probe generates n ONE-HOT embeddings
distributed (spark.range — no driver data), where the answer has a
closed form: with each document one-hot on dimension id % 64, pairs on
the same dimension have cosine exactly 1 and all others exactly 0, so

    avg_pairwise_cosine = (n/64 - 1) / (n - 1)          (n % 64 == 0)
    centroid_norm       = sqrt(64 * (n/64)^2) / n = 1/8

and every step of the operator's fold is EXACT integer arithmetic for
this plant (unit norms, 1e6-grid components hit the grid exactly), so
the output must equal the closed form to all six rounded decimals —
any float leakage or key mixing in the folds breaks exact equality.

Usage: python tools/dispersion_probe.py [n_docs]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n -= n % 64  # closed form needs equal-occupancy dimensions
    from pyspark.sql import functions as F

    from datafusion_gpu_spark.context import get_spark
    from datafusion_gpu_spark.queries.pipeline_eval import _DISPERSION_SPARK

    spark = get_spark("dispersion-probe")
    spark.sparkContext.setLogLevel("ERROR")

    onehot = F.array(
        *[
            F.when(F.col("id") % 64 == j, F.lit(1.0))
            .otherwise(F.lit(0.0))
            .cast("float")
            for j in range(64)
        ]
    )
    spark.range(n).select(
        F.col("id").alias("vec_id"), onehot.alias("embedding")
    ).createOrReplaceTempView("embeddings")

    t0 = time.time()
    row = spark.sql(_DISPERSION_SPARK).collect()[0]
    dt = time.time() - t0

    want_cos = round((n / 64 - 1) / (n - 1), 6)
    want_norm = round(math.sqrt(64 * (n / 64) ** 2) / n, 6)
    assert row.n_docs == n and row.dim == 64, row
    assert row.avg_pairwise_cosine == want_cos, (row, want_cos)
    assert row.centroid_norm == want_norm == 0.125, (row, want_norm)
    print(
        f"one-hot plant n={n}: avg_pairwise_cosine == {want_cos} EXACT "
        f"(closed form; {n * (n - 1):,} implied pairs, zero enumerated), "
        f"centroid_norm == 0.125 EXACT, in {dt:.1f}s"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
