"""Scale probe for the round-11 split-conformal quantile: run
stats.conformal_quantile over a synthetic ALL-DISTINCT residual relation
(worst case for the cumulative — nothing collapses) and check (a) wall
time at increasing n, (b) that cumsum_auto routes to the two-level
spelling past the threshold, and (c) closed-form exactness — residuals
are the permutation 0..n-1, so the ceil((n+1)(1-alpha))-th smallest is
exactly ceil((n+1)(1-alpha)) - 1 at ANY n.

The probe is the conformal twin of tools/rankcurve_probe.py: at 100 TB
a residual quantized to cents has a bounded domain, so the all-distinct
regime here is the adversarial ceiling, exactly as for the ranking
curves.

Usage: python tools/conformal_probe.py [n ...]
       (default 1_000_000 10_000_000 50_000_000)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from datafusion_gpu_spark.operators.stats import (
        CUMSUM_ROUTE_THRESHOLD,
        conformal_quantile,
    )

    sizes = [int(a) for a in sys.argv[1:]] or [
        1_000_000, 10_000_000, 50_000_000,
    ]
    alpha = 0.1
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .appName("conformal-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for n in sizes:
        residuals = spark.range(n).select(F.col("id").alias("res"))
        t0 = time.time()
        q = conformal_quantile(residuals, "res", alpha=alpha)
        plan = q._jdf.queryExecution().executedPlan().toString()
        [row] = q.collect()
        wall = time.time() - t0
        k = -(-(n + 1) * 9 // 10)  # ceil((n+1)*0.9) in exact ints
        expect = k - 1  # residuals are 0..n-1
        routed_two_level = "__bucket" in plan
        ok = (
            row.n_cal == n
            and row.k_rank == k
            and row.q_res == expect
            and routed_two_level == (n > CUMSUM_ROUTE_THRESHOLD)
        )
        print(
            f"n={n:>11,}  wall={wall:6.1f}s  "
            f"route={'two-level' if routed_two_level else 'single'}  "
            f"q_res={row.q_res} (expect {expect})  "
            f"{'EXACT' if ok else 'MISMATCH'}"
        )
        assert ok, (row, k, expect, routed_two_level)
    spark.stop()


if __name__ == "__main__":
    main()
