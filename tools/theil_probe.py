"""Scale probe: theil_sen_trend_bucketed at millions of pairs.

The bucketed selection's claim is that it removes the plain spelling's
only non-parallel stage (a global ROW_NUMBER over every pairwise
slope) while returning the IDENTICAL row. This probe generates a
bounded hourly series distributed (spark.range — no driver data) whose
size drives a multi-million-row pair space, runs BOTH spellings, and
asserts bit-identical outputs plus a closed-form check: the series is
y = 7x + c(x) with a bounded, zero-median perturbation c(x) in
{-1, 0, +1}, so more than half of all pairwise slopes are exactly 7
within every co-phase residue class — the median slope is exactly 7.0
and the intercept median lands on 300.0.

Usage: python tools/theil_probe.py [n_points]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3_000
    from pyspark.sql import functions as F

    from datafusion_gpu_spark.context import get_spark
    from datafusion_gpu_spark.operators.events import (
        theil_sen_trend,
        theil_sen_trend_bucketed,
    )

    spark = get_spark("theil-probe")
    spark.sparkContext.setLogLevel("ERROR")

    # bounded perturbation, exactly zero-median over each period of 3
    pts = spark.range(1, n + 1).select(
        F.col("id").alias("bucket"),
        (7 * F.col("id") + 300 + (F.col("id") % 3 - 1)).alias("v_c"),
    )
    n_pairs = n * (n - 1) // 2

    t0 = time.time()
    plain = theil_sen_trend(pts).collect()[0]
    dt_plain = time.time() - t0
    t0 = time.time()
    buck = theil_sen_trend_bucketed(pts).collect()[0]
    dt_buck = time.time() - t0

    assert tuple(buck) == tuple(plain), (buck, plain)
    assert plain.n_pairs == n_pairs, plain
    assert plain.slope == 7.0, plain
    assert abs(plain.intercept - 300.0) <= 1.0, plain
    print(
        f"n={n} points -> {n_pairs:,} pairs: bucketed == plain "
        f"BIT-IDENTICAL (slope {plain.slope}, intercept "
        f"{plain.intercept}); plain {dt_plain:.1f}s "
        f"(global rank) vs bucketed {dt_buck:.1f}s (partitioned "
        f"selection)"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
