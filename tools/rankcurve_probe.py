"""Scale probe for the round-10 ranking curves (gain/lift + precision@k):
run the decile machinery over a synthetic WIDE-domain scored corpus and
check (a) wall time at increasing n, (b) that the cumsum_auto routing
actually flips to the two-level spelling past the threshold, and
(c) closed-form correctness — the synthetic score is a perfect
separator with a 10% positive rate, so gain(1) == 1.0, lift(1) == 10.0
and gain(k) == 1.0 for every later decile, at ANY n.

Corpus: n rows, distinct integer scores (worst case for the cumulative
— nothing collapses), positives = the top 10% of scores exactly.

Usage: python tools/rankcurve_probe.py [n ...]
       (default 1_000_000 10_000_000 50_000_000)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def synth(spark, n: int):
    from pyspark.sql import functions as F

    # score = row id (all distinct); positive iff score in the top 10%
    return spark.range(n).select(
        F.col("id").alias("d_raw"),
        F.when(F.col("id") >= int(n * 0.9), 1).otherwise(0).alias("pos"),
    )


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from datafusion_gpu_spark.operators.stats import cumsum_auto
    from datafusion_gpu_spark.queries.pipeline import _GAIN_LIFT_TAIL

    sizes = [int(a) for a in sys.argv[1:]] or [
        1_000_000, 10_000_000, 50_000_000,
    ]
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .appName("rankcurve-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for n in sizes:
        t0 = time.time()
        # distinct-score relation ordered by descending score (d = -score)
        pv = (
            synth(spark, n)
            .groupBy((-F.col("d_raw")).alias("d"))
            .agg(
                F.sum("pos").cast("long").alias("dp"),
                F.count(F.lit(1)).cast("long").alias("tc"),
            )
        )
        cum = cumsum_auto(pv, "d", ("tc", "dp")).select(
            "d", "dp", "tc",
            (F.col("cum_tc") - F.col("tc")).alias("cu"),
            (F.col("cum_dp") - F.col("dp")).alias("cp"),
        )
        cum.createOrReplaceTempView("__probe_cum")
        routed_two_level = "__bucket" in (
            cum._jdf.queryExecution().executedPlan().toString()
        )
        rows = {
            r.decile: r
            for r in spark.sql(
                _GAIN_LIFT_TAIL.format(cum="__probe_cum")
            ).collect()
        }
        dt = time.time() - t0
        route = "two-level" if routed_two_level else "single-window"
        print(
            f"n={n:>11,}  {route:<13}  {dt:6.2f}s  "
            f"gain1={rows[1].gain} lift1={rows[1].lift} "
            f"gain5={rows[5].gain} gain10={rows[10].gain}",
            flush=True,
        )
        assert rows[1].gain == 1.0 and rows[1].lift == 10.0, rows[1]
        assert rows[5].gain == 1.0 and rows[10].lift == 1.0
        assert routed_two_level == (n > 65_536), (n, route)
    print("closed-form + routing assertions OK at every size", flush=True)


if __name__ == "__main__":
    main()
