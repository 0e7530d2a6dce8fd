"""Throughput probe for the single-aggregation statistical gates
(Welch t, ANOVA F) at synthetic row counts far beyond the sf tables —
the evidence that the "one map-side-combined fold" scale argument in
SCALE.md is measured, not asserted.

Corpus: n rows, 5 groups, integer cent values with per-group offsets
(every group non-degenerate). Both tests reduce to ONE hash aggregation
over exact bigint moments; wall time should scale ~linearly in n and
sit near the scan rate.

Usage: python tools/stats_agg_probe.py [n ...] (default 20e6 100e6 200e6)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    sizes = [int(float(a)) for a in sys.argv[1:]] or [
        20_000_000, 100_000_000, 200_000_000]
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .appName("stats-agg-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from datafusion_gpu_spark.queries.pipeline import _ANOVA_F, _WELCH_T

    groups = ["click", "purchase", "view", "signup", "error"]
    for n in sizes:
        ev = spark.range(n).select(
            F.element_at(
                F.array(*[F.lit(g) for g in groups]),
                (F.col("id") % 5 + 1).cast("int"),
            ).alias("event_type"),
            # integer cents / 100.0: the queries re-quantize to the same
            # cents, so the fold is exact; xxhash spreads values widely
            ((F.xxhash64("id").bitwiseAND(F.lit(0x7FFF)) + F.col("id") % 5)
             / 100.0).alias("value"),
        )
        ev.createOrReplaceTempView("events")
        for label, sql in (("welch_t", _WELCH_T), ("anova_f", _ANOVA_F)):
            spark.sql(sql).collect()  # warm
            t0 = time.time()
            [row] = spark.sql(sql).collect()
            dt = time.time() - t0
            stat = row.t_stat if label == "welch_t" else row.f_stat
            print(
                f"n={n:>12,}  {label:<8}  {dt:6.2f}s  "
                f"{n / dt / 1e6:7.1f} M rows/s  stat={stat}",
                flush=True,
            )
        spark.catalog.dropTempView("events")


if __name__ == "__main__":
    main()
