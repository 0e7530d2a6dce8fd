"""A/B probe: single-partition distinct-value window vs the two-level
bucketed-cumsum spelling (operators/stats.py) on a synthetic WIDE-domain
corpus — the regime SCALE.md's stats-family note is about (the gate
tables top out at ~40k distinct cent values; here the domain is 10M+).

Corpus: 2*n rows, two groups, value = row_id div 2 shifted per group, so
the distinct-value relation has ~n rows with cross-group ties — the
worst case for the rank-cumulative (every distinct value is window
cardinality, nothing collapses).

Both spellings run through stats.mann_whitney_u — n_buckets=1 IS the
single-window plan (one bucket == one global ordered partition plus a
trivial one-row offset), n_buckets=512 is the two-level plan — so the
A/B isolates the window strategy with identical surrounding algebra.
Exact outputs (n_a, n_b, u2_a, tie3, z_stat) are asserted identical.

Usage: python tools/stats_window_probe.py [n_distinct ...]
       (default 1_000_000 10_000_000)
Prints one line per (n, spelling): wall seconds + the shared statistics.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def synth(spark, n: int):
    from pyspark.sql import functions as F

    # group a: values 0..n-1 (even ids), group b: values 5..n+4 — heavy
    # overlap (ties on n-5 values), distinct domain ~n+5
    return spark.range(2 * n).select(
        F.when(F.col("id") % 2 == 0, "click").otherwise("purchase").alias("grp"),
        (
            (F.col("id") / 2).cast("long")
            + F.when(F.col("id") % 2 == 0, 0).otherwise(5)
        ).alias("c"),
    )


def main() -> None:
    from pyspark.sql import SparkSession

    from datafusion_gpu_spark.operators.stats import mann_whitney_u

    sizes = [int(a) for a in sys.argv[1:]] or [1_000_000, 10_000_000]
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .appName("stats-window-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for n in sizes:
        df = synth(spark, n)
        results = {}
        for label, n_buckets in (("single-window", 1), ("two-level-512", 512)):
            t0 = time.time()
            [row] = mann_whitney_u(
                df, "grp", "c", "click", "purchase", n_buckets=n_buckets
            ).collect()
            dt = time.time() - t0
            results[label] = row
            print(
                f"n={n:>10,}  {label:<14}  {dt:7.2f}s  "
                f"u2_a={row.u2_a}  tie3={row.tie3}  z={row.z_stat}",
                flush=True,
            )
        a, b = results["single-window"], results["two-level-512"]
        assert (a.n_a, a.n_b, a.u2_a, a.tie3, a.z_stat) == (
            b.n_a, b.n_b, b.u2_a, b.tie3, b.z_stat,
        ), "two-level spelling diverged from the single-window plan"
        print(f"n={n:>10,}  parity OK (bit-identical statistics)", flush=True)


if __name__ == "__main__":
    main()
