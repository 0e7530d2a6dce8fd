"""Dedup scale probe: measures end-to-end MinHash+LSH+verify throughput
on synthetic corpora far larger than the driver's sf tables.

Corpus: n docs x 60 words from a 100k-word vocabulary (wide vocabulary
matters — a toy vocab collapses the shingle space and LSH bands collide
quadratically); every odd doc is a near-duplicate of its predecessor,
so exactly n/2 true pairs exist and recall is checkable.

Usage: python tools/scale_probe.py [n ...]   (default 5000 50000 200000)
Prints one line per n: pairs found, wall time, docs/sec.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def corpus(spark, n: int):
    from pyspark.sql import functions as F

    base = spark.range(n).withColumn(
        "words",
        F.transform(
            F.sequence(F.lit(0), F.lit(59)),
            lambda i: F.concat(
                F.lit("w"),
                (
                    F.xxhash64((F.col("id") / 2).cast("long") * 1000 + i)
                    .bitwiseAND(F.lit(0x7FFFFFFF))
                    % 100000
                ),
            ),
        ),
    )
    return base.select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, F.concat_ws(" ", F.col("words")))
        .otherwise(F.concat_ws(" ", F.col("words"), F.lit("tail")))
        .alias("text"),
    ).repartition(32).cache()


def main() -> int:
    sizes = [int(a) for a in sys.argv[1:]] or [5_000, 50_000, 200_000]

    from datafusion_gpu_spark.context import get_spark
    from datafusion_gpu_spark.operators.dedup import minhash_lsh_pairs

    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for n in sizes:
        docs = corpus(spark, n)
        docs.count()
        t0 = time.perf_counter()
        pairs = minhash_lsh_pairs(docs, threshold=0.5).count()
        dt = time.perf_counter() - t0
        expected = n // 2
        recall = pairs / expected if expected else 1.0
        print(
            f"n={n} pairs={pairs} (recall {recall:.3f}) "
            f"time={dt:.1f}s rate={n / dt:.0f} docs/s",
            flush=True,
        )
        docs.unpersist()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
