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


def corpus(spark, n: int, exact_dups: bool = False):
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
    # curate mode: odd ids are EXACT copies of the even sibling (tests the
    # dedup stage) and every doc opens with the en stopword profile so the
    # language gate keeps it; minhash mode keeps the near-dup " tail" delta
    tail = F.lit("") if exact_dups else F.lit("tail")
    body = F.concat_ws(" ", F.lit("the a of and is"), F.col("words"))
    return base.select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, body)
        .otherwise(F.concat_ws(" ", body, tail))
        .alias("text"),
    ).repartition(32).cache()


def main() -> int:
    args = sys.argv[1:]
    op = "minhash"
    if args and args[0] in ("minhash", "curate"):
        op, args = args[0], args[1:]
    sizes = [int(a) for a in args] or [5_000, 50_000, 200_000]

    from datafusion_gpu_spark.context import get_spark
    from datafusion_gpu_spark.operators.curation import curate_corpus
    from datafusion_gpu_spark.operators.dedup import minhash_lsh_pairs

    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for n in sizes:
        docs = corpus(spark, n, exact_dups=op == "curate")
        docs.count()
        t0 = time.perf_counter()
        if op == "curate":
            kept = curate_corpus(docs, budget=2048, shards=64).count()
            dt = time.perf_counter() - t0
            expected = (n + 1) // 2  # odd ids are exact dups of evens
            print(
                f"n={n} kept={kept} (expected {expected}) "
                f"time={dt:.1f}s rate={n / dt:.0f} docs/s",
                flush=True,
            )
            assert kept == expected, (kept, expected)
        else:
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
