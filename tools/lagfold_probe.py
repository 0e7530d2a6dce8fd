#!/usr/bin/env python
"""Scale probe (VERDICT r15 ask #8): the lag-fold family's
each-distinct-lag-once respelling at sf>=1-equivalent sizes.

The r15 change projects each distinct (column, offset, window-spec) lag
ONCE and lets the folds consume the shared column — Spark does not
deduplicate identical window expressions, so the old inline spelling
evaluated every lag 2-4x inside WindowExec (holt_linear: 118 window
expressions per row where 31 are distinct). At sf0.1 the window's
shuffle dominates and the change is wall-flat; this probe measures the
WindowExec-bound regime (synthetic in-memory series, no scan, one keyed
exchange, window CPU >> everything) where the 2-4x per-row work is the
whole query.

Control: the r14 inline-lag spelling (941aef3~1), restated VERBATIM
below as ``holt_inline_lags`` (same weights, same terminal expressions,
same window spec). Variants are interleaved sample-by-sample in one
session; outputs are proven identical by an exact bigint fold compare
at the smallest size before any timing.

Usage: python tools/lagfold_probe.py [rows ...]   (default 2M 10M 30M)
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402


def holt_inline_lags(events, span, key_col="key", ts_col="ts",
                     id_col="id", val_col="v", scale=100):
    """The r14 spelling: every weight term calls F.lag(...).over(w)
    inline — 2 window expressions per den/num term, nothing shared."""
    from pyspark.sql import Window

    from datafusion_gpu_spark.operators.events import (
        holt_terminal_exprs, holt_weights,
    )

    w = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    df = events.withColumn("__c__", F.round(F.col(val_col) * scale).cast("long"))
    w1, w2 = holt_weights(span)
    num1 = F.lit(0).cast("long")
    den1 = F.lit(0).cast("long")
    for k, wgt in enumerate(w1):
        lagged = F.lag("__c__", k).over(w)
        num1 = num1 + F.coalesce(lagged * F.lit(wgt), F.lit(0).cast("long"))
        den1 = den1 + F.when(lagged.isNotNull(), F.lit(wgt)).otherwise(
            F.lit(0)
        ).cast("long")
    num2 = F.lit(0).cast("long")
    den2 = F.lit(0).cast("long")
    for j, wgt in enumerate(w2):
        lagged = F.lag("__c__", j).over(w)
        num2 = num2 + F.coalesce(lagged * F.lit(wgt), F.lit(0).cast("long"))
        den2 = den2 + F.when(lagged.isNotNull(), F.lit(wgt)).otherwise(
            F.lit(0)
        ).cast("long")
    exact = df.select(
        key_col, id_col,
        num1.alias("num1"), den1.alias("den1"),
        num2.alias("num2"), den2.alias("den2"),
    )
    terms = holt_terminal_exprs(scale)
    return exact.select(
        key_col, id_col, "num1", "den1", "num2", "den2",
        *[F.expr(sql).alias(name) for name, sql in terms.items()],
    )


def main() -> int:
    sizes = [int(s) for s in sys.argv[1:]] or [2_000_000, 10_000_000, 30_000_000]
    span = 16
    n_keys = 64

    from datafusion_gpu_spark.context import get_spark
    from datafusion_gpu_spark.operators.events import holt_linear

    spark = get_spark("lagfold-probe")
    spark.sparkContext.setLogLevel("ERROR")

    def series(n):
        return spark.range(n).select(
            (F.col("id") % n_keys).alias("key"),
            F.col("id").alias("ts"),
            F.col("id"),
            (F.pmod(F.xxhash64("id", F.lit(7)), F.lit(10_000)) / 100.0).alias("v"),
        )

    # byte-identity of the two spellings at the smallest size: sum of
    # bounded per-row hash residues (raw bigint sums overflow int64 —
    # num2 <= den2 * max_cents ~ 4e13/row)
    df0 = series(sizes[0])
    agg = [
        F.sum(F.pmod(
            F.xxhash64("num1", "den1", "num2", "den2"), F.lit(1 << 40)
        )),
        F.count(F.lit(1)),
    ]
    a = holt_linear(df0, key_col="key", ts_col="ts", id_col="id",
                    val_col="v", span=span).agg(*agg).collect()[0]
    b = holt_inline_lags(df0, span).agg(*agg).collect()[0]
    assert tuple(a) == tuple(b), (a, b)
    print(f"fold-identity at {sizes[0]} rows: OK {tuple(a)}", file=sys.stderr)

    for n in sizes:
        df = series(n)
        variants = {
            "folded(r15)": lambda d=df: holt_linear(
                d, key_col="key", ts_col="ts", id_col="id",
                val_col="v", span=span),
            "inline(r14)": lambda d=df: holt_inline_lags(d, span),
        }
        times: dict[str, list[float]] = {k: [] for k in variants}
        for name, build in variants.items():  # warm both once
            build().write.format("noop").mode("overwrite").save()
        for rnd in range(3):
            for name, build in variants.items():
                spark.sparkContext.setJobDescription(
                    f"lagfold {name} n={n} #{rnd}")
                t0 = time.perf_counter()
                build().write.format("noop").mode("overwrite").save()
                times[name].append(time.perf_counter() - t0)
        for name, ts in times.items():
            print(f"rows={n:>11,} {name:12s} median {statistics.median(ts):7.3f} s"
                  f"  all {[round(t, 2) for t in ts]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
