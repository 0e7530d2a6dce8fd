"""Scale probe: survival_logrank exactness at 50M subjects.

The operator's scale claim is that everything after the one
groupBy(duration) shuffle runs on the DISTINCT-DURATION relation
(thousands of rows however many subjects exist), with the O-E and
variance terms quantized to exact 1e-9 bigints so the fold is
order-independent. This probe generates N subjects distributed
(spark.range — no driver-side data), where the per-(duration, cohort)
cell counts are known in closed form, and asserts:

1. identical cohort profiles  -> chi2 == 0.0 EXACTLY (every quantized
   E1 term is the exact integer d/2 * 1e9, so O1 - E1 cancels to zero
   in integer arithmetic — any float leakage in the fold would break
   exact equality at this N);
2. a shifted-hazard plant     -> the operator's (o1, e1, var, chi2)
   equal a pure-Python replay of the quantized fold over the planted
   per-cell counts (the distinct-time relation is small, so the replay
   is exact and cheap even though the subject relation is 50M rows).

Usage: python tools/logrank_probe.py [n_subjects]
"""

from __future__ import annotations

import sys
import time
from decimal import ROUND_HALF_UP, Decimal

sys.path.insert(0, ".")


def rhu(x: float) -> int:
    return int(Decimal(x).quantize(Decimal(1), rounding=ROUND_HALF_UP))


def python_fold(cells: dict[tuple[int, int], tuple[int, int]]):
    """Replay the operator's quantized fold over {(t, grp): (d, c)}."""
    times = sorted({t for t, _ in cells})
    suf1 = suf0 = 0
    suffix = {}
    for t in reversed(times):
        d1, c1 = cells.get((t, 1), (0, 0))
        d0, c0 = cells.get((t, 0), (0, 0))
        suf1 += d1 + c1
        suf0 += d0 + c0
        suffix[t] = (suf1, suf0)
    o1 = se1q = svq = 0
    for t in times:
        d1, _ = cells.get((t, 1), (0, 0))
        d0, _ = cells.get((t, 0), (0, 0))
        d = d1 + d0
        if d == 0:
            continue
        n1, n0 = suffix[t]
        n = float(n1 + n0)
        o1 += d1
        se1q += rhu(1e9 * (float(d) * n1 / n))
        if n1 + n0 > 1:
            svq += rhu(
                1e9 * (float(d) * (n1 / n) * (n0 / n) * ((n - d) / (n - 1.0)))
            )
    e1, v = se1q / 1e9, svq / 1e9
    chi2 = (o1 - e1) * (o1 - e1) / v
    return o1, round(e1, 6), round(v, 6), round(chi2, 6)


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000_000
    from pyspark.sql import functions as F

    from datafusion_gpu_spark.context import get_spark
    from datafusion_gpu_spark.operators.events import survival_logrank

    spark = get_spark("logrank-probe")
    spark.sparkContext.setLogLevel("ERROR")

    # --- plant 1: identical profiles -> chi2 exactly 0 -----------------
    # duration/censoring derive from id DIV 2, cohort from id % 2, so the
    # two cohorts are cell-for-cell identical by construction.
    base = spark.range(n).select(
        ((F.col("id") / 2).cast("long") % 1000).alias("duration"),
        (F.col("id") % 2).alias("grp"),
        (((F.col("id") / 2).cast("long") % 10) > 0).cast("int").alias("observed"),
    )
    t0 = time.time()
    row = survival_logrank(base).collect()[0]
    dt1 = time.time() - t0
    assert row.chi2_lr == 0.0, row
    assert row.o1 == n // 2 * 9 // 10, row  # 90% of cohort 1 observed
    assert row.n1_subjects == n // 2 and row.n0_subjects == n // 2, row
    print(
        f"plant1 identical-profiles n={n}: chi2 == 0.0 EXACT "
        f"(o1={row.o1}, e1={row.e1}) in {dt1:.1f}s"
    )

    # --- plant 2: shifted hazard -> equals the Python replay -----------
    # cohort 1's durations shift +250, so its hazard is later everywhere;
    # cell counts stay closed-form: per (t, grp) cell = n/4000 subjects
    # (n divisible by 4000 recommended), 90% observed.
    shifted = spark.range(n).select(
        (
            ((F.col("id") / 2).cast("long") % 1000)
            + F.when(F.col("id") % 2 == 1, F.lit(250)).otherwise(F.lit(0))
        ).alias("duration"),
        (F.col("id") % 2).alias("grp"),
        (((F.col("id") / 2).cast("long") % 10) > 0).cast("int").alias("observed"),
    )
    t0 = time.time()
    row = survival_logrank(shifted).collect()[0]
    dt2 = time.time() - t0

    per_cell = n // 2 // 1000  # subjects per (t, grp) cell
    # duration and censoring both derive from m = id DIV 2, so they are
    # CORRELATED by construction: a cell at pre-shift duration t holds
    # only subjects with m % 10 == t % 10 — fully observed unless
    # t % 10 == 0 (then fully censored). The replay must model that.
    cells: dict[tuple[int, int], tuple[int, int]] = {}
    for t in range(1000):
        d, c = (per_cell, 0) if t % 10 else (0, per_cell)
        cells[(t, 0)] = (d, c)
        cells[(t + 250, 1)] = (d, c)
    o1, e1, v, chi2 = python_fold(cells)
    got = (row.o1, row.e1, row.var_lr, row.chi2_lr)
    assert got == (o1, e1, v, chi2), (got, (o1, e1, v, chi2))
    print(
        f"plant2 shifted-hazard n={n}: EXACT match with the Python fold "
        f"(chi2={chi2}, reject={row.reject_05}) in {dt2:.1f}s"
    )
    print(f"OK: both plants exact at n={n} ({dt1 + dt2:.1f}s total)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
