"""Scale probe: cox_ph_binary exactness at ~20M subjects.

The operator's scale claim is that the Breslow partial-likelihood fit
needs only the per-time risk-set counts, so after ONE groupBy(duration)
shuffle all six Newton/reporting folds run on the DISTINCT-DURATION
relation (hundreds of rows however many subjects exist), with each
fold's score/information terms quantized to exact 1e-9 bigints. This
probe generates N subjects distributed (spark.range — no driver-side
data) with closed-form per-(duration, cohort) cell counts and asserts:

1. identical cohort profiles -> beta == 0.0 EXACTLY (U(0) folds to the
   exact integer 0, so every Newton step is 0/I = 0 — any float leakage
   in the fold breaks exact zero at this N);
2. a compressed-hazard plant (cohort 1's durations live on half the
   range, so its hazard is uniformly higher) -> the operator's (beta,
   hazard_ratio, se_beta, z_wald) equal a pure-Python replay of the
   quantized Newton iteration over the planted per-cell counts — the
   distinct-duration relation is 720 rows, so the replay is exact and
   cheap even though the subject relation is 20M rows.

Usage: python tools/cox_probe.py [n_subjects]
"""

from __future__ import annotations

import math
import sys
import time
from decimal import ROUND_HALF_UP, Decimal

sys.path.insert(0, ".")


def rhu(x: float) -> int:
    return int(Decimal(x).quantize(Decimal(1), rounding=ROUND_HALF_UP))


def python_newton(cells: dict[tuple[int, int], int], iters: int = 5):
    """Replay the operator's quantized Newton fit over
    {(t, grp): n_events} (no censoring in the plant)."""
    times = sorted({t for t, _ in cells})
    suf1 = suf0 = 0
    suffix = {}
    for t in reversed(times):
        suf1 += cells.get((t, 1), 0)
        suf0 += cells.get((t, 0), 0)
        suffix[t] = (suf1, suf0)
    ev = [
        (cells.get((t, 1), 0), cells.get((t, 1), 0) + cells.get((t, 0), 0))
        + suffix[t]
        for t in times
        if cells.get((t, 1), 0) + cells.get((t, 0), 0) > 0
    ]

    def fold(b):
        su = si = 0
        for d1, d, m1, m0 in ev:
            eb = math.exp(b)
            num = float(m1) * eb
            rr = num / (num + float(m0))
            su += rhu(1e9 * (float(d1) - float(d) * rr))
            si += rhu(1e9 * (float(d) * rr * (1.0 - rr)))
        return su, si

    b = 0.0
    for _ in range(iters):
        su, si = fold(b)
        b = b + (su / 1e9) / (si / 1e9)
    su, si = fold(b)
    return (
        round(b, 6),
        round(math.exp(b), 6),
        round(1.0 / math.sqrt(si / 1e9), 6),
        round(b * math.sqrt(si / 1e9), 6),
    )


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_736_000
    # closed-form cell counts need n divisible by 2880 (= lcm of the
    # 2x720 and 2x360 cell grids); round down rather than replay wrongly
    n -= n % 2880
    from pyspark.sql import functions as F

    from datafusion_gpu_spark.context import get_spark
    from datafusion_gpu_spark.operators.events import cox_ph_binary

    spark = get_spark("cox-probe")
    spark.sparkContext.setLogLevel("ERROR")

    # --- plant 1: identical profiles -> beta exactly 0 ------------------
    base = spark.range(n).select(
        ((F.col("id") / 2).cast("long") % 720).alias("duration"),
        (F.col("id") % 2).alias("grp"),
        F.lit(1).alias("observed"),
    )
    t0 = time.time()
    row = cox_ph_binary(base).collect()[0]
    dt1 = time.time() - t0
    assert row.beta == 0.0 and row.hazard_ratio == 1.0, row
    assert row.n_events == n and row.n1_subjects == n // 2, row
    print(
        f"plant1 identical-profiles n={n}: beta == 0.0 EXACT "
        f"(hr={row.hazard_ratio}) in {dt1:.1f}s"
    )

    # --- plant 2: compressed hazard -> equals the Python replay ---------
    # cohort 0 uniform on 0..719, cohort 1 uniform on 0..359 (durations
    # halved -> uniformly higher hazard); per-cell counts closed-form
    # when n is divisible by 2880.
    comp = spark.range(n).select(
        F.when(
            F.col("id") % 2 == 1, (F.col("id") / 2).cast("long") % 360
        )
        .otherwise((F.col("id") / 2).cast("long") % 720)
        .alias("duration"),
        (F.col("id") % 2).alias("grp"),
        F.lit(1).alias("observed"),
    )
    t0 = time.time()
    row = cox_ph_binary(comp).collect()[0]
    dt2 = time.time() - t0

    half = n // 2
    cells: dict[tuple[int, int], int] = {}
    for t in range(720):
        cells[(t, 0)] = half // 720
    for t in range(360):
        cells[(t, 1)] = half // 360
    beta, hr, se, z = python_newton(cells)
    got = (row.beta, row.hazard_ratio, row.se_beta, row.z_wald)
    assert got == (beta, hr, se, z), (got, (beta, hr, se, z))
    assert row.reject_05 is True and beta > 0, row
    print(
        f"plant2 compressed-hazard n={n}: EXACT match with the Python "
        f"Newton replay (beta={beta}, hr={hr}, z={z}) in {dt2:.1f}s"
    )
    print(f"OK: both plants exact at n={n} ({dt1 + dt2:.1f}s total)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
