"""Scale probe: cox_schoenfeld_ph exactness at ~20M subjects.

The diagnostic's scale claim mirrors the fit's (tools/cox_probe.py):
after ONE groupBy(duration) shuffle, the Newton chain AND the extra
Grambsch-Therneau fold all run on the DISTINCT-DURATION relation (720
rows however many subjects exist), every per-time term quantized to
exact 1e-9 bigints. This probe generates N subjects distributed
(spark.range — no driver-side data) with closed-form per-(duration,
cohort) cell counts and asserts:

1. identical cohort profiles -> s_t folds to the exact integer 0 at
   every event time, so u_theta == +0.0 EXACTLY (the signed-zero
   normalization must emit +0.0, not -0.0) and chi2_ph == 0.0 — the
   check must NOT fire on a perfectly proportional plant;
2. the compressed-hazard plant (cohort 1's durations on half the
   range) has hazard ratio (720-t)/(360-t) RISING in t — a real PH
   violation at 20M subjects: the operator's (beta, u_theta,
   var_theta, chi2_ph) must equal a pure-Python replay of the
   quantized Newton + GT folds over the 1,080 planted cells, and
   reject_05 must be TRUE.

Usage: python tools/schoenfeld_probe.py [n_subjects]
"""

from __future__ import annotations

import math
import sys
import time
from decimal import ROUND_HALF_UP, Decimal

sys.path.insert(0, ".")


def rhu(x: float) -> int:
    return int(Decimal(x).quantize(Decimal(1), rounding=ROUND_HALF_UP))


def python_newton_gt(cells: dict[tuple[int, int], int], iters: int = 5):
    """Replay the operator's quantized Newton fit + GT fold over
    {(t, grp): n_events} (no censoring in the plant)."""
    times = sorted({t for t, _ in cells})
    suf1 = suf0 = 0
    suffix = {}
    for t in reversed(times):
        suf1 += cells.get((t, 1), 0)
        suf0 += cells.get((t, 0), 0)
        suffix[t] = (suf1, suf0)
    ev = [
        (t, cells.get((t, 1), 0),
         cells.get((t, 1), 0) + cells.get((t, 0), 0)) + suffix[t]
        for t in times
        if cells.get((t, 1), 0) + cells.get((t, 0), 0) > 0
    ]

    def fold(b):
        su = si = 0
        for _t, d1, d, m1, m0 in ev:
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

    tmin, tmax = ev[0][0], ev[-1][0]
    ssq = sgsq = svq = sgvq = sg2vq = 0
    for t, d1, d, m1, m0 in ev:
        eb = math.exp(b)
        num = float(m1) * eb
        rr = num / (num + float(m0))
        s = float(d1) - float(d) * rr
        v = float(d) * rr * (1.0 - rr)
        g = float(t - tmin) / float(tmax - tmin) if tmax > tmin else 0.0
        ssq += rhu(1e9 * s)
        sgsq += rhu(1e9 * g * s)
        svq += rhu(1e9 * v)
        sgvq += rhu(1e9 * g * v)
        sg2vq += rhu(1e9 * g * g * v)
    u = sgsq / 1e9 - (sgvq / 1e9) * (ssq / 1e9) / (svq / 1e9)
    var = sg2vq / 1e9 - (sgvq / 1e9) * (sgvq / 1e9) / (svq / 1e9)
    chi2 = u * u / var
    return (
        round(b, 6) + 0.0,
        round(u, 6) + 0.0,
        round(var, 6) + 0.0,
        round(chi2, 6),
        chi2 > 3.841459,
    )


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_736_000
    n -= n % 2880  # closed-form cells need n divisible by lcm(2*720, 2*360)
    from pyspark.sql import functions as F

    from datafusion_gpu_spark.context import get_spark
    from datafusion_gpu_spark.operators.events import cox_schoenfeld_ph

    spark = get_spark("schoenfeld-probe")
    spark.sparkContext.setLogLevel("ERROR")

    # --- plant 1: identical profiles -> u_theta exactly +0.0 ------------
    base = spark.range(n).select(
        ((F.col("id") / 2).cast("long") % 720).alias("duration"),
        (F.col("id") % 2).alias("grp"),
        F.lit(1).alias("observed"),
    )
    t0 = time.time()
    row = cox_schoenfeld_ph(base).collect()[0]
    dt1 = time.time() - t0
    assert row.beta == 0.0 and row.u_theta == 0.0, row
    assert math.copysign(1.0, row.u_theta) > 0, "signed zero leaked"
    assert row.chi2_ph == 0.0 and row.reject_05 is False, row
    assert row.n_events == n and row.n_event_times == 720, row
    print(
        f"plant1 identical-profiles n={n}: u_theta == +0.0 EXACT, "
        f"chi2 == 0.0, no fire, in {dt1:.1f}s"
    )

    # --- plant 2: compressed hazard = rising HR -> check FIRES ----------
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
    row = cox_schoenfeld_ph(comp).collect()[0]
    dt2 = time.time() - t0

    half = n // 2
    cells: dict[tuple[int, int], int] = {}
    for t in range(720):
        cells[(t, 0)] = half // 720
    for t in range(360):
        cells[(t, 1)] = half // 360
    beta, u, var, chi2, rej = python_newton_gt(cells)
    got = (row.beta, row.u_theta, row.var_theta, row.chi2_ph, row.reject_05)
    assert got == (beta, u, var, chi2, rej), (got, (beta, u, var, chi2, rej))
    assert row.reject_05 is True, row
    print(
        f"plant2 rising-HR n={n}: EXACT match with the Python replay "
        f"(beta={beta}, u_theta={u}, chi2={chi2}) — PH violation FIRES, "
        f"in {dt2:.1f}s"
    )
    print(f"OK: both plants exact at n={n} ({dt1 + dt2:.1f}s total)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
