"""Scale probe: events_brier_ipcw's three-KM fold at ~20M subjects.

The operator runs THREE ln-quantized Kaplan-Meier systems (cohort-1
survival, cohort-0 survival, pooled censoring) plus the weighted
failure fold on ONE distinct-duration relation. The probe plants the
cox/uno grid — cohort 0 uniform on 0..719 h, cohort 1 compressed onto
0..359 h, every 5th subject censored at its time — via spark.range
arithmetic, splices the REGISTRY SQL's tail verbatim (marker-replace
at the per_t boundary) over the planted subjects, and asserts every
output (both cohort KMs at tau, G(tau), w_max, brier) EXACTLY equals
a pure-Python replay of the quantized spelling over the 720
closed-form cells.

Usage: python tools/brier_probe.py [n_subjects]  (default 20_736_000,
  rounded down to a multiple of 7200)
"""

from __future__ import annotations

import math
import sys
import time
from decimal import ROUND_HALF_UP, Decimal

sys.path.insert(0, ".")

TAU = 24


def rhu(x: float) -> int:
    return int(Decimal(x).quantize(Decimal(1), rounding=ROUND_HALF_UP))


def replay(n: int):
    base = n // 7200
    d = {}
    c = {}
    for r in range(720):
        d[(r, 0)] = d.get((r, 0), 0) + 4 * base
        c[(r, 0)] = c.get((r, 0), 0) + 1 * base
        t1 = r // 2
        d[(t1, 1)] = d.get((t1, 1), 0) + 4 * base
        c[(t1, 1)] = c.get((t1, 1), 0) + 1 * base
    times = sorted({t for (t, _g) in d})
    tot1 = sum(d.get((t, 1), 0) + c.get((t, 1), 0) for t in times)
    tot0 = sum(d.get((t, 0), 0) + c.get((t, 0), 0) for t in times)
    cum1 = cum0 = 0
    s1q = s0q = gq = 0
    slnq_c = 0
    eventq = 0
    wmax = 0.0
    m1 = m0 = o_h = 0
    # first pass for the tau-scalars needs the same order as the fold:
    # everything is per-time, so one ascending sweep does both.
    # Mirror the SQL exactly: failure terms use the EXCLUSIVE censoring
    # sum at t; the scalar KMs sum INCLUSIVE lnq over t <= tau.
    # The failure term multiplies exp(s1q_tau) — the SQL's scalars are
    # computed over the WHOLE relation first, so replay in two passes.
    rows = []
    r1, r0 = tot1, tot0
    for t in times:
        d1, c1 = d.get((t, 1), 0), c.get((t, 1), 0)
        d0, c0 = d.get((t, 0), 0), c.get((t, 0), 0)
        rows.append((t, d1, c1, d0, c0, r1, r0))
        if t <= TAU:
            if 0 < d1 < r1:
                s1q += rhu(math.log(1.0 - float(d1) / r1) * 1e9)
            if 0 < d0 < r0:
                s0q += rhu(math.log(1.0 - float(d0) / r0) * 1e9)
            ct = c1 + c0
            if 0 < ct < r1 + r0:
                gq += rhu(math.log(1.0 - float(ct) / (r1 + r0)) * 1e9)
            o_h += d1 + d0
        else:
            m1 += d1 + c1
            m0 += d0 + c0
        r1 -= d1 + c1
        r0 -= d0 + c0
    s1 = math.exp(s1q / 1e9)
    s0 = math.exp(s0q / 1e9)
    g_tau = math.exp(gq / 1e9)
    for t, d1, c1, d0, c0, r1, r0 in rows:
        dd = d1 + d0
        if dd > 0 and t <= TAU:
            w = math.exp((slnq_c / 1e9) * (0.0 - 1.0))
            wmax = max(wmax, w)
            eventq += rhu(
                1e9
                * (
                    w
                    * (float(d1) * s1 * s1 + float(d0) * s0 * s0)
                    / n
                )
            )
        ct = c1 + c0
        if 0 < ct < r1 + r0:
            slnq_c += rhu(math.log(1.0 - float(ct) / (r1 + r0)) * 1e9)
    brier = (
        eventq / 1e9
        + (float(m1) * (1.0 - s1) * (1.0 - s1)
           + float(m0) * (1.0 - s0) * (1.0 - s0))
        / (g_tau * n)
    )
    return (
        o_h,
        round(s1, 6),
        round(s0, 6),
        round(g_tau, 6),
        round(wmax, 6),
        round(brier, 6),
    )


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_736_000
    n -= n % 7200
    from datafusion_gpu_spark.context import get_spark
    from datafusion_gpu_spark.queries.pipeline_diag import _BRIER_IPCW_SPARK

    spark = get_spark("brier-probe")
    spark.sparkContext.setLogLevel("ERROR")

    subj = spark.range(n).selectExpr(
        "CAST((id DIV 720) % 2 AS BIGINT) AS grp",
        "CASE WHEN (id DIV 720) % 2 = 1 THEN (id % 720) DIV 2 "
        "ELSE id % 720 END AS t",
        "CASE WHEN (id DIV 1440) % 5 = 0 THEN 0 ELSE 1 END AS obs",
    )
    subj.createOrReplaceTempView("__brier_subjects")

    marker = "per_t AS ("
    head, sep, tail = _BRIER_IPCW_SPARK.partition(marker)
    assert sep, "_BRIER_IPCW per_t boundary drifted; fix the marker"
    probe_sql = (
        "WITH subj AS (SELECT CAST(grp AS BIGINT) AS grp, "
        "CAST(t AS BIGINT) AS t, CAST(obs AS INT) AS obs "
        "FROM __brier_subjects),\n" + marker + tail
    )
    t0 = time.time()
    [row] = spark.sql(probe_sql).collect()
    dt = time.time() - t0
    spark.catalog.dropTempView("__brier_subjects")

    o_h, s1, s0, g_tau, wmax, brier = replay(n)
    assert row.n_subjects == n
    assert row.n_events_h == o_h, (row.n_events_h, o_h)
    assert row.s1_tau == s1, (row.s1_tau, s1)
    assert row.s0_tau == s0, (row.s0_tau, s0)
    assert row.g_tau == g_tau, (row.g_tau, g_tau)
    assert row.w_max == wmax, (row.w_max, wmax)
    assert row.brier_ipcw == brier, (row.brier_ipcw, brier)
    print(
        f"brier_probe: {n:,} subjects, three ln-quantized KM systems on "
        f"the 720-row relation — s1/s0/G(tau)/w_max/brier all EXACT vs "
        f"the quantized closed-form replay (BS = {brier}), in {dt:.1f} s"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
