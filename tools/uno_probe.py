"""Scale probe: events_uno_c's IPCW-weighted pair counting at ~20M
subjects with planted interleaved censoring.

The operator's scale claim: the censoring-KM weights and the weighted
pair counts all fold on the DISTINCT-DURATION relation (720 rows),
with the ln-quantized cumulative sums and the n^2-normalized
1e-9-quantized weighted terms making every fold order-independent and
engine-portable. The probe plants subjects via spark.range arithmetic:
cohort 0's event times uniform on 0..719, cohort 1's on 0..359
(compressed -> fails earlier -> C above 0.5), and every 5th subject
CENSORED at its time instead of observed — censorings interleave with
events at every duration, so G drops continuously and the weights
genuinely grow. It splices the REGISTRY SQL's counting tail verbatim
(marker-replace at the per_t boundary) over the planted subjects and
asserts n/o_h/w_max/c_uno EXACTLY equal a pure-Python replay of the
quantized spelling over the 720 closed-form cells.

Usage: python tools/uno_probe.py [n_subjects]  (default 20_736_000,
  rounded down to a multiple of 7200 so cells are closed-form)
"""

from __future__ import annotations

import math
import sys
import time
from decimal import ROUND_HALF_UP, Decimal

sys.path.insert(0, ".")

TAU = 120


def rhu(x: float) -> int:
    return int(Decimal(x).quantize(Decimal(1), rounding=ROUND_HALF_UP))


def replay(n: int):
    """Quantized replay over the planted cells: per (t, grp), 4/5
    observed and 1/5 censored."""
    base = n // 7200  # subjects per (residue, grp, stripe)
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
    slnq = 0
    numq = denq = 0
    o_h = 0
    wmax = 0.0
    nn2 = float(n) * n
    for t in times:
        d1, c1 = d.get((t, 1), 0), c.get((t, 1), 0)
        d0, c0 = d.get((t, 0), 0), c.get((t, 0), 0)
        later1 = tot1 - cum1 - d1 - c1
        later0 = tot0 - cum0 - d0 - c0
        n_risk = (tot1 - cum1) + (tot0 - cum0)
        dd = d1 + d0
        if dd > 0 and t < TAU:
            w = math.exp((slnq / 1e9) * (0.0 - 2.0))
            wmax = max(wmax, w)
            numq += rhu(
                1e9
                * (
                    w
                    * (
                        float(d1 * later0)
                        + float(d1 * later1 + d0 * later0) / 2.0
                    )
                    / nn2
                )
            )
            denq += rhu(1e9 * (w * float(dd * (later1 + later0)) / nn2))
            o_h += dd
        ct = c1 + c0
        if 0 < ct < n_risk:
            slnq += rhu(math.log(1.0 - float(ct) / n_risk) * 1e9)
        cum1 += d1 + c1
        cum0 += d0 + c0
    return o_h, round(wmax, 6), round(numq / denq, 6)


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_736_000
    n -= n % 7200
    from datafusion_gpu_spark.context import get_spark
    from datafusion_gpu_spark.queries.pipeline_diag import _UNO_C_SPARK

    spark = get_spark("uno-probe")
    spark.sparkContext.setLogLevel("ERROR")

    subj = spark.range(n).selectExpr(
        "CAST((id DIV 720) % 2 AS BIGINT) AS grp",
        "CASE WHEN (id DIV 720) % 2 = 1 THEN (id % 720) DIV 2 "
        "ELSE id % 720 END AS t",
        "CASE WHEN (id DIV 1440) % 5 = 0 THEN 0 ELSE 1 END AS obs",
    )
    subj.createOrReplaceTempView("__uno_subjects")

    marker = "per_t AS ("
    head, sep, tail = _UNO_C_SPARK.partition(marker)
    assert sep, "_UNO_C per_t boundary drifted; fix the marker"
    probe_sql = (
        "WITH subj AS (SELECT CAST(grp AS BIGINT) AS grp, "
        "CAST(t AS BIGINT) AS t, CAST(obs AS INT) AS obs "
        "FROM __uno_subjects),\n" + marker + tail
    )
    t0 = time.time()
    [row] = spark.sql(probe_sql).collect()
    dt = time.time() - t0
    spark.catalog.dropTempView("__uno_subjects")

    o_h, wmax, c_uno = replay(n)
    assert row.n_subjects == n
    assert row.n_events_h == o_h, (row.n_events_h, o_h)
    assert row.w_max == wmax, (row.w_max, wmax)
    assert row.c_uno == c_uno, (row.c_uno, c_uno)
    assert c_uno > 0.5  # compressed cohort fails earlier by design
    print(
        f"uno_probe: {n:,} subjects, 1-in-5 censoring interleaved at "
        f"every duration — IPCW weights (w_max = {wmax}) and the "
        f"weighted pair ratio EXACT vs the quantized closed-form replay "
        f"(C_uno = {c_uno}), in {dt:.1f} s"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
