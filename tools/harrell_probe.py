"""Scale probe: events_harrell_c's pair counting at ~20M subjects.

The operator's scale claim is that concordant/discordant/tied pair
counts come from suffix sums over the DISTINCT-DURATION relation (720
rows here), never from pair materialization — so at 20M subjects the
counting stage still folds exactly, with pair counts ~1e14 sitting
comfortably under the visible n^2 < 9e18 guard.

The probe plants subjects via spark.range arithmetic (no driver-side
data): grp = parity, durations on a 720-hour grid with cohort 1
COMPRESSED onto the lower half (so it fails earlier -> C must exceed
0.5 decisively), a deterministic 1-in-5 censoring stripe; every
(t, grp, obs) cell count is closed-form. It splices the REGISTRY
SQL's counting tail verbatim (marker-replace at the per_t boundary,
the streaming-twin technique) over the planted subjects and asserts
conc/disc/tied/c_index EXACTLY equal a pure-Python suffix-sum replay
over the 720-row closed-form cell table.

Usage: python tools/harrell_probe.py [n_subjects]  (default 20_160_000
  — a multiple of 7200 so every planted cell count is exact)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def replay(n: int):
    """Pure-Python suffix-sum pair counting over the planted cells."""
    base = n // 7200  # subjects per (t-residue, grp, stripe-of-5)
    # per (t, grp): d (events) and c (censored) counts
    d = {}
    c = {}
    for t in range(720):
        # grp 0: t as-is; one stripe of 5 censored
        d[(t, 0)] = d.get((t, 0), 0) + 4 * base
        c[(t, 0)] = c.get((t, 0), 0) + 1 * base
        # grp 1: residue t maps to t // 2 (two residues per duration)
        t1 = t // 2
        d[(t1, 1)] = d.get((t1, 1), 0) + 4 * base
        c[(t1, 1)] = c.get((t1, 1), 0) + 1 * base
    ts = sorted({t for (t, _) in list(d) + list(c)})
    tot1 = sum(d.get((t, 1), 0) + c.get((t, 1), 0) for t in ts)
    tot0 = sum(d.get((t, 0), 0) + c.get((t, 0), 0) for t in ts)
    cum1 = cum0 = 0
    conc = disc = tied = 0
    for t in ts:
        d1, c1 = d.get((t, 1), 0), c.get((t, 1), 0)
        d0, c0 = d.get((t, 0), 0), c.get((t, 0), 0)
        later1 = tot1 - cum1 - d1 - c1
        later0 = tot0 - cum0 - d0 - c0
        conc += d1 * (later0 + c0)
        disc += d0 * (later1 + c1)
        tied += d1 * (later1 + c1) + d0 * (later0 + c0)
        cum1 += d1 + c1
        cum0 += d0 + c0
    cidx = round((conc + tied / 2.0) / (conc + disc + tied), 6)
    return conc, disc, tied, cidx


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_160_000
    assert n % 7200 == 0
    from pyspark.sql import functions as F

    from datafusion_gpu_spark.context import get_spark
    from datafusion_gpu_spark.queries.pipeline_diag import _HARRELL_C_SPARK

    spark = get_spark("harrell-probe")
    spark.sparkContext.setLogLevel("ERROR")

    subj = spark.range(n).select(
        ((F.col("id") / 720).cast("long") % 2).alias("grp"),
        F.expr(
            "CASE WHEN (id DIV 720) % 2 = 1 THEN (id % 720) DIV 2 "
            "ELSE id % 720 END"
        ).alias("t"),
        F.expr(
            "CASE WHEN (id DIV 1440) % 5 = 0 THEN 0 ELSE 1 END"
        ).alias("obs"),
    )
    subj.createOrReplaceTempView("__hc_subjects")

    marker = "per_t AS ("
    head, sep, tail = _HARRELL_C_SPARK.partition(marker)
    assert sep, "_HARRELL_C per_t boundary drifted; fix the marker"
    probe_sql = (
        "WITH subj AS (SELECT CAST(grp AS BIGINT) AS grp, "
        "CAST(t AS BIGINT) AS t, CAST(obs AS INT) AS obs "
        "FROM __hc_subjects),\n" + marker + tail
    )
    t0 = time.time()
    [row] = spark.sql(probe_sql).collect()
    dt = time.time() - t0
    spark.catalog.dropTempView("__hc_subjects")

    conc, disc, tied, cidx = replay(n)
    assert row.n_subjects == n
    assert row.concordant == conc, (row.concordant, conc)
    assert row.discordant == disc, (row.discordant, disc)
    assert row.tied_score == tied, (row.tied_score, tied)
    assert row.c_index == cidx, (row.c_index, cidx)
    assert cidx > 0.5  # the compressed cohort fails earlier by design
    print(
        f"harrell_probe: {n:,} subjects, {conc + disc + tied:,} comparable "
        f"pairs counted WITHOUT materialization — conc/disc/tied/C exact "
        f"vs the closed-form suffix replay (C = {cidx}), in {dt:.1f} s"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
