"""Scale probe: events_harrell_c_cont's grid pair counting at ~20M
subjects across all 64 score levels.

The operator's scale claim is that exact pair counting for a
multi-level risk score runs on the dense (duration x score) grid —
720 x 64 = 46,080 cells here, LINEAR in distinct durations because
the score axis is a literal 64 — never on pairs. The probe plants
subjects via spark.range arithmetic (no driver-side data): score
level s = id % 64 + 1, duration = a uniform 720-hour residue
COMPRESSED (halved) for the upper half of the score range (so high
scorers fail earlier -> C must exceed 0.5 decisively), and a
deterministic 1-in-5 censoring stripe cycling across blocks so every
(s, duration, obs) cell count is closed-form. It splices the
REGISTRY SQL's counting tail verbatim (marker-replace at the `cell
AS (` boundary, the harrell_probe technique) over the planted
subjects and asserts conc/disc/tied/c_index EXACTLY equal a
pure-Python grid replay over the 46,080 closed-form cells.

Usage: python tools/harrell_cont_probe.py [n_subjects]
  (default 20_736_000 — a multiple of 230,400 = 64*720*5 so every
  planted cell count is exact)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

LEVELS = 64
RES = 720
BLOCK = LEVELS * RES  # 46,080
STRIPE = 5


def replay(n: int):
    """Pure-Python grid replay over the planted (t, s) cells."""
    per_cell = n // (BLOCK * STRIPE)  # subjects per (s, residue, stripe)
    d: dict[tuple[int, int], int] = {}
    c: dict[tuple[int, int], int] = {}
    for s0 in range(LEVELS):
        s = s0 + 1
        for r in range(RES):
            t = r if s <= 32 else r // 2
            d[(t, s)] = d.get((t, s), 0) + 4 * per_cell
            c[(t, s)] = c.get((t, s), 0) + 1 * per_cell
    all_t = sorted({t for (t, _s) in d})
    tot = {s: 0 for s in range(1, LEVELS + 1)}
    for (t, s), v in d.items():
        tot[s] += v + c[(t, s)]
    cum = {s: 0 for s in range(1, LEVELS + 1)}
    conc = disc = tied = 0
    for t in all_t:
        later = {}
        cc = {}
        for s in range(1, LEVELS + 1):
            here = d.get((t, s), 0) + c.get((t, s), 0)
            later[s] = tot[s] - cum[s] - here
            cc[s] = c.get((t, s), 0)
        # prefix across the score axis at fixed t (the acc CTE)
        run = 0
        lower = {}
        for s in range(1, LEVELS + 1):
            lower[s] = run
            run += later[s] + cc[s]
        run = 0
        higher = {}
        for s in range(LEVELS, 0, -1):
            higher[s] = run
            run += later[s] + cc[s]
        for s in range(1, LEVELS + 1):
            dd = d.get((t, s), 0)
            conc += dd * lower[s]
            disc += dd * higher[s]
            tied += dd * (later[s] + cc[s])
            cum[s] += dd + cc[s]
    cidx = round((conc + tied / 2.0) / (conc + disc + tied), 6)
    return conc, disc, tied, cidx


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_736_000
    n -= n % (BLOCK * STRIPE)
    from datafusion_gpu_spark.context import get_spark
    from datafusion_gpu_spark.queries.pipeline_diag import (
        _HARRELL_C_CONT_SPARK,
    )

    spark = get_spark("harrell-cont-probe")
    spark.sparkContext.setLogLevel("ERROR")

    subj = spark.range(n).selectExpr(
        "CAST(id % 64 + 1 AS BIGINT) AS s",
        "CASE WHEN id % 64 + 1 <= 32 THEN (id DIV 64) % 720 "
        "ELSE ((id DIV 64) % 720) DIV 2 END AS t",
        "CASE WHEN (id DIV 46080) % 5 = 0 THEN 0 ELSE 1 END AS obs",
    )
    subj.createOrReplaceTempView("__hcc_subjects")

    marker = "cell AS ("
    head, sep, tail = _HARRELL_C_CONT_SPARK.partition(marker)
    assert sep, "_HARRELL_C_CONT cell boundary drifted; fix the marker"
    probe_sql = (
        "WITH subj AS (SELECT CAST(s AS BIGINT) AS s, "
        "CAST(t AS BIGINT) AS t, CAST(obs AS INT) AS obs "
        "FROM __hcc_subjects),\n" + marker + tail
    )
    t0 = time.time()
    [row] = spark.sql(probe_sql).collect()
    dt = time.time() - t0
    spark.catalog.dropTempView("__hcc_subjects")

    conc, disc, tied, cidx = replay(n)
    assert row.n_subjects == n and row.max_level == LEVELS
    assert row.concordant == conc, (row.concordant, conc)
    assert row.discordant == disc, (row.discordant, disc)
    assert row.tied_score == tied, (row.tied_score, tied)
    assert row.c_index == cidx, (row.c_index, cidx)
    assert cidx > 0.5  # compressed high scorers fail earlier by design
    print(
        f"harrell_cont_probe: {n:,} subjects x 64 score levels, "
        f"{conc + disc + tied:,} comparable pairs counted on the "
        f"46,080-cell grid WITHOUT materialization — conc/disc/tied/C "
        f"exact vs the closed-form grid replay (C = {cidx}), in {dt:.1f} s"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
