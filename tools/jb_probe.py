"""Scale probe: agg_jarque_bera exactness at hundreds of millions of rows.

The operator's scale claim is that the whole statistic rides on four
exact bigint raw power sums from ONE groupBy pass, so the terminal
skewness/kurtosis/JB expression is bit-determined by (n, S1..S4) no
matter how many rows produced them. The probe plants a 10-point dollar
distribution via spark.range arithmetic (value = PLANT[id % 10], N a
multiple of 10, so every count is exactly N/10 — no randomness, no
driver-side data), runs the REGISTRY SQL verbatim over the planted
events view, and asserts the emitted skewness/kurtosis/JB equal a
pure-Python replay of the identical terminal expression on the
closed-form integer power sums.

The documented headroom boundary is ALSO asserted: at the default max
value ($490) the visible n*mx^4 guard must fire (NULL outputs, no
silent wrap) once n*490^4 crosses 9e18 — i.e. between the probe's
150M-row exact run and a 200M-row guarded run.

Usage: python tools/jb_probe.py [n_rows]   (default 150_000_000 exact
  + 200_000_000 guard-fire check)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

#: planted dollar values (deliberately skewed, all integers so the
#: ROUND(value, 0) quantization is the identity)
PLANT = [1, 1, 1, 2, 3, 5, 8, 13, 55, 490]


def replay(n: int) -> tuple[float, float, float]:
    c = n // len(PLANT)
    s1 = sum(PLANT) * c
    s2 = sum(v * v for v in PLANT) * c
    s3 = sum(v**3 for v in PLANT) * c
    s4 = sum(v**4 for v in PLANT) * c
    mu = s1 / n
    m2 = s2 / n - mu * mu
    m3 = s3 / n - 3.0 * mu * (s2 / n) + 2.0 * mu * mu * mu
    m4 = s4 / n - 4.0 * mu * (s3 / n) + 6.0 * mu * mu * (s2 / n) \
        - 3.0 * mu * mu * mu * mu
    g1 = m3 / (m2 * (m2**0.5))
    g2 = m4 / (m2 * m2) - 3.0
    jb = n * (g1 * g1 / 6.0 + g2 * g2 / 24.0)
    return round(g1, 6), round(g2, 6), round(jb, 6)


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 150_000_000
    assert n % len(PLANT) == 0
    from pyspark.sql import functions as F

    from datafusion_gpu_spark.context import get_spark
    from datafusion_gpu_spark.queries.pipeline_diag import _JARQUE_BERA

    spark = get_spark("jb-probe")
    spark.sparkContext.setLogLevel("ERROR")

    plant = ",".join(str(v) for v in PLANT)
    ev = spark.range(n).select(
        F.lit("click").alias("event_type"),
        F.expr(f"CAST(element_at(array({plant}), "
               f"CAST(id % 10 AS INT) + 1) AS DOUBLE)").alias("value"),
    )
    ev.createOrReplaceTempView("events")
    t0 = time.time()
    [row] = spark.sql(_JARQUE_BERA).collect()
    dt = time.time() - t0
    spark.catalog.dropTempView("events")

    g1, g2, jb = replay(n)
    assert row.n == n
    assert row.skewness == g1, (row.skewness, g1)
    assert row.excess_kurtosis == g2, (row.excess_kurtosis, g2)
    assert row.jb == jb, (row.jb, jb)
    assert row.reject_normal_05 is True
    print(
        f"jb_probe: {n:,} rows — skewness/kurtosis/JB EXACT vs the "
        f"closed-form integer-moment replay (skew {g1}, exkurt {g2}, "
        f"JB {jb:.0f}), one groupBy pass in {dt:.1f} s"
    )

    # guard-fire check: past n*mx^4 >= 9e18 the outputs must go NULL
    # (the VISIBLE headroom contract), never silently wrap
    n2 = 200_000_000
    ev2 = spark.range(n2).select(
        F.lit("click").alias("event_type"),
        F.expr(f"CAST(element_at(array({plant}), "
               f"CAST(id % 10 AS INT) + 1) AS DOUBLE)").alias("value"),
    )
    ev2.createOrReplaceTempView("events")
    [row2] = spark.sql(_JARQUE_BERA).collect()
    spark.catalog.dropTempView("events")
    assert n2 * 490**4 >= 9e18 > n * 490**4
    assert row2.n == n2
    assert row2.skewness is None and row2.jb is None
    print(
        f"jb_probe: {n2:,} rows — the n*mx^4 guard FIRES (NULL outputs) "
        f"exactly past the documented 9e18 boundary"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
