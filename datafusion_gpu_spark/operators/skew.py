"""Skew mitigation utilities.

Two mechanisms, matching the brief's scale checklist:

- **AQE skew handling** is on by default for joins
  (spark.sql.adaptive.enabled in context.get_spark — runtime splitting
  of oversized shuffle partitions).
- **Manual salting** below, for aggregations whose key distribution is
  known-hot (e.g. language or event-type columns where one value is 90%
  of the corpus): stage 1 aggregates on (key, salt) so the hot key's
  rows spread over ``buckets`` reducers, stage 2 combines the per-salt
  partials. Both stages are plain hash aggregates with map-side combine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    salt_from: str | Column,
    buckets: int = 32,
) -> DataFrame:
    """SUM(value) GROUP BY group_cols, executed skew-safely.

    ``salt_from`` must be a column (e.g. a row id) whose hash spreads a
    hot key's rows uniformly; the result is identical to the unsalted
    aggregate (addition reassociates), so the correctness oracle is the
    plain GROUP BY.
    """
    salt_col = F.pmod(
        F.xxhash64(F.col(salt_from) if isinstance(salt_from, str) else salt_from),
        F.lit(buckets),
    )
    partial = (
        df.withColumn("__salt", salt_col)
        .groupBy(*group_cols, "__salt")
        .agg(
            F.sum(value_col).alias("__psum"),
            F.count(F.lit(1)).alias("__pcnt"),
        )
    )
    return partial.groupBy(*group_cols).agg(
        F.sum("__psum").alias(f"sum_{value_col}"),
        F.sum("__pcnt").alias("n_rows"),
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_from: str | Column,
    buckets: int = 16,
) -> DataFrame:
    """Inner equi-join on ``key``, executed skew-safely: the build side
    is EXPLODED ``buckets`` ways and each probe row routes to exactly
    one replica by a uniform hash of ``salt_from``, so a hot key's probe
    rows spread across ``buckets`` reducer tasks instead of one
    straggler. Each fact row meets each matching dim row exactly once
    (its replica), so the result is IDENTICAL to the plain inner join —
    the correctness oracle is the unsalted join.

    Placement in the skew toolbox: broadcast beats salting whenever the
    build side fits in executor memory (no shuffle at all); AQE's
    skew-split handles moderate sort-merge skew at runtime; salting is
    for the residual case — a large-large join with a key hot enough
    that one task would hold a partition-sized probe side. The price is
    a ``buckets``-fold replication of the BUILD side's shuffle volume,
    so size ``buckets`` to the measured hot-key multiplicity, not to
    the cluster width.
    """
    salt = F.pmod(
        F.xxhash64(F.col(salt_from) if isinstance(salt_from, str) else salt_from),
        F.lit(buckets),
    ).cast("int")
    dim_rep = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    return (
        fact.withColumn("__salt", salt)
        .join(dim_rep, [key, "__salt"])
        .drop("__salt")
    )
