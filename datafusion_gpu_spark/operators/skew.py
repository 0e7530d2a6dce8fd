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
