"""Scale probe: the rolling-origin forecast backtest at 10M rows.

events_forecast_backtest's scale claim is that the whole gate is two
keyed window shuffles carrying fixed-width (2*59+8 term) codegen folds
plus a groupBy(user, fold) scoring tail — embarrassingly parallel
across keys, with the winner decided by exact integer comparisons.
This probe plants K users x T hourly purchases of a pure hour-of-day
pattern (zero noise) with spark.range — no driver-side data — and
asserts the CLOSED FORM at scale: additive Holt-Winters forecasts a
pure seasonal series exactly once the seasonal index converges, so
EVERY user's rmse_hw is 0.0 exactly and every winner is 'hw'. Any
float leakage, fold misassignment or key mixing anywhere in the 10M-row
pipeline breaks exact zero for some user. (n_hours must be >= ~315 so
fold 1 starts past the FULL warm-up: the first day's deseasonalization
residue decays through the 39-lag S'' kernel and only sub-rounds to
zero once fold 1's first row is ~63 rows in — at n_hours = 200 the
probe correctly reports nonzero warm-up RMSE, which is the estimator
being honest, not a bug.)

Usage: python tools/backtest_probe.py [n_users] [n_hours]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    n_users = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000
    n_hours = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000
    from pyspark.sql import functions as F

    from datafusion_gpu_spark.context import get_spark
    from datafusion_gpu_spark.queries.pipeline_forecast import _backtest_sql

    spark = get_spark("backtest-probe")
    spark.sparkContext.setLogLevel("ERROR")

    n = n_users * n_hours
    h = (F.col("id") / n_users).cast("long")  # hour index 0..n_hours-1
    # value = 50 + 15 * ((hour-of-day) % 8): the planted pattern of the
    # unit test, at scale; epoch 2024-01-01 00:00 UTC = 1704067200
    slot = (h % 24) % 8
    ev = spark.range(n).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(F.lit(1704067200) + h * 3600).alias("ts"),
        (F.col("id") % n_users).alias("user_id"),
        F.lit("purchase").alias("event_type"),
        (F.lit(50.0) + F.lit(15.0) * slot).alias("value"),
        F.lit("").alias("props"),
    )
    ev.createOrReplaceTempView("events")

    t0 = time.time()
    agg = (
        spark.sql(_backtest_sql())
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum((F.col("winner") == "hw").cast("long")).alias("hw_wins"),
            F.sum((F.col("rmse_hw") == 0.0).cast("long")).alias("exact_zero"),
            F.sum("n_scored").alias("n_scored"),
        )
        .collect()[0]
    )
    dt = time.time() - t0
    assert agg.n_users == n_users, agg
    assert agg.hw_wins == n_users, agg
    assert agg.exact_zero == n_users, agg
    print(
        f"OK: {n} planted rows -> {agg.n_users} users, winner 'hw' and "
        f"rmse_hw == 0.0 EXACT for all, {agg.n_scored} scored one-step "
        f"forecasts, in {dt:.1f}s"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
