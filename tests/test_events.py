"""Event-stream change-point detection (events.cusum_alarms)."""

from __future__ import annotations

from pyspark.sql import functions as F

def test_cusum_alarms_planted_drift_and_closed_form(spark):
    from datafusion_gpu_spark.operators.events import cusum_alarms

    # user "drift": 30 stable values ~10.00 then 20 at 13.00 (a 3-unit
    # upward shift); user "flat": stable throughout. CUSUM must alarm
    # on drift (after the shift), never on flat.
    rows = []
    for i in range(30):
        rows.append(("drift", i, f"2024-01-01 00:{i:02d}:00", 10.0 + (i % 3) * 0.01))
    for i in range(30, 50):
        rows.append(("drift", i, f"2024-01-01 00:{i:02d}:00", 13.0 + (i % 3) * 0.01))
    for i in range(50):
        rows.append(("flat", 100 + i, f"2024-01-01 00:{i % 60:02d}:{i // 60:02d}", 10.0 + (i % 3) * 0.01))
    df = spark.createDataFrame(
        rows, "user_id string, event_id long, ts_s string, value double"
    ).select("user_id", "event_id",
             F.col("ts_s").cast("timestamp").alias("ts"), "value")
    got = {r.user_id: r for r in cusum_alarms(df).collect()}
    assert got["drift"].n_alarms > 0
    assert got["flat"].n_alarms == 0
    assert got["drift"].first_alarm_id >= 30  # alarms only after the shift

    # closed form == the naive sequential recursion, replayed in python
    import statistics as st

    drift_vals = [int(round(v * 100)) for (_, _, _, v) in rows[:50]]
    mu = round(sum(drift_vals) / len(drift_vals))
    sd = st.pstdev(drift_vals)
    k, h = round(0.5 * sd), round(4.0 * sd)
    s_stat, peak, alarms, first = 0, 0, 0, None
    for eid, x in enumerate(drift_vals):
        s_stat = max(0, s_stat + x - mu - k)
        peak = max(peak, s_stat)
        if h > 0 and s_stat > h:
            alarms += 1
            first = eid if first is None else first
    assert got["drift"].n_alarms == alarms
    assert got["drift"].peak_cusum == peak
    assert got["drift"].first_alarm_id == first


def test_ewma_halflife_matches_sequential_reference(spark):
    """Engine result == a direct Python replay of the span-truncated
    halflife-1 definition, including exact bigint num/den."""
    from datafusion_gpu_spark.operators.events import ewma_halflife

    vals = [10.0, 11.5, 9.25, 14.0, 8.75, 13.33]
    rows = [(1, i, f"2024-01-01 00:{i:02d}:00", v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        r.event_id: (r.num, r.den, r.ewma)
        for r in ewma_halflife(df, span=4, scale=100).collect()
    }
    cents = [round(v * 100) for v in vals]
    for i in range(len(vals)):
        num = sum(
            cents[i - k] * (1 << (3 - k)) for k in range(4) if i - k >= 0
        )
        den = sum((1 << (3 - k)) for k in range(4) if i - k >= 0)
        assert got[i] == (num, den, round(num / den / 100.0, 6))


def test_ewma_halflife_does_not_leak_across_keys(spark):
    from datafusion_gpu_spark.operators.events import ewma_halflife

    rows = [
        (1, 0, "2024-01-01 00:00:00", 100.0),
        (2, 1, "2024-01-01 00:01:00", 900.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {r.user_id: r.ewma for r in ewma_halflife(df, span=8).collect()}
    # each key's single row is its own (exact) mean — no cross-key history
    assert got == {1: 100.0, 2: 900.0}


def test_merge_intervals_overlap_touch_disjoint(spark):
    from datafusion_gpu_spark.operators.events import merge_intervals

    rows = [
        # user 1: [0,10] overlaps [5,20]; [20,25] TOUCHES and merges;
        # [30,35] is disjoint -> island 2
        (1, 1, 0, 10), (1, 2, 5, 20), (1, 3, 20, 25), (1, 4, 30, 35),
        # user 2: containment — [0,100] swallows [10,20] and [90,95]
        (2, 5, 0, 100), (2, 6, 10, 20), (2, 7, 90, 95),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, s long, e long")
    got = {
        (r.user_id, r.island): (r.start, r["end"], r.n_intervals)
        for r in merge_intervals(df).collect()
    }
    assert got == {
        (1, 1): (0, 25, 3),
        (1, 2): (30, 35, 1),
        (2, 1): (0, 100, 3),
    }


def test_merge_intervals_out_of_order_input(spark):
    from datafusion_gpu_spark.operators.events import merge_intervals

    rows = [(1, 1, 50, 60), (1, 2, 0, 10), (1, 3, 8, 52)]  # bridge arrives last
    df = spark.createDataFrame(rows, "user_id long, event_id long, s long, e long")
    got = merge_intervals(df).collect()
    assert len(got) == 1 and (got[0].start, got[0]["end"]) == (0, 60)


def test_cusum_first_alarm_is_temporal_not_min_id(spark):
    """ids deliberately NOT time-ordered: the first alarm is the one at
    the earliest (ts, id), not the smallest id."""
    from datafusion_gpu_spark.operators.events import cusum_alarms

    # flat baseline then a hard drift: alarms fire on the late rows,
    # whose ids are assigned in REVERSE time order
    rows = []
    vals = [10.0] * 20 + [500.0] * 6
    for i, v in enumerate(vals):
        event_id = 1000 - i  # reverse order: later ts -> smaller id
        rows.append((1, event_id, f"2024-01-01 00:{i:02d}:00", v))
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = cusum_alarms(df).collect()[0]
    assert got.n_alarms > 0
    # engine-exact sequential replay in TIME order gives the ground
    # truth; with reversed ids the old min-id spelling would instead
    # return the LAST alarm's id (the smallest)
    import statistics as _st

    cents = [round(v * 100) for v in vals]
    mu = round(_st.fmean(cents))
    sd = _st.pstdev(cents)
    k, h = round(0.5 * sd), round(4 * sd)
    s, alarm_ids_time_order = 0, []
    for i, c in enumerate(cents):
        s = max(0, s + c - mu - k)
        if h > 0 and s > h:
            alarm_ids_time_order.append(1000 - i)
    assert got.first_alarm_id == alarm_ids_time_order[0]
    assert alarm_ids_time_order[0] != min(alarm_ids_time_order)
