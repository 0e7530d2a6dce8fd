"""Funnel and cohort-retention analytics (operators/events.py).

Planted scenarios pin the strict-ordering semantics (a stage counts only
when it happens strictly AFTER the previous conversion) and the cohort
triangle's invariants; the sf-data oracle equality lives in the gate
(events_funnel / events_retention in queries/pipeline.py).
"""

from __future__ import annotations

from datetime import datetime

from datafusion_gpu_spark.operators.events import cohort_retention, funnel_counts


def _ev(uid, t, typ):
    return (uid, datetime(2024, 1, 1 + t // 24, t % 24), typ)


def _funnel_df(spark, rows):
    return spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")


def test_funnel_strict_ordering(spark):
    rows = [
        # u1 converts fully in order
        _ev(1, 0, "view"), _ev(1, 1, "click"), _ev(1, 2, "purchase"),
        # u2 clicked BEFORE viewing -> counts for view only
        _ev(2, 1, "click"), _ev(2, 2, "view"),
        # u3 views and clicks, purchase precedes the click -> stops at click
        _ev(3, 0, "view"), _ev(3, 1, "purchase"), _ev(3, 2, "click"),
        # u4 never views -> counts nowhere
        _ev(4, 0, "click"), _ev(4, 1, "purchase"),
        # u5 re-clicks after an early click; the late click still converts
        _ev(5, 2, "view"), _ev(5, 0, "click"), _ev(5, 3, "click"),
        _ev(5, 4, "purchase"),
    ]
    out = funnel_counts(
        _funnel_df(spark, rows), steps=["view", "click", "purchase"]
    ).collect()
    by_stage = {r["stage"]: (r["step"], r["users"]) for r in out}
    assert by_stage == {"view": (1, 4), "click": (2, 3), "purchase": (3, 2)}


def test_funnel_plan_single_shuffle_no_arrays(spark):
    # The stage chain must reuse ONE hash exchange on user_id (every
    # Window node shares the partitioning) and keep scalar aggregation
    # state — no collect_list buffers that grow with a hot user's
    # event count.
    df = funnel_counts(
        _funnel_df(spark, [_ev(1, 0, "view"), _ev(1, 1, "click")]),
        steps=["view", "click", "purchase"],
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "collect_list" not in plan


def test_funnel_tie_timestamps_do_not_convert(spark):
    # click at the SAME instant as the first view is not strictly after
    rows = [_ev(1, 0, "view"), _ev(1, 0, "click")]
    out = funnel_counts(_funnel_df(spark, rows), steps=["view", "click"]).collect()
    assert {r["stage"]: r["users"] for r in out} == {"view": 1, "click": 0}


def test_funnel_counts_monotone_nonincreasing(spark):
    from datafusion_gpu_spark.context import register_tables
    from tests.conftest import SF_DIR

    register_tables(spark, SF_DIR)
    out = funnel_counts(
        spark.table("events"), steps=["view", "click", "purchase", "error"]
    ).orderBy("step").collect()
    users = [r["users"] for r in out]
    assert users == sorted(users, reverse=True)
    assert len(out) == 4 and out[0]["users"] > 0


def test_retention_triangle_planted(spark):
    rows = [
        # u1 first seen Jan 1, returns Jan 2 and Jan 4 (two events Jan 2
        # must count once)
        _ev(1, 0, "view"), _ev(1, 25, "click"), _ev(1, 26, "view"),
        _ev(1, 3 * 24, "view"),
        # u2 first seen Jan 2 only
        _ev(2, 25, "view"),
    ]
    out = cohort_retention(_funnel_df(spark, rows)).collect()
    got = {(str(r["cohort_day"]), r["day_offset"]): r["users"] for r in out}
    assert got == {
        ("2024-01-01", 0): 1,
        ("2024-01-01", 1): 1,
        ("2024-01-01", 3): 1,
        ("2024-01-02", 0): 1,
    }


def test_retention_offset_zero_counts_every_user(spark):
    from datafusion_gpu_spark.context import register_tables
    from tests.conftest import SF_DIR

    register_tables(spark, SF_DIR)
    ev = spark.table("events")
    out = cohort_retention(ev)
    day0 = out.where("day_offset = 0").agg({"users": "sum"}).collect()[0][0]
    n_users = ev.select("user_id").distinct().count()
    assert day0 == n_users
    assert out.where("day_offset < 0").count() == 0


def _funnel_reference(rows, steps):
    """Pure-Python fold: per user, greedily advance through the stages,
    each conversion strictly after the previous one."""
    from collections import defaultdict

    by_user = defaultdict(list)
    for uid, ts, typ in rows:
        by_user[uid].append((ts, typ))
    counts = [0] * len(steps)
    for evs in by_user.values():
        evs.sort()
        t_prev = None
        for i, stage in enumerate(steps):
            nxt = min(
                (ts for ts, typ in evs
                 if typ == stage and (t_prev is None or ts > t_prev)),
                default=None,
            )
            if nxt is None:
                break
            t_prev = nxt
            counts[i] += 1
    return {s: c for s, c in zip(steps, counts)}


def test_funnel_matches_python_reference_fold(spark):
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    steps = ["a", "b", "c"]

    @settings(max_examples=5, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(
        rows=st.lists(
            st.tuples(
                st.integers(min_value=1, max_value=4),       # user
                st.integers(min_value=0, max_value=12),      # hour
                st.sampled_from(["a", "b", "c", "x"]),       # type
            ),
            min_size=1, max_size=40,
        )
    )
    def check(rows):
        data = [_ev(u, t, typ) for u, t, typ in rows]
        got = {
            r["stage"]: r["users"]
            for r in funnel_counts(_funnel_df(spark, data), steps=steps).collect()
        }
        assert got == _funnel_reference(
            [(u, datetime(2024, 1, 1 + t // 24, t % 24), typ) for u, t, typ in rows],
            steps,
        )

    check()


def test_streaming_funnel_equals_batch(spark):
    # the per-user automaton's final states must collapse to exactly the
    # batch funnel relation on the replayed events table
    from tests.conftest import SF_DIR

    from datafusion_gpu_spark.context import register_tables
    from datafusion_gpu_spark.streaming import materialized_streaming_funnel

    register_tables(spark, SF_DIR)
    got = {
        (r["step"], r["stage"]): r["users"]
        for r in materialized_streaming_funnel(spark, SF_DIR).collect()
    }
    want = {
        (r["step"], r["stage"]): r["users"]
        for r in funnel_counts(
            spark.table("events"), steps=["view", "click", "purchase"]
        ).collect()
    }
    assert got == want and len(got) == 3


def test_mad_anomalies_planted_outlier(spark):
    from datetime import datetime

    from datafusion_gpu_spark.operators.events import mad_anomalies

    rows = [
        (i, datetime(2024, 1, 1, i % 24), 1, "click",
         1000.0 if i == 9 else float(10 + (i % 5)))
        for i in range(10)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double"
    )
    out = {r["event_id"]: r for r in mad_anomalies(df, k=3.0).collect()}
    # values 10..14 + one 1000 bot value: only the bot row flags
    assert out[9]["is_outlier"] is True
    assert all(out[i]["is_outlier"] is False for i in range(9))
    # med/mad are robust: the outlier barely moves them
    assert 10 <= out[0]["med"] <= 14
    assert out[0]["mad"] <= 2


def test_mad_anomalies_zero_mad_never_flags(spark):
    from datetime import datetime

    from datafusion_gpu_spark.operators.events import mad_anomalies

    rows = [(i, datetime(2024, 1, 1), 1, "view", 5.0) for i in range(4)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double"
    )
    out = mad_anomalies(df).collect()
    assert all(r["is_outlier"] is False for r in out)


def test_value_histogram_buckets_and_negatives(spark):
    from datetime import datetime

    from datafusion_gpu_spark.operators.events import value_histogram

    rows = [
        (1, datetime(2024, 1, 1), 1, "click", -0.5),   # floor(-0.1) = -1
        (2, datetime(2024, 1, 1), 1, "click", 0.0),    # bucket 0
        (3, datetime(2024, 1, 1), 1, "click", 4.99),   # bucket 0
        (4, datetime(2024, 1, 1), 1, "click", 5.0),    # bucket 1
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double"
    )
    out = {r["bucket"]: r["n"] for r in value_histogram(df, width=5.0).collect()}
    assert out == {-1: 1, 0: 2, 1: 1}


def test_match_recognize_nonoverlapping_counts(spark):
    # the gate query's symbol-encode -> array_sort -> regexp_count
    # pipeline, on planted sequences (the gate fn re-registers the real
    # events table via load(), so the shape is exercised inline here):
    # user 1: v v p v p  -> 'v+p' matches twice (greedy, non-overlapping)
    # user 2: p v c v    -> zero (no view immediately before a purchase)
    from pyspark.sql import functions as F

    rows = [
        (1, "2024-01-01 00:00:01", 1, "view"),
        (2, "2024-01-01 00:00:02", 1, "view"),
        (3, "2024-01-01 00:00:03", 1, "purchase"),
        (4, "2024-01-01 00:00:04", 1, "view"),
        (5, "2024-01-01 00:00:05", 1, "purchase"),
        (6, "2024-01-01 00:00:01", 2, "purchase"),
        (7, "2024-01-01 00:00:02", 2, "view"),
        (8, "2024-01-01 00:00:03", 2, "click"),
        (9, "2024-01-01 00:00:04", 2, "view"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts_s string, user_id long, event_type string"
    ).select(
        "event_id", F.col("ts_s").cast("timestamp").alias("ts"),
        "user_id", "event_type",
    )
    sym = (
        F.when(F.col("event_type") == "view", "v")
        .when(F.col("event_type") == "purchase", "p")
        .when(F.col("event_type") == "click", "c")
        .when(F.col("event_type") == "signup", "s")
        .otherwise("e")
    )
    seq = ev.select("user_id", "ts", "event_id", sym.alias("sym"))
    arr = F.array_sort(
        F.collect_list(F.struct(F.col("ts"), F.col("event_id"), F.col("sym")))
    )
    per_user = seq.groupBy("user_id").agg(
        F.array_join(F.transform(arr, lambda x: x["sym"]), "").alias("seq")
    )
    out = per_user.select(
        "user_id",
        F.regexp_count(F.col("seq"), F.lit("v+p")).cast("int").alias("n_matches"),
        F.length("seq").alias("n_events"),
    )
    got = {r.user_id: (r.n_matches, r.n_events) for r in out.collect()}
    assert got[1] == (2, 5)
    assert got[2] == (0, 4)
