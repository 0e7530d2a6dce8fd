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


def test_holt_linear_closed_forms(spark):
    """Constant series: level == the constant, trend == 0, forecast ==
    the constant (any smoothing of a constant is the constant). Linear
    ramp in steady state: level == the CURRENT true value exactly
    (2S' - S'' cancels the smoothing lag — the property that
    distinguishes Holt from plain EWMA, which lags every ramp), and
    trend == b * (sum k*w_k)/W — the truncated kernel's exact lag
    constant, which approaches the slope b as span grows (11/15 of b
    at span=4; 1 - ~1e-5 of b at the default span=20)."""
    from datafusion_gpu_spark.operators.events import holt_linear, holt_weights

    span = 4
    # constant series
    rows = [(1, i, f"2024-01-01 00:{i:02d}:00", 25.0) for i in range(10)]
    # ramp series on another key: value = 10 + 2*i dollars
    rows += [(2, 100 + i, f"2024-01-01 00:{i:02d}:00", 10.0 + 2.0 * i)
             for i in range(12)]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {r.event_id: r for r in holt_linear(df, span=span).collect()}
    for i in range(10):
        r = got[i]
        assert r.level == 25.0 and r.trend == 0.0
        assert r.forecast_next == 25.0
    w1, _ = holt_weights(span)
    lag_const = sum(k * w for k, w in enumerate(w1)) / sum(w1)  # 11/15
    # steady state starts once both kernels are full: i >= 2*(span-1)
    for i in range(6, 12):
        r = got[100 + i]
        assert abs(r.level - (10.0 + 2.0 * i)) < 1e-6, i
        assert abs(r.trend - 2.0 * lag_const) < 1e-6, i
        assert abs(r.forecast_next - (10.0 + 2.0 * i + 2.0 * lag_const)) < 1e-6, i


def test_holt_linear_matches_double_smoothing_replay(spark):
    """num2/den2 equal a direct double application of the truncated
    adjusted EWMA replayed in exact Python integers via the convolved
    kernel, and S'' == EWMA(EWMA) exactly once the window is full."""
    from fractions import Fraction

    from datafusion_gpu_spark.operators.events import holt_linear, holt_weights

    span = 3
    vals = [10.0, 11.5, 9.25, 14.0, 8.75, 13.33, 12.0, 9.9]
    rows = [(1, i, f"2024-01-01 00:{i:02d}:00", v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {r.event_id: r for r in holt_linear(df, span=span).collect()}
    cents = [round(v * 100) for v in vals]
    w1, w2 = holt_weights(span)
    for i in range(len(vals)):
        n1 = sum(cents[i - k] * w1[k] for k in range(span) if i - k >= 0)
        d1 = sum(w1[k] for k in range(span) if i - k >= 0)
        n2 = sum(cents[i - j] * w2[j] for j in range(2 * span - 1) if i - j >= 0)
        d2 = sum(w2[j] for j in range(2 * span - 1) if i - j >= 0)
        assert (got[i].num1, got[i].den1, got[i].num2, got[i].den2) == (
            n1, d1, n2, d2), i
    # steady state: S'' from the kernel == EWMA applied twice
    sp = [Fraction(sum(cents[i - k] * w1[k] for k in range(span)),
                   sum(w1)) for i in range(span - 1, len(vals))]
    i = len(vals) - 1  # last row has full double history
    spp = sum(Fraction(w1[k]) * sp[(i - (span - 1)) - k] for k in range(span)) / sum(w1)
    assert Fraction(got[i].num2, got[i].den2) == spp


def test_holt_winters_closed_forms(spark):
    """Planted level+ramp+sine series (the verdict's closed-form case):
    cents_i = 1000 + 255*i + round(500*sin(2*pi*h/24)) with one event per
    hour. Every hour-of-day subseries is a ramp of slope 24*255 cents
    plus its own constant sine offset, so the causal seasonal EWMA
    (lags 1..8, weights 2^(8-k)) lags it by EXACTLY
    24*255 * (sum k*w_k / sum w_k) = 24*255*502/255 = 12048 cents — an
    integer by construction, so the sq quantization is exact, the
    deseasonalized series is the CONSTANT 12048 from each slot's 9th
    occurrence, and once the Holt window holds only constants:
    level == 120.48, trend == 0, forecast_next == the current value
    exactly (the decomposition absorbs a per-period ramp into the slot
    baselines — the seasonal column carries ramp lag + sine)."""
    import math

    from datafusion_gpu_spark.operators.events import holt_winters_additive

    n = 288  # 12 full days, hourly
    rows = []
    for i in range(n):
        h = i % 24
        cents = 1000 + 255 * i + round(500.0 * math.sin(2.0 * math.pi * h / 24.0))
        day, hour = divmod(i, 24)
        rows.append(
            (1, i, f"2024-01-{day + 1:02d} {hour:02d}:00:00", cents / 100.0)
        )
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        r.event_id: r
        for r in holt_winters_additive(df, span=4, season_span=8).collect()
    }
    assert len(got) == n
    # slot h's 9th occurrence is event h + 24*8; the Holt window (2*4-1
    # lags) is all-constant 6 events later — steady state from i >= 198
    for i in range(198, n):
        r = got[i]
        cents = 1000 + 255 * i + round(
            500.0 * math.sin(2.0 * math.pi * (i % 24) / 24.0)
        )
        assert r.slot == i % 24
        assert r.sq == cents - 12048, i
        assert r.level == 120.48, i
        assert r.trend == 0.0, i
        assert r.seasonal == round((cents - 12048) / 100.0, 6), i
        assert r.forecast_next == round(cents / 100.0, 6), i


def test_holt_winters_replay_exact_integers(spark):
    """Every exact column (sq, num1, den1, num2, den2) matches a pure-
    Python integer replica — including the seasonal warm-up (partial
    same-slot history) and the single deterministic ROUND in sq."""
    from decimal import ROUND_HALF_UP, Decimal

    from datafusion_gpu_spark.operators.events import (
        holt_weights,
        holt_winters_additive,
        holt_winters_weights,
    )

    span, season_span = 3, 2
    vals = [10.0, 11.5, 9.25, 14.0, 8.75, 13.33, 12.0, 9.9, 10.05, 11.11]
    rows = [
        # two slots (hours 3 and 7) interleaved so each slot's subseries
        # is every other event
        (1, i, f"2024-01-{1 + i // 2:02d} {3 if i % 2 == 0 else 7:02d}:00:00", v)
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        r.event_id: r
        for r in holt_winters_additive(
            df, span=span, season_span=season_span
        ).collect()
    }
    sw = holt_winters_weights(season_span)
    w1, w2 = holt_weights(span)
    hist: dict[int, list[int]] = {3: [], 7: []}
    dhist: list[int] = []
    for i, v in enumerate(vals):
        h = 3 if i % 2 == 0 else 7
        c = round(v * 100)
        rev = hist[h][::-1]
        s_num = sum(x * sw[k] for k, x in enumerate(rev[:season_span]))
        s_den = sum(sw[: min(season_span, len(rev))])
        sq = (
            int(Decimal(s_num / s_den).quantize(Decimal(1), ROUND_HALF_UP))
            if s_den > 0
            else 0
        )
        d = c - sq
        dhist.append(d)
        hist[h].append(c)
        drev = dhist[::-1]
        r = got[i]
        assert r.sq == sq, i
        assert r.num1 == sum(x * w1[k] for k, x in enumerate(drev[:span])), i
        assert r.den1 == sum(w1[: min(span, len(drev))]), i
        assert r.num2 == sum(
            x * w2[j] for j, x in enumerate(drev[: 2 * span - 1])
        ), i
        assert r.den2 == sum(w2[: min(2 * span - 1, len(drev))]), i


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


def test_survival_km_textbook_6mp(spark):
    """Freireich 6-MP trial — the canonical KM worked example: the
    estimator must reproduce the product-limit curve computed by the
    naive sequential recursion in Python."""
    from datafusion_gpu_spark.operators.events import survival_km

    events_t = [6, 6, 6, 7, 10, 13, 16, 22, 23]
    censored_t = [6, 9, 10, 11, 17, 19, 20, 25, 32, 32, 34, 35]
    rows = [(t, 1) for t in events_t] + [(t, 0) for t in censored_t]
    df = spark.createDataFrame(rows, "duration long, observed int")
    got = {r.t: r for r in survival_km(df).collect()}

    # replay the recursion exactly (including the 1e-12 quantization)
    import math

    n = len(rows)
    from collections import Counter

    d_cnt, c_cnt = Counter(events_t), Counter(censored_t)
    times = sorted(set(events_t))
    at_risk, removed, s_q, h_q, expect = {}, 0, 0, 0, {}
    for t in sorted(set(events_t + censored_t)):
        at_risk[t] = n - removed
        removed += d_cnt.get(t, 0) + c_cnt.get(t, 0)
    for t in times:
        d, nr = d_cnt[t], at_risk[t]
        s_q += round(math.log(1 - d / nr) * 1e12)
        h_q += round(d / nr * 1e12)
        expect[t] = (nr, d, round(math.exp(s_q / 1e12), 6), round(h_q / 1e12, 6))
    assert set(got) == set(times)
    for t in times:
        nr, d, s, h = expect[t]
        assert got[t].n_risk == nr and got[t].n_events == d
        assert got[t].survival == s
        assert got[t].cum_hazard == h
    # sanity vs the published curve
    assert abs(got[6].survival - 0.857143) < 1e-6
    assert abs(got[23].survival - 0.448276) < 1e-3


def test_survival_km_risk_set_dies_out(spark):
    """When the last event time consumes the whole risk set, survival
    must be exactly 0.0 (no ln(0) anywhere), and stay 0 afterwards."""
    from datafusion_gpu_spark.operators.events import survival_km

    df = spark.createDataFrame(
        [(1, 1), (2, 1), (2, 1)], "duration long, observed int"
    )
    got = {r.t: r for r in survival_km(df).collect()}
    assert got[1].survival == round(2 / 3, 6)
    assert got[2].survival == 0.0
    assert got[2].n_risk == 2 and got[2].n_events == 2


def test_survival_logrank_freireich(spark):
    """Freireich 6-MP trial, BOTH arms — the canonical log-rank worked
    example (published chi2 = 16.79): the operator must reproduce the
    exact quantized fold replayed sequentially in Python, and land on
    the textbook value."""
    from decimal import ROUND_HALF_UP, Decimal

    from datafusion_gpu_spark.operators.events import survival_logrank

    def rhu(x):
        return int(Decimal(x).quantize(Decimal(1), rounding=ROUND_HALF_UP))

    g1_events = [6, 6, 6, 7, 10, 13, 16, 22, 23]
    g1_cens = [6, 9, 10, 11, 17, 19, 20, 25, 32, 32, 34, 35]
    g0_events = [1, 1, 2, 2, 3, 4, 4, 5, 5, 8, 8, 8, 8, 11, 11, 12, 12, 15, 17, 22, 23]
    rows = (
        [(1, t, 1) for t in g1_events]
        + [(1, t, 0) for t in g1_cens]
        + [(0, t, 1) for t in g0_events]
    )
    df = spark.createDataFrame(rows, "grp int, duration long, observed int")
    got = survival_logrank(df).collect()[0]

    # replay the hypergeometric O-E fold exactly (1e-9 quantization,
    # half-away rounding — the operator's numeric contract)
    per_t = {}
    for g, t, o in rows:
        e = per_t.setdefault(t, [0, 0, 0, 0])
        if g == 1:
            e[0] += o
            e[1] += 1 - o
        else:
            e[2] += o
            e[3] += 1 - o
    times = sorted(per_t)
    n1 = n0 = 0
    suf = {}
    for t in reversed(times):
        d1, c1, d0, c0 = per_t[t]
        n1 += d1 + c1
        n0 += d0 + c0
        suf[t] = (n1, n0)
    o1 = se1q = svq = 0
    for t in times:
        d1, c1, d0, c0 = per_t[t]
        d = d1 + d0
        if d == 0:
            continue
        m1, m0 = suf[t]
        n = float(m1 + m0)
        o1 += d1
        se1q += rhu(1e9 * (float(d) * m1 / n))
        if m1 + m0 > 1:
            svq += rhu(
                1e9 * (float(d) * (m1 / n) * (m0 / n) * ((n - d) / (n - 1.0)))
            )
    e1, v = se1q / 1e9, svq / 1e9
    chi2 = (o1 - e1) * (o1 - e1) / v
    assert got.n1_subjects == 21 and got.n0_subjects == 21
    assert got.o1 == o1 == 9
    assert got.e1 == round(e1, 6)
    assert got.var_lr == round(v, 6)
    assert got.chi2_lr == round(chi2, 6)
    assert got.reject_05 is True
    # sanity vs the published statistic
    assert abs(got.chi2_lr - 16.79) < 0.01


def test_survival_logrank_identical_cohorts(spark):
    """Two cohorts with identical duration/censoring profiles have
    O1 == E1 exactly at every event time (d1 = d/2, n1 = n/2 makes the
    quantized E1 term the exact integer d/2 * 1e9), so chi2 must be
    exactly 0 and the 5% test must not reject."""
    from datafusion_gpu_spark.operators.events import survival_logrank

    prof = [(2, 1), (3, 1), (5, 0), (7, 1), (11, 0)]
    rows = [(g, t, o) for g in (0, 1) for t, o in prof]
    got = survival_logrank(
        spark.createDataFrame(rows, "grp int, duration long, observed int")
    ).collect()[0]
    assert got.o1 == 3
    assert got.e1 == 3.0
    assert got.chi2_lr == 0.0
    assert got.reject_05 is False


def test_survival_logrank_single_subject_times(spark):
    """A pooled risk set of one (n = 1 at the last event time) must
    contribute zero variance without a 0/0 — the n > 1 guard."""
    from datafusion_gpu_spark.operators.events import survival_logrank

    rows = [(1, 1, 1), (0, 2, 1), (1, 3, 1)]  # last time: only one at risk
    got = survival_logrank(
        spark.createDataFrame(rows, "grp int, duration long, observed int")
    ).collect()[0]
    # t=3: n=1 -> E1 term = 1*1/1 = 1, V term = 0 (guard); earlier times
    # still carry variance, so chi2 is finite
    assert got.o1 == 2
    assert got.chi2_lr is not None


def test_autocorr_alternating_and_constant(spark):
    """A +-1 alternating series has r = -1 at odd lags, +1 at even lags;
    a constant series has zero variance and must emit NULL, not 0/0."""
    from datafusion_gpu_spark.operators.events import autocorr

    rows = [("alt", i, 1 if i % 2 == 0 else -1) for i in range(40)]
    rows += [("flat", i, 7) for i in range(40)]
    df = spark.createDataFrame(rows, "event_type string, bucket long, v_c long")
    got = {(r.event_type, r.lag_k): r for r in autocorr(df, max_lag=3).collect()}
    assert got[("alt", 1)].r == -1.0
    assert got[("alt", 2)].r == 1.0
    assert got[("alt", 3)].r == -1.0
    assert got[("alt", 1)].n_pairs == 39
    for k in (1, 2, 3):
        assert got[("flat", k)].r is None


def test_autocorr_matches_numpy(spark):
    """Pearson r of lagged integer pairs must equal numpy's corrcoef."""
    import numpy as np

    from datafusion_gpu_spark.operators.events import autocorr

    rng = np.random.default_rng(7)
    vals = rng.integers(-1000, 1000, size=60).tolist()
    df = spark.createDataFrame(
        [("s", i, int(v)) for i, v in enumerate(vals)],
        "event_type string, bucket long, v_c long",
    )
    got = {r.lag_k: r.r for r in autocorr(df, max_lag=3).collect()}
    for k in (1, 2, 3):
        expect = np.corrcoef(vals[:-k], vals[k:])[0, 1]
        assert abs(got[k] - expect) < 1e-6


def test_asof_nearest_directions_ties_and_tolerance(spark):
    """Nearest match either direction; ties prefer prior; equal-ts
    rights count as prior with delta 0; out-of-tolerance rows get
    NULL; among equal-t rights prior picks max id, next picks min."""
    from datafusion_gpu_spark.operators.events import asof_join_nearest

    def df(rows):
        return spark.createDataFrame(
            rows, "user_id long, event_id long, ts string"
        ).select("user_id", "event_id", F.col("ts").cast("timestamp").alias("ts"))

    T = "2024-01-01 12:{:02d}:{:02d}"
    left = df([
        (1, 100, T.format(30, 0)),   # prior at -120s, next at +300s -> prior
        (1, 101, T.format(40, 0)),   # next at +60s, prior at -480s -> next
        (2, 200, T.format(0, 0)),    # exact tie +-60s -> prior
        (3, 300, T.format(0, 0)),    # equal ts rights (2 of them) -> max rid, delta 0
        (4, 400, T.format(0, 0)),    # only right is 31min away -> NULL
    ])
    right = df([
        (1, 10, T.format(28, 0)), (1, 11, T.format(35, 0)), (1, 12, T.format(41, 0)),
        (2, 20, T.format(1, 0)),  # wait: prior needs <= left ts
        (2, 21, "2024-01-01 11:59:00"),
        (3, 30, T.format(0, 0)), (3, 31, T.format(0, 0)),
        (4, 40, "2024-01-01 12:31:00"),
    ])
    got = {
        r.event_id: (r.matched_right_id, r.delta_us)
        for r in asof_join_nearest(left, right, "user_id",
                                   tolerance_us=30 * 60 * 1_000_000).collect()
    }
    assert got[100] == (10, -120_000_000)
    assert got[101] == (12, 60_000_000)
    assert got[200] == (21, -60_000_000)   # tie: prior wins over +60s next
    assert got[300] == (31, 0)             # equal-ts: max rid as prior
    assert got[400] == (None, None)        # 31 min > 30 min tolerance


def test_cross_correlation_planted_shift(spark):
    """y is x shifted forward by 2 buckets (plus a constant): the lag=+2
    branch pairs x_{t-2} with y_t == x_{t-2}+5, so r(+2) == 1.0 exactly;
    other lags correlate a linear-ish ramp imperfectly (|r| < 1)."""
    from datafusion_gpu_spark.operators.events import cross_correlation

    xs = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8]
    rows = [
        (t, xs[t], xs[t - 2] + 5) for t in range(2, len(xs))
    ]
    df = spark.createDataFrame(rows, "bucket long, x long, y long")
    got = {r.lag_k: r for r in cross_correlation(df, "bucket", "x", "y", 3).collect()}
    assert set(got) == {-3, -2, -1, 0, 1, 2, 3}
    assert got[2].r == 1.0
    assert got[2].n_pairs == len(rows) - 2
    for k in got:
        if k != 2 and got[k].r is not None:
            assert abs(got[k].r) < 1.0
    # zero-variance guard: constant y -> NULL r, never 0/0
    const = spark.createDataFrame(
        [(t, xs[t], 7) for t in range(len(xs))], "bucket long, x long, y long"
    )
    res = {r.lag_k: r.r for r in cross_correlation(const, "bucket", "x", "y", 1).collect()}
    assert res[0] is None


def test_croston_constant_demand_closed_form(spark):
    """$5 purchases exactly every 2 hours: any adjusted EWMA of a
    constant is the constant, so from the second event on size_hat ==
    5.0, gap_hours == 2.0, and rate_per_hour == 2.5 exactly; the first
    event (no gap yet) reports NULL gap/rate."""
    from datafusion_gpu_spark.operators.events import croston

    rows = [
        (1, i, f"2024-01-01 {2 * i:02d}:00:00", 5.0) for i in range(10)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {r.event_id: r for r in croston(df, span=4).collect()}
    assert got[0].gap_hours is None and got[0].rate_per_hour is None
    assert got[0].size_hat == 5.0
    for i in range(1, 10):
        r = got[i]
        assert r.size_hat == 5.0, i
        assert r.gap_hours == 2.0, i
        assert r.rate_per_hour == 2.5, i


def test_survival_greenwood_textbook_bands(spark):
    """Hand-checked 4-subject curve: S and the Greenwood bands match
    the textbook closed forms; the d == n terminal time emits the
    conventional zero-width [0, 0] band via the dead flag."""
    import math

    from datafusion_gpu_spark.operators.events import survival_km_greenwood

    subj = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 0), (4, 1)], "duration long, observed int"
    )
    got = {r.t: r for r in survival_km_greenwood(subj).collect()}
    assert set(got) == {1, 2, 4}
    r = got[1]  # n=4, d=1: S = 3/4, var factor = 1/12
    assert (r.n_risk, r.n_events, r.survival) == (4, 1, 0.75)
    assert r.se_greenwood == round(0.75 * math.sqrt(1 / 12), 6)
    assert r.ci_lo == round(max(0.0, 0.75 - 1.959964 * 0.75 * math.sqrt(1 / 12)), 6)
    r = got[2]  # n=3, d=1: S = 1/2, factor = 1/12 + 1/6 = 1/4 -> se = 1/4
    assert (r.n_risk, r.survival) == (3, 0.5)
    assert r.se_greenwood == 0.25
    assert r.ci_hi == round(min(1.0, 0.5 + 1.959964 * 0.25), 6)
    r = got[4]  # d == n: dead flag -> zero-width band at 0
    assert (r.survival, r.se_greenwood, r.ci_lo, r.ci_hi) == (0.0, 0.0, 0.0, 0.0)


def test_gap_fill_linear_interpolates_interior_gaps(spark):
    from datetime import datetime

    from datafusion_gpu_spark.operators.events import gap_fill_linear

    rows = [
        (1, datetime(2026, 1, 1, 0, 10), 1, 10.0),
        (2, datetime(2026, 1, 1, 4, 50), 1, 30.0),   # 4-hour gap
        (3, datetime(2026, 1, 1, 6, 0), 1, 27.5),
        (4, datetime(2026, 1, 1, 2, 0), 2, 7.0),     # single point
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, value double"
    )
    out = {
        (r.user_id, r.bucket.hour): r
        for r in gap_fill_linear(ev, "hour").collect()
    }
    assert len(out) == 8  # user 1 hours 0..6, user 2 hour 2
    # interior hours 1-3 interpolate the 10 -> 30 line exactly
    for h, v in ((0, 10.0), (1, 15.0), (2, 20.0), (3, 25.0), (4, 30.0)):
        r = out[(1, h)]
        assert r.value_interp == v, h
        assert r.is_observed == (h in (0, 4))
    # hour 5 interpolates the 30 -> 27.5 line (two-hour span, midpoint)
    assert out[(1, 5)].value_interp == 28.75
    assert out[(1, 6)].value_interp == 27.5
    assert out[(2, 2)].value_interp == 7.0


def test_survival_logrank_stratified_single_stratum_matches_pooled(spark):
    """With one constant stratum the stratified test IS the pooled
    log-rank — same O1/E1/variance/chi2 on the Freireich data."""
    from datafusion_gpu_spark.operators.events import (
        survival_logrank,
        survival_logrank_stratified,
    )

    g1_events = [6, 6, 6, 7, 10, 13, 16, 22, 23]
    g1_cens = [6, 9, 10, 11, 17, 19, 20, 25, 32, 32, 34, 35]
    g0_events = [1, 1, 2, 2, 3, 4, 4, 5, 5, 8, 8, 8, 8, 11, 11, 12, 12, 15, 17, 22, 23]
    rows = (
        [(0, 1, t, 1) for t in g1_events]
        + [(0, 1, t, 0) for t in g1_cens]
        + [(0, 0, t, 1) for t in g0_events]
    )
    df = spark.createDataFrame(
        rows, "stratum int, grp int, duration long, observed int"
    )
    strat = survival_logrank_stratified(df).collect()[0]
    pooled = survival_logrank(df.drop("stratum")).collect()[0]
    assert strat.n_strata == 1
    assert strat.o1 == pooled.o1
    assert strat.e1 == pooled.e1
    assert strat.var_lr == pooled.var_lr
    assert strat.chi2_lr == pooled.chi2_lr


def test_survival_logrank_stratified_controls_confounder(spark):
    """Within each stratum the two cohorts have IDENTICAL duration
    profiles, but the strata differ wildly from each other and cohort 1
    is over-represented in the fast stratum — the POOLED test sees a
    spurious difference, the stratified test sees exactly none (every
    per-time E1 term is the exact integer d1)."""
    from datafusion_gpu_spark.operators.events import (
        survival_logrank,
        survival_logrank_stratified,
    )

    rows = []
    # stratum 0 ("fast"): profile [1,2,3] all observed, 3 subjects of
    # grp 1 per profile slot vs 1 of grp 0 (3:1 mix)
    for t in (1, 2, 3):
        rows += [(0, 1, t, 1)] * 3 + [(0, 0, t, 1)] * 1
    # stratum 1 ("slow"): profile [50,60,70] all observed, 1:3 mix
    for t in (50, 60, 70):
        rows += [(1, 1, t, 1)] * 1 + [(1, 0, t, 1)] * 3
    df = spark.createDataFrame(
        rows, "stratum int, grp int, duration long, observed int"
    )
    strat = survival_logrank_stratified(df).collect()[0]
    assert strat.n_strata == 2
    assert strat.chi2_lr == 0.0 and strat.reject_05 is False
    pooled = survival_logrank(df.drop("stratum")).collect()[0]
    assert pooled.chi2_lr > 3.841459  # the confounded pooled test fires


def test_survival_na_bands_textbook_6mp(spark):
    """Nelson-Aalen bands on the Freireich 6-MP arm: the operator must
    reproduce the quantized-fold recursion exactly (hazard terms d/n,
    variance terms d/n^2, both 1e-12-quantized before the running sum)
    and the bands must bracket the hazard."""
    from datafusion_gpu_spark.operators.events import survival_na_bands

    events_t = [6, 6, 6, 7, 10, 13, 16, 22, 23]
    censored_t = [6, 9, 10, 11, 17, 19, 20, 25, 32, 32, 34, 35]
    rows = [(t, 1) for t in events_t] + [(t, 0) for t in censored_t]
    df = spark.createDataFrame(rows, "duration long, observed int")
    got = {r.t: r for r in survival_na_bands(df).collect()}

    from collections import Counter
    import math

    d_cnt, c_cnt = Counter(events_t), Counter(censored_t)
    n = len(rows)
    at_risk, removed = {}, 0
    for t in sorted(set(events_t + censored_t)):
        at_risk[t] = n - removed
        removed += d_cnt.get(t, 0) + c_cnt.get(t, 0)
    hq = vq = 0
    for t in sorted(set(events_t)):
        d, nr = d_cnt[t], at_risk[t]
        hq += round(d / nr * 1e12)
        vq += round(d / (nr * nr) * 1e12)
        r = got[t]
        assert r.n_risk == nr and r.n_events == d
        assert r.cum_hazard == round(hq / 1e12, 6)
        assert r.se_na == round(math.sqrt(vq / 1e12), 6)
        assert r.ci_lo == round(max(0.0, hq / 1e12 - 1.959964 * math.sqrt(vq / 1e12)), 6)
        assert r.ci_hi == round(hq / 1e12 + 1.959964 * math.sqrt(vq / 1e12), 6)
        assert r.ci_lo <= r.cum_hazard <= r.ci_hi


def test_survival_median_brookmeyer_crowley_6mp(spark):
    """The 6-MP arm's published median remission time is 23 weeks
    (S(22) = 0.538 > 0.5 >= S(23) = 0.448); the Brookmeyer-Crowley
    bounds must be the first times the Greenwood band crosses half."""
    from datafusion_gpu_spark.operators.events import survival_km_greenwood
    from pyspark.sql import functions as F

    events_t = [6, 6, 6, 7, 10, 13, 16, 22, 23]
    censored_t = [6, 9, 10, 11, 17, 19, 20, 25, 32, 32, 34, 35]
    rows = [(t, 1) for t in events_t] + [(t, 0) for t in censored_t]
    gw = survival_km_greenwood(
        spark.createDataFrame(rows, "duration long, observed int")
    )
    got = gw.agg(
        F.min(F.when(F.col("survival") <= 0.5, F.col("t"))).alias("median_t"),
        F.min(F.when(F.col("ci_lo") <= 0.5, F.col("t"))).alias("ci_lo_t"),
        F.min(F.when(F.col("ci_hi") < 0.5, F.col("t"))).alias("ci_hi_t"),
    ).collect()[0]
    assert got.median_t == 23
    rows_by_t = {r.t: r for r in gw.collect()}
    assert rows_by_t[22].survival > 0.5 >= rows_by_t[23].survival
    # lower bound: the first event time whose band reaches down to 0.5
    assert got.ci_lo_t == min(
        t for t, r in rows_by_t.items() if r.ci_lo <= 0.5
    )
    # the 21-subject arm's band never falls fully below half -> open
    # upper bound, exactly what BC prescribes for small samples
    assert got.ci_hi_t is None or rows_by_t[got.ci_hi_t].ci_hi < 0.5


def test_competing_risks_cif_closed_form(spark):
    """Aalen-Johansen on a hand-computable series: 4 subjects, cause-1
    events at t=1,3, a cause-2 event at t=2, censoring at t=4. The CIF
    increments are S(t-)*d_k/n replayed exactly (with the 1e-12
    quantization), and CIF_1 + CIF_2 + S == 1 at every event time."""
    from decimal import ROUND_HALF_UP, Decimal
    import math

    from datafusion_gpu_spark.operators.events import competing_risks_cif

    rows = [(1, 1), (2, 2), (3, 1), (4, 0)]
    got = {
        r.t: r
        for r in competing_risks_cif(
            spark.createDataFrame(rows, "duration long, cause int")
        ).collect()
    }

    def rhu(x):
        return int(Decimal(x).quantize(Decimal(1), rounding=ROUND_HALF_UP))

    # replay: t=1 n=4 d1=1 -> s_prev=1, inc1=1/4; S=3/4
    #         t=2 n=3 d2=1 -> s_prev=3/4, inc2=1/4; S=1/2
    #         t=3 n=2 d1=1 -> s_prev=1/2, inc1=1/4; S=1/4
    slnq = 0
    s1q = s2q = 0
    seq = [(1, 4, 1, 0), (2, 3, 0, 1), (3, 2, 1, 0)]
    for t, n, d1, d2 in seq:
        s_prev = math.exp(slnq / 1e12)
        s1q += rhu(s_prev * d1 / n * 1e12)
        s2q += rhu(s_prev * d2 / n * 1e12)
        slnq += rhu(math.log(1 - (d1 + d2) / n) * 1e12)
        r = got[t]
        assert (r.n_risk, r.d1, r.d2) == (n, d1, d2)
        assert r.survival == round(math.exp(slnq / 1e12), 6)
        assert r.cif_1 == round(s1q / 1e12, 6)
        assert r.cif_2 == round(s2q / 1e12, 6)
        assert abs(r.cif_1 + r.cif_2 + r.survival - 1.0) < 1e-6
    assert got[1].cif_1 == 0.25 and got[2].cif_2 == 0.25
    assert got[3].cif_1 == 0.5  # 1/4 + 1/4


def test_competing_risks_risk_set_dies_out(spark):
    """If the last event consumes the whole risk set, survival is
    exactly 0 and the CIFs absorb it (sum to 1) with no ln(0)."""
    from datafusion_gpu_spark.operators.events import competing_risks_cif

    rows = [(1, 1), (2, 2), (2, 2)]
    got = {
        r.t: r
        for r in competing_risks_cif(
            spark.createDataFrame(rows, "duration long, cause int")
        ).collect()
    }
    assert got[2].survival == 0.0
    assert abs(got[2].cif_1 + got[2].cif_2 - 1.0) < 1e-6


def test_rmst_oracle_chain_in_sync():
    """events_survival_rmst's oracle inlines the events_survival_km
    chain verbatim (nested WITH, DuckDB-side); this pin fails if either
    copy drifts."""
    from datafusion_gpu_spark.queries.pipeline import ORACLES as p_oracles
    from datafusion_gpu_spark.queries.pipeline_forecast import (
        ORACLES as f_oracles,
    )

    km = p_oracles["events_survival_km"].strip()
    assert km in f_oracles["events_survival_rmst"]


def test_survival_rmst_closed_form(spark):
    """Planted curve: S steps 1 -> 0.75 at t=10 -> 0.5 at t=30, two
    censored users at t=100; RMST(72) = 1*10 + 0.75*20 + 0.5*42 = 46.0
    exactly (interval widths are exact integers, the S values
    round-trip the quantized log fold exactly at 6dp)."""
    from pyspark.sql import functions as F

    from datafusion_gpu_spark.operators.events import survival_km
    from datafusion_gpu_spark.queries.pipeline_forecast import _rmst_from_km

    # subjects: purchases at 10h and 30h, two censored at 100h
    subjects = spark.createDataFrame(
        [(10, 1), (30, 1), (100, 0), (100, 0)], "duration long, observed int"
    )
    km = survival_km(subjects).select(
        "t", "survival", F.col("n_events").alias("d1d")
    )
    got = _rmst_from_km(km, tau=72).collect()[0]
    assert got.tau == 72 and got.n_event_times == 2
    assert got.rmst == 46.0


def _freireich_rows():
    """Freireich 6-MP trial rows (grp, duration, observed) — the shared
    anchor dataset for the log-rank family tests."""
    g1_events = [6, 6, 6, 7, 10, 13, 16, 22, 23]
    g1_cens = [6, 9, 10, 11, 17, 19, 20, 25, 32, 32, 34, 35]
    g0_events = [1, 1, 2, 2, 3, 4, 4, 5, 5, 8, 8, 8, 8, 11, 11, 12, 12, 15,
                 17, 22, 23]
    return (
        [(1, t, 1) for t in g1_events]
        + [(1, t, 0) for t in g1_cens]
        + [(0, t, 1) for t in g0_events]
    )


def test_survival_logrank_k_pair_reduction(spark):
    """k=2 through the k-sample quadratic form must equal the dedicated
    two-cohort test EXACTLY: with m = 1 the inversion degenerates to
    z1^2/V11, and the component spellings (E term, diagonal V term with
    n - n1 computed in exact bigints == n0) share survival_logrank's
    IEEE expression tree — same rounded chi2, same decision."""
    from datafusion_gpu_spark.operators.events import (
        survival_logrank,
        survival_logrank_k,
    )

    df = spark.createDataFrame(
        _freireich_rows(), "grp int, duration long, observed int"
    )
    two = survival_logrank(df).collect()[0]
    k2 = survival_logrank_k(df, 2).collect()[0]
    assert k2.chi2_lr_k == two.chi2_lr == 16.792941
    assert k2.reject_05 is True
    assert k2.df == 1
    assert k2.n_subjects == two.n1_subjects + two.n0_subjects
    assert k2.o_total == 30


def test_survival_logrank_k_single_death_hand_computed(spark):
    """One death time, hand-computable 3-arm case: at t=1, n = (2,3,5)
    per arm, the arm-0 subject dies (d=1). E = d*n_j/n -> E1 = 0.3,
    E2 = 0.5; z = (O-E) = (-0.3, -0.5). With d=1 the (n-d)/(n-1) tail
    is computed at n=10: V11 = 1*(3/10)*(7/10)*(9/9) = 0.21,
    V22 = 1*(5/10)*(5/10)*1 = 0.25, V12 = -(3/10)*(5/10) = -0.15.
    det = 0.21*0.25 - 0.0225 = 0.03; quad = 0.09*0.25
    - 2*0.15*(-0.15)*(-0.5)*... spelled out: z1^2 V22 - 2 z1 z2 V12
    + z2^2 V11 = 0.0225 - 2*(-0.3)(-0.5)(-0.15) + 0.0525 = 0.12;
    chi2 = 0.12/0.03 = 4.0 exactly (all terms exact in 1e-9 quanta)."""
    from datafusion_gpu_spark.operators.events import survival_logrank_k

    rows = (
        [(0, 1, 1), (0, 9, 0)]
        + [(1, 9, 0)] * 3
        + [(2, 9, 0)] * 5
    )
    got = survival_logrank_k(
        spark.createDataFrame(rows, "grp int, duration long, observed int"), 3
    ).collect()[0]
    assert got.n_groups == 3 and got.df == 2
    assert got.n_subjects == 10 and got.o_total == 1
    assert got.chi2_lr_k == 4.0
    assert got.reject_05 is False  # 4.0 < 5.991465 on 2 df


def test_survival_logrank_k_three_arm_replay(spark):
    """Three-arm statistic vs an independent float replay of the
    multivariate hypergeometric fold (numpy-free, different code path:
    sequential Python loops + explicit 2x2 inversion, SAME 1e-9
    quantization contract)."""
    from decimal import ROUND_HALF_UP, Decimal

    from datafusion_gpu_spark.operators.events import survival_logrank_k

    def rhu(x):
        return int(Decimal(x).quantize(Decimal(1), rounding=ROUND_HALF_UP))

    rows = []
    # deterministic 3-arm plant: arm j's events shift later with j
    for j in range(3):
        for i in range(20):
            t = 1 + (7 * i + 3 * j * i) % 23 + 4 * j
            rows.append((j, t, 1 if (i + j) % 4 else 0))
    df = spark.createDataFrame(rows, "grp int, duration long, observed int")
    got = survival_logrank_k(df, 3).collect()[0]

    per_t = {}
    for g, t, o in rows:
        e = per_t.setdefault(t, [[0, 0], [0, 0], [0, 0]])
        e[g][0] += o
        e[g][1] += 1 - o
    times = sorted(per_t)
    n = [0, 0, 0]
    suf = {}
    for t in reversed(times):
        for j in range(3):
            n[j] += per_t[t][j][0] + per_t[t][j][1]
        suf[t] = tuple(n)
    o1 = o2 = se1 = se2 = sv11 = sv12 = sv22 = ot = 0
    for t in times:
        d_j = [per_t[t][j][0] for j in range(3)]
        d = sum(d_j)
        if d == 0:
            continue
        nj = suf[t]
        nr = sum(nj)
        nf = float(nr)
        ot += d
        o1 += d_j[1]
        o2 += d_j[2]
        se1 += rhu(1e9 * (float(d) * nj[1] / nf))
        se2 += rhu(1e9 * (float(d) * nj[2] / nf))
        if nr > 1:
            tail = (nf - d) / (nf - 1.0)
            sv11 += rhu(1e9 * (float(d) * (nj[1] / nf)
                               * ((nr - nj[1]) / nf) * tail))
            sv12 += rhu(1e9 * (-(float(d) * (nj[1] / nf)
                                 * (nj[2] / nf) * tail)))
            sv22 += rhu(1e9 * (float(d) * (nj[2] / nf)
                               * ((nr - nj[2]) / nf) * tail))
    z1, z2 = o1 - se1 / 1e9, o2 - se2 / 1e9
    v11, v12, v22 = sv11 / 1e9, sv12 / 1e9, sv22 / 1e9
    det = v11 * v22 - v12 * v12
    chi2 = (z1 * z1 * v22 - 2.0 * z1 * z2 * v12 + z2 * z2 * v11) / det
    assert got.o_total == ot
    assert got.chi2_lr_k == round(chi2, 6)
    assert got.reject_05 == (chi2 > 5.991465)


def test_survival_logrank_k_identical_arms_zero(spark):
    """Three arms with identical duration/censoring profiles: every
    per-time E_j equals d_j exactly (all quantized terms exact thirds
    of integers would not be — so use a profile where d and n split
    in exact multiples of 3), chi2 == 0, no rejection."""
    from datafusion_gpu_spark.operators.events import survival_logrank_k

    prof = [(2, 1), (3, 1), (5, 0), (7, 1), (11, 0)]
    rows = [(g, t, o) for g in (0, 1, 2) for t, o in prof]
    got = survival_logrank_k(
        spark.createDataFrame(rows, "grp int, duration long, observed int"), 3
    ).collect()[0]
    assert got.chi2_lr_k == 0.0
    assert got.reject_05 is False


def test_survival_logrank_k_rejects_bad_k(spark):
    import pytest

    from datafusion_gpu_spark.operators.events import survival_logrank_k

    df = spark.createDataFrame(
        [(0, 1, 1)], "grp int, duration long, observed int"
    )
    with pytest.raises(ValueError, match="2 <= k <= 4"):
        survival_logrank_k(df, 5)
    with pytest.raises(ValueError, match="2 <= k <= 4"):
        survival_logrank_k(df, 1)


def test_survival_logrank_weighted_reduction(spark):
    """The family's identity contracts: the 'logrank' row (w = 1) must
    equal survival_logrank's chi2 bit-for-bit (the szo/q - sze/q
    spelling shares its expression tree), and G(0,0) — POWER(x,0) = 1
    exactly — must equal the logrank row on every column."""
    from datafusion_gpu_spark.operators.events import (
        survival_logrank,
        survival_logrank_weighted,
    )

    df = spark.createDataFrame(
        _freireich_rows(), "grp int, duration long, observed int"
    )
    two = survival_logrank(df).collect()[0]
    fam = {
        r.weight_fn: r
        for r in survival_logrank_weighted(df, rho=0.0, gamma=0.0).collect()
    }
    assert set(fam) == {"logrank", "gehan", "tarone_ware", "fh_0_0"}
    lr = fam["logrank"]
    assert lr.chi2_w == two.chi2_lr == 16.792941
    assert lr.var_w == two.var_lr
    assert lr.o1 == two.o1
    fh = fam["fh_0_0"]
    assert (fh.z_w, fh.var_w, fh.chi2_w, fh.reject_05) == (
        lr.z_w, lr.var_w, lr.chi2_w, lr.reject_05
    )


def test_survival_logrank_weighted_gehan_replay(spark):
    """Gehan-Breslow-Wilcoxon on the Freireich data vs an independent
    sequential replay with the normalized weight n_t/n_total (chi2 is
    invariant under the normalization — Z scales by c, V by c^2); the
    replay also pins the published ballpark (~13.46)."""
    from decimal import ROUND_HALF_UP, Decimal

    from datafusion_gpu_spark.operators.events import survival_logrank_weighted

    def rhu(x):
        return int(Decimal(x).quantize(Decimal(1), rounding=ROUND_HALF_UP))

    rows = _freireich_rows()
    fam = {
        r.weight_fn: r
        for r in survival_logrank_weighted(
            spark.createDataFrame(rows, "grp int, duration long, observed int")
        ).collect()
    }
    per_t = {}
    for g, t, o in rows:
        e = per_t.setdefault(t, [0, 0, 0, 0])
        if g == 1:
            e[0] += o
            e[1] += 1 - o
        else:
            e[2] += o
            e[3] += 1 - o
    times = sorted(per_t)
    n1 = n0 = 0
    suf = {}
    for t in reversed(times):
        d1, c1, d0, c0 = per_t[t]
        n1 += d1 + c1
        n0 += d0 + c0
        suf[t] = (n1, n0)
    n_tot = float(n1 + n0)
    szo = sze = sv = 0
    for t in times:
        d1, c1, d0, c0 = per_t[t]
        d = d1 + d0
        if d == 0:
            continue
        m1, m0 = suf[t]
        n = float(m1 + m0)
        w = n / n_tot
        szo += rhu(1e9 * (w * float(d1)))
        sze += rhu(1e9 * (w * (float(d) * m1 / n)))
        if m1 + m0 > 1:
            sv += rhu(
                1e9
                * (w * w * (float(d) * (m1 / n) * (m0 / n)
                            * ((n - d) / (n - 1.0))))
            )
    zw = szo / 1e9 - sze / 1e9
    chi2 = zw * zw / (sv / 1e9)
    ge = fam["gehan"]
    assert ge.z_w == round(zw, 6)
    assert ge.chi2_w == round(chi2, 6)
    assert abs(ge.chi2_w - 13.46) < 0.01
    assert ge.reject_05 is True


def test_survival_logrank_weighted_late_early_sensitivity(spark):
    """Directional contract: a LATE-only hazard divergence must score
    higher under G(0,1) (weight 1 - S(t-) grows late) than under Gehan
    (weight n_t/n_tot shrinks late), and an EARLY-only divergence the
    reverse — the reason the weighted family exists."""
    from datafusion_gpu_spark.operators.events import survival_logrank_weighted

    # identical early deaths; group 1 alone keeps dying late
    late = (
        [(g, t, 1) for g in (0, 1) for t in (1, 2, 3, 4, 5)]
        + [(1, t, 1) for t in (20, 21, 22, 23, 24, 25, 26, 27)]
        + [(0, 30, 0)] * 8
        + [(1, 40, 0)] * 10
        + [(0, 40, 0)] * 10
    )
    fam_late = {
        r.weight_fn: r
        for r in survival_logrank_weighted(
            spark.createDataFrame(late, "grp int, duration long, observed int")
        ).collect()
    }
    assert fam_late["fh_0_1"].chi2_w > fam_late["gehan"].chi2_w

    # group 1 dies early; tails identical
    early = (
        [(1, t, 1) for t in (1, 1, 2, 2, 3, 3, 4, 4)]
        + [(g, t, 1) for g in (0, 1) for t in (20, 22, 24, 26, 28)]
        + [(0, 40, 0)] * 13
        + [(1, 40, 0)] * 5
    )
    fam_early = {
        r.weight_fn: r
        for r in survival_logrank_weighted(
            spark.createDataFrame(early, "grp int, duration long, observed int")
        ).collect()
    }
    assert fam_early["gehan"].chi2_w > fam_early["fh_0_1"].chi2_w


def test_cox_ph_binary_freireich_published(spark):
    """Cox PH with Breslow ties on the Freireich 6-MP trial: the
    published fit (R coxph(..., ties='breslow'), treatment coded 1) is
    beta = -1.509, HR = 0.221, se = 0.410 — the operator must land on
    those to 3 decimals AND match the exact quantized Newton replay
    digit-for-digit, with the converged score residual at 0."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    from datafusion_gpu_spark.operators.events import cox_ph_binary

    def rhu(x):
        return int(Decimal(x).quantize(Decimal(1), rounding=ROUND_HALF_UP))

    rows = _freireich_rows()
    got = cox_ph_binary(
        spark.createDataFrame(rows, "grp int, duration long, observed int")
    ).collect()[0]

    per = {}
    for g, t, o in rows:
        e = per.setdefault(t, [0, 0, 0, 0])
        if g == 1:
            e[0] += o
            e[1] += 1 - o
        else:
            e[2] += o
            e[3] += 1 - o
    times = sorted(per)
    n1 = n0 = 0
    suf = {}
    for t in reversed(times):
        d1, c1, d0, c0 = per[t]
        n1 += d1 + c1
        n0 += d0 + c0
        suf[t] = (n1, n0)
    ev = [
        (per[t][0], per[t][0] + per[t][2], *suf[t])
        for t in times
        if per[t][0] + per[t][2] > 0
    ]

    def fold(b):
        su = si = 0
        for d1, d, m1, m0 in ev:
            eb = math.exp(b)
            num = float(m1) * eb
            rr = num / (num + float(m0))
            su += rhu(1e9 * (float(d1) - float(d) * rr))
            si += rhu(1e9 * (float(d) * rr * (1.0 - rr)))
        return su, si

    b = 0.0
    for _ in range(5):
        su, si = fold(b)
        b = b + (su / 1e9) / (si / 1e9)
    su, si = fold(b)
    assert su == 0  # Newton converged: score residual exactly 0 quanta
    assert got.beta == round(b, 6) == -1.509191
    assert got.hazard_ratio == round(math.exp(b), 6) == 0.221089
    assert got.se_beta == round(1.0 / math.sqrt(si / 1e9), 6) == 0.409564
    se = 1.0 / math.sqrt(si / 1e9)
    assert got.hr_lo == round(math.exp(b - 1.959964 * se), 6)
    assert got.hr_hi == round(math.exp(b + 1.959964 * se), 6)
    assert got.hr_lo < got.hazard_ratio < got.hr_hi < 1.0  # protective CI
    assert got.z_wald == round(b * math.sqrt(si / 1e9), 6)
    assert got.reject_05 is True
    # published anchors (Breslow ties)
    assert abs(got.beta - (-1.509)) < 5e-4
    assert abs(got.hazard_ratio - 0.221) < 5e-4


def test_cox_ph_binary_null_effect_and_logrank_sign(spark):
    """Identical cohorts => beta == 0 exactly (U(0) = 0 so every Newton
    step is 0) and no rejection; and on a shifted-hazard plant the
    hazard-ratio direction must agree with the log-rank O1 - E1 sign."""
    from datafusion_gpu_spark.operators.events import (
        cox_ph_binary,
        survival_logrank,
    )

    prof = [(2, 1), (3, 1), (5, 0), (7, 1), (11, 0)]
    rows = [(g, t, o) for g in (0, 1) for t, o in prof]
    same = cox_ph_binary(
        spark.createDataFrame(rows, "grp int, duration long, observed int")
    ).collect()[0]
    assert same.beta == 0.0 and same.hazard_ratio == 1.0
    assert same.reject_05 is False

    fr = spark.createDataFrame(
        _freireich_rows(), "grp int, duration long, observed int"
    )
    cox = cox_ph_binary(fr).collect()[0]
    lr = survival_logrank(fr).collect()[0]
    # group 1 (6-MP) has FEWER events than expected -> protective: both
    # O1 - E1 and beta negative
    assert (lr.o1 - lr.e1) < 0 and cox.beta < 0


def test_cox_ph_binary_degenerate_one_cohort(spark):
    """All subjects in one cohort: r_t is 1 at every time, I == 0 —
    the si > 0 guard must surface NULL Wald outputs, not divide by
    zero (beta itself is NULL too: the first step is already 0/0)."""
    from datafusion_gpu_spark.operators.events import cox_ph_binary

    rows = [(1, t, 1) for t in (1, 2, 3, 4)]
    got = cox_ph_binary(
        spark.createDataFrame(rows, "grp int, duration long, observed int")
    ).collect()[0]
    assert got.beta is None
    assert got.se_beta is None and got.z_wald is None
    assert got.reject_05 is None


def test_theil_sen_exact_line(spark):
    """Points exactly on y = 7x + 300: every pairwise slope is exactly
    7.0 (integer-valued double division), so slope == 7.0 and every
    residual is exactly 300.0 -> intercept == 300.0."""
    from datafusion_gpu_spark.operators.events import theil_sen_trend

    pts = [(x, 7 * x + 300) for x in range(1, 21)]
    got = theil_sen_trend(
        spark.createDataFrame(pts, "bucket long, v_c long")
    ).collect()[0]
    assert got.n_points == 20 and got.n_pairs == 190
    assert got.slope == 7.0 and got.intercept == 300.0


def test_theil_sen_robust_to_outlier_vs_ols(spark):
    """The reason this operator exists: one corrupted bucket (y spiked
    1000x) must leave the Theil-Sen slope at the true 5.0 while the
    OLS slope on the same points is dragged far away."""
    from datafusion_gpu_spark.operators.events import theil_sen_trend

    pts = [(x, 5 * x + 100) for x in range(1, 30)]
    # contaminate an ENDPOINT bucket (a spike at the center x would sit
    # on the OLS pivot and leave its slope untouched)
    pts[28] = (29, (5 * 29 + 100) * 1000)
    df = spark.createDataFrame(pts, "bucket long, v_c long")
    got = theil_sen_trend(df).collect()[0]
    assert got.slope == 5.0
    # OLS on the same points, for contrast
    from pyspark.sql import functions as F

    ols = df.agg(
        (
            F.covar_pop(F.col("bucket").cast("double"), F.col("v_c").cast("double"))
            / F.var_pop(F.col("bucket").cast("double"))
        ).alias("b")
    ).collect()[0]
    assert abs(ols.b - 5.0) > 100  # wrecked by the single outlier
    # intercept: median of residuals at the TRUE slope stays near 100
    assert abs(got.intercept - 100.0) < 1e-6


def test_theil_sen_median_replay(spark):
    """Even/odd pair-count median selection vs a sequential replay
    with the SAME deterministic (slope, x1, x2) tiebreak."""
    from datafusion_gpu_spark.operators.events import theil_sen_trend

    pts = [(1, 10), (2, 30), (4, 31), (7, 90), (11, 95)]
    got = theil_sen_trend(
        spark.createDataFrame(pts, "bucket long, v_c long")
    ).collect()[0]
    pairs = []
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            (x1, y1), (x2, y2) = pts[i], pts[j]
            pairs.append((float(y2 - y1) / float(x2 - x1), x1, x2))
    pairs.sort()
    n = len(pairs)
    k1, k2 = (n + 1) // 2 - 1, (n + 2) // 2 - 1
    slope = (pairs[k1][0] + pairs[k2][0]) / 2.0
    resid = sorted(
        (float(y) - slope * float(x), x) for x, y in pts
    )
    m = len(resid)
    icpt = (resid[(m + 1) // 2 - 1][0] + resid[(m + 2) // 2 - 1][0]) / 2.0
    assert got.n_pairs == n == 10
    assert got.slope == round(slope, 6)
    assert got.intercept == round(icpt, 6)


def test_life_table_hand_computed(spark):
    """Berkson-Gage actuarial arithmetic on a hand-sized cohort:
    interval [0,12): n=10 enter, 2 die, 2 censor -> n' = 10 - 1 = 9,
    q = 2/9, S = 7/9; interval [12,24): n=6, 1 dies, 0 censor ->
    q = 1/6, S = (7/9)(5/6); interval [24,36): n=5, 0 die, 5 censor
    -> q = 0, S unchanged."""
    from datafusion_gpu_spark.operators.events import life_table

    rows = (
        [(3, 1), (7, 1), (5, 0), (11, 0)]
        + [(15, 1)]
        + [(30, 0)] * 5
    )
    got = life_table(
        spark.createDataFrame(rows, "duration long, observed int"), width=12
    ).collect()
    by_iv = {r.interval_start: r for r in got}
    assert sorted(by_iv) == [0, 12, 24]
    r0 = by_iv[0]
    assert (r0.n_enter, r0.n_events, r0.n_censored) == (10, 2, 2)
    assert r0.effective_n == 9.0
    assert r0.q == round(2 / 9, 6)
    assert r0.survival == round(7 / 9, 6)
    r1 = by_iv[12]
    assert (r1.n_enter, r1.n_events, r1.n_censored) == (6, 1, 0)
    assert r1.effective_n == 6.0
    assert r1.survival == round((7 / 9) * (5 / 6), 6)
    r2 = by_iv[24]
    assert (r2.n_enter, r2.n_events, r2.n_censored) == (5, 0, 5)
    assert r2.q == 0.0
    assert r2.survival == r1.survival  # censor-only interval leaves S


def test_life_table_no_censoring_matches_km(spark):
    """With zero censoring and width=1 the actuarial exposure n' equals
    n, so the life-table survival at each occupied interval must equal
    the KM product-limit estimate at that duration (both are the same
    1e-12 quantized-ln fold)."""
    from datafusion_gpu_spark.operators.events import life_table, survival_km

    rows = [(t, 1) for t in (1, 1, 2, 4, 4, 4, 7, 9, 9, 12)]
    df = spark.createDataFrame(rows, "duration long, observed int")
    lt = {r.interval_start: r.survival for r in life_table(df, width=1).collect()}
    km = {r.t: r.survival for r in survival_km(df).collect()}
    assert set(lt) == set(km)
    for t in km:
        assert lt[t] == km[t]


def test_life_table_dead_latch_and_bad_width(spark):
    """A terminal interval where everyone at risk dies (c = 0, d = n)
    must pin survival to exactly 0; width <= 0 raises."""
    import pytest

    from datafusion_gpu_spark.operators.events import life_table

    rows = [(2, 1), (5, 0), (14, 1), (15, 1)]
    got = {
        r.interval_start: r
        for r in life_table(
            spark.createDataFrame(rows, "duration long, observed int"), width=12
        ).collect()
    }
    assert got[12].n_events == 2 and got[12].n_censored == 0
    assert got[12].q == 1.0 and got[12].survival == 0.0
    with pytest.raises(ValueError, match="width"):
        life_table(
            spark.createDataFrame(rows, "duration long, observed int"), width=0
        )


def test_survival_diff_at_freireich_milestone(spark):
    """Milestone comparison at tau = 12 weeks on the Freireich trial:
    the published KM curves put 6-MP at S(12) ~ 0.753 and placebo at
    S(12) ~ 0.190; the z against the combined Greenwood SE rejects.
    Exactness is pinned by a sequential replay of both per-cohort
    quantized folds."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    from datafusion_gpu_spark.operators.events import survival_diff_at

    def rhu(x):
        return int(Decimal(x).quantize(Decimal(1), rounding=ROUND_HALF_UP))

    rows = _freireich_rows()
    got = survival_diff_at(
        spark.createDataFrame(rows, "grp int, duration long, observed int"),
        12,
    ).collect()[0]

    def cohort(g):
        per = {}
        for gg, t, o in rows:
            if gg != g:
                continue
            e = per.setdefault(t, [0, 0])
            e[0] += o
            e[1] += 1 - o
        times = sorted(per)
        n = 0
        suf = {}
        for t in reversed(times):
            n += sum(per[t])
            suf[t] = n
        slnq = sgwq = 0
        for t in times:
            d = per[t][0]
            if d == 0 or t > 12:
                continue
            m = suf[t]
            if d < m:
                slnq += rhu(math.log(1.0 - float(d) / m) * 1e12)
                sgwq += rhu(float(d) / (m * (m - d)) * 1e12)
        s = math.exp(slnq / 1e12)
        return s, s * math.sqrt(sgwq / 1e12)

    s1, se1 = cohort(1)
    s0, se0 = cohort(0)
    sd = math.sqrt(se1 * se1 + se0 * se0)
    assert got.s1 == round(s1, 6) and got.s0 == round(s0, 6)
    assert abs(got.s1 - 0.753) < 1e-3 and abs(got.s0 - 0.190) < 1e-3
    assert got.se_diff == round(sd, 6)
    assert got.z_diff == round((s1 - s0) / sd, 6)
    assert got.reject_05 is True


def test_survival_diff_at_edge_cohorts(spark):
    """A cohort with subjects but NO event by tau contributes exactly
    S = 1, se = 0; identical cohorts give diff = 0 and no rejection."""
    from datafusion_gpu_spark.operators.events import survival_diff_at

    rows = [(1, 100, 1)] * 5 + [(0, t, 1) for t in (1, 2, 3)] + [(0, 50, 0)] * 7
    got = survival_diff_at(
        spark.createDataFrame(rows, "grp int, duration long, observed int"), 10
    ).collect()[0]
    assert got.s1 == 1.0 and got.se1 == 0.0
    assert got.n1_subjects == 5 and got.n0_subjects == 10

    prof = [(2, 1), (3, 1), (5, 0), (7, 1), (11, 0)]
    same = survival_diff_at(
        spark.createDataFrame(
            [(g, t, o) for g in (0, 1) for t, o in prof],
            "grp int, duration long, observed int",
        ),
        20,
    ).collect()[0]
    assert same.diff == 0.0 and same.z_diff == 0.0
    assert same.reject_05 is False


def test_theil_sen_bucketed_equals_plain(spark):
    """The bucketed two-level selection must return the IDENTICAL row
    to the plain global-rank spelling — even and odd pair counts, ties
    inside a quantization bucket, negative slopes."""
    from datafusion_gpu_spark.operators.events import (
        theil_sen_trend,
        theil_sen_trend_bucketed,
    )

    cases = [
        [(x, 7 * x + 300) for x in range(1, 21)],          # all ties
        [(1, 10), (2, 30), (4, 31), (7, 90), (11, 95)],    # 10 pairs (even)
        [(1, 50), (3, 20), (5, 90), (9, 10)],              # negative slopes
        [(x, (x * 37) % 101) for x in range(1, 14)],       # 78 pairs, scrambled
    ]
    for pts in cases:
        df = spark.createDataFrame(pts, "bucket long, v_c long")
        plain = theil_sen_trend(df).collect()[0]
        buck = theil_sen_trend_bucketed(df, n_buckets=8).collect()[0]
        assert tuple(buck) == tuple(plain), (pts, buck, plain)


def test_siegel_trend_breakdown_beats_theil_sen(spark):
    """Siegel's raison d'etre: with 8 of 21 buckets moved onto a tilted
    line (38% contamination — above Theil-Sen's ~29% breakdown, below
    Siegel's 50%), Theil-Sen's single all-pairs median is dragged to
    ~26 while the repeated median holds the true slope 5.0 and
    intercept 100.0 EXACTLY; on a clean exact line both agree."""
    from datafusion_gpu_spark.operators.events import (
        siegel_trend,
        theil_sen_trend,
    )

    clean = [(x, 7 * x + 300) for x in range(1, 21)]
    df = spark.createDataFrame(clean, "bucket long, v_c long")
    got = siegel_trend(df).collect()[0]
    assert (got.n_points, got.n_pairs, got.slope, got.intercept) == (
        20, 190, 7.0, 300.0
    )

    pts = [(x, 5 * x + 100) for x in range(1, 22)]
    for i in range(13, 21):  # the last 8 points follow y = 50x - 400
        xx = pts[i][0]
        pts[i] = (xx, 50 * xx - 400)
    df2 = spark.createDataFrame(pts, "bucket long, v_c long")
    sg = siegel_trend(df2).collect()[0]
    ts = theil_sen_trend(df2).collect()[0]
    assert sg.slope == 5.0 and sg.intercept == 100.0
    assert ts.slope > 20  # dragged far off the clean majority's line


def test_siegel_trend_per_anchor_replay(spark):
    """Per-anchor medians then median-of-medians vs a sequential replay
    with the same (slope, partner) / (ms, anchor) tiebreaks."""
    from datafusion_gpu_spark.operators.events import siegel_trend

    pts = [(1, 10), (2, 30), (4, 31), (7, 90), (11, 95), (13, 40)]
    got = siegel_trend(
        spark.createDataFrame(pts, "bucket long, v_c long")
    ).collect()[0]
    anchors = []
    for i, (xa, ya) in enumerate(pts):
        sl = sorted(
            ((yb - ya) / (xb - xa), xb)
            for j, (xb, yb) in enumerate(pts)
            if j != i
        )
        m = len(sl)
        anchors.append(
            ((sl[(m + 1) // 2 - 1][0] + sl[(m + 2) // 2 - 1][0]) / 2.0, xa)
        )
    anchors.sort()
    n = len(anchors)
    slope = (
        anchors[(n + 1) // 2 - 1][0] + anchors[(n + 2) // 2 - 1][0]
    ) / 2.0
    resid = sorted((y - slope * x, x) for x, y in pts)
    icpt = (resid[(n + 1) // 2 - 1][0] + resid[(n + 2) // 2 - 1][0]) / 2.0
    assert got.n_pairs == n * (n - 1) // 2 == 15
    assert got.slope == round(slope, 6)
    assert got.intercept == round(icpt, 6)


def test_logrank_invariances(spark):
    """Structural invariances of the log-rank family: (1) chi2 is
    invariant under any strictly increasing duration transform (only
    the event-time ORDER enters the folds); (2) swapping the group
    labels leaves chi2/variance unchanged and maps O1 to the
    complementary event count."""
    from datafusion_gpu_spark.operators.events import survival_logrank

    rows = _freireich_rows()
    base = survival_logrank(
        spark.createDataFrame(rows, "grp int, duration long, observed int")
    ).collect()[0]

    warped = [(g, 3 * t * t + 7, o) for g, t, o in rows]  # strictly increasing
    w = survival_logrank(
        spark.createDataFrame(warped, "grp int, duration long, observed int")
    ).collect()[0]
    assert (w.chi2_lr, w.var_lr, w.o1, w.e1) == (
        base.chi2_lr, base.var_lr, base.o1, base.e1
    )

    swapped = [(1 - g, t, o) for g, t, o in rows]
    sw = survival_logrank(
        spark.createDataFrame(swapped, "grp int, duration long, observed int")
    ).collect()[0]
    assert sw.chi2_lr == base.chi2_lr
    assert sw.o1 == 30 - base.o1  # total events - original O1
    assert sw.reject_05 == base.reject_05


def test_cox_group_swap_negates_beta(spark):
    """Swapping the covariate labels must negate beta (HR inverts) —
    the Newton path is symmetric because r_t(b) for swapped groups
    equals 1 - r_t(-b); quantization is sign-symmetric, so the rounded
    fits mirror exactly on this data."""
    from datafusion_gpu_spark.operators.events import cox_ph_binary

    rows = _freireich_rows()
    base = cox_ph_binary(
        spark.createDataFrame(rows, "grp int, duration long, observed int")
    ).collect()[0]
    sw = cox_ph_binary(
        spark.createDataFrame(
            [(1 - g, t, o) for g, t, o in rows],
            "grp int, duration long, observed int",
        )
    ).collect()[0]
    assert abs(sw.beta + base.beta) < 2e-6
    assert abs(sw.hazard_ratio * base.hazard_ratio - 1.0) < 2e-5
    assert sw.reject_05 == base.reject_05


def test_theil_sen_affine_equivariance(spark):
    """Integer affine equivariance: y -> a*y + b maps slope -> a*slope
    and intercept -> a*intercept + b EXACTLY (pair slopes scale by the
    integer a before any rounding; residual medians shift by b)."""
    from datafusion_gpu_spark.operators.events import theil_sen_trend

    pts = [(1, 10), (2, 30), (4, 31), (7, 90), (11, 95), (13, 40)]
    base = theil_sen_trend(
        spark.createDataFrame(pts, "bucket long, v_c long")
    ).collect()[0]
    aff = theil_sen_trend(
        spark.createDataFrame(
            [(x, 3 * y + 500) for x, y in pts], "bucket long, v_c long"
        )
    ).collect()[0]
    assert aff.slope == round(3 * base.slope, 6)
    assert aff.intercept == round(3 * base.intercept + 500, 6)


def test_life_table_censor_shift_within_interval_invariant(spark):
    """The actuarial convention only counts WHICH interval a censoring
    lands in — moving a censor time within its 12h interval changes
    nothing."""
    from datafusion_gpu_spark.operators.events import life_table

    rows = [(3, 1), (7, 1), (5, 0), (11, 0), (15, 1), (30, 0)]
    moved = [(3, 1), (7, 1), (1, 0), (6, 0), (15, 1), (35, 0)]
    a = life_table(
        spark.createDataFrame(rows, "duration long, observed int"), width=12
    ).collect()
    b = life_table(
        spark.createDataFrame(moved, "duration long, observed int"), width=12
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_survival_logrank_k4_adjugate_replay(spark):
    """The m = 3 (k = 4) closed-form 3x3 adjugate path, untested by the
    k=2/k=3 cases: four arms with distinct hazard profiles vs an
    independent replay that inverts the summed covariance with
    numpy-free cofactor arithmetic under the same 1e-9 quantization;
    plus the identical-arms zero and a 4-arm single-death hand case
    (E_j = n_j/n, V from the multivariate hypergeometric)."""
    from decimal import ROUND_HALF_UP, Decimal

    from datafusion_gpu_spark.operators.events import survival_logrank_k

    def rhu(x):
        return int(Decimal(x).quantize(Decimal(1), rounding=ROUND_HALF_UP))

    rows = []
    for j in range(4):
        for i in range(15):
            t = 1 + (5 * i + 2 * j * i + j * j) % 19 + 3 * j
            rows.append((j, t, 1 if (i + j) % 5 else 0))
    df = spark.createDataFrame(rows, "grp int, duration long, observed int")
    got = survival_logrank_k(df, 4).collect()[0]
    assert got.n_groups == 4 and got.df == 3 and got.n_subjects == 60

    per_t = {}
    for g, t, o in rows:
        e = per_t.setdefault(t, [[0, 0] for _ in range(4)])
        e[g][0] += o
        e[g][1] += 1 - o
    times = sorted(per_t)
    n = [0] * 4
    suf = {}
    for t in reversed(times):
        for j in range(4):
            n[j] += sum(per_t[t][j])
        suf[t] = tuple(n)
    o = [0] * 4
    se = [0] * 4  # quantized E sums, index 1..3 used
    sv = [[0] * 4 for _ in range(4)]
    ot = 0
    for t in times:
        d_j = [per_t[t][j][0] for j in range(4)]
        d = sum(d_j)
        if d == 0:
            continue
        nj = suf[t]
        nr = sum(nj)
        nf = float(nr)
        ot += d
        tail = (nf - d) / (nf - 1.0) if nr > 1 else 0.0
        for j in range(1, 4):
            o[j] += d_j[j]
            se[j] += rhu(1e9 * (float(d) * nj[j] / nf))
            for l in range(j, 4):
                if nr <= 1:
                    continue
                if j == l:
                    v = float(d) * (nj[j] / nf) * ((nr - nj[j]) / nf) * tail
                else:
                    v = -(float(d) * (nj[j] / nf) * (nj[l] / nf) * tail)
                sv[j][l] += rhu(1e9 * v)
    z = [0.0] + [o[j] - se[j] / 1e9 for j in range(1, 4)]
    V = [[0.0] * 4 for _ in range(4)]
    for j in range(1, 4):
        for l in range(j, 4):
            V[j][l] = V[l][j] = sv[j][l] / 1e9
    # cofactors of the symmetric 3x3 (indices 1..3)
    c11 = V[2][2] * V[3][3] - V[2][3] * V[2][3]
    c12 = V[1][3] * V[2][3] - V[1][2] * V[3][3]
    c13 = V[1][2] * V[2][3] - V[1][3] * V[2][2]
    c22 = V[1][1] * V[3][3] - V[1][3] * V[1][3]
    c23 = V[1][3] * V[1][2] - V[1][1] * V[2][3]
    c33 = V[1][1] * V[2][2] - V[1][2] * V[1][2]
    det = V[1][1] * c11 + V[1][2] * c12 + V[1][3] * c13
    quad = (
        z[1] * z[1] * c11 + z[2] * z[2] * c22 + z[3] * z[3] * c33
        + 2.0 * z[1] * z[2] * c12
        + 2.0 * z[1] * z[3] * c13
        + 2.0 * z[2] * z[3] * c23
    )
    chi2 = quad / det
    assert got.o_total == ot
    assert got.chi2_lr_k == round(chi2, 6)
    assert got.reject_05 == (chi2 > 7.814728)

    # identical 4 arms: chi2 exactly 0
    prof = [(2, 1), (3, 1), (5, 0), (7, 1), (11, 0)]
    same = survival_logrank_k(
        spark.createDataFrame(
            [(g, t, o) for g in range(4) for t, o in prof],
            "grp int, duration long, observed int",
        ),
        4,
    ).collect()[0]
    assert same.chi2_lr_k == 0.0 and same.reject_05 is False

    # 4-arm single death at t=1 with n = (2, 2, 2, 4): z = -(E_1..3)
    # = -(1/5, 1/5, 2/5); V diag d*(nj/n)((n-nj)/n), offdiag -(nj*nl/n^2)
    rows4 = (
        [(0, 1, 1), (0, 9, 0)]
        + [(1, 9, 0)] * 2
        + [(2, 9, 0)] * 2
        + [(3, 9, 0)] * 4
    )
    one = survival_logrank_k(
        spark.createDataFrame(rows4, "grp int, duration long, observed int"),
        4,
    ).collect()[0]
    assert one.o_total == 1 and one.n_subjects == 10
    assert one.chi2_lr_k is not None and one.reject_05 is False


# ---------------------------------------------------------------------------
# Round 14: Schoenfeld-residual PH check (Grambsch & Therneau 1994)
# ---------------------------------------------------------------------------
def _gt_zph_reference(rows, iters=5):
    """Independent numpy spelling of the binary-covariate Cox fit +
    Grambsch-Therneau score test (no quantization — the operator's
    1e-9 per-term quantization keeps it within 1e-6 of this): the
    external-reference plant the cross-engine oracle cannot replace
    (it would agree with a shared-spelling bug; SURVEY §23 method
    note)."""
    import math
    from collections import defaultdict

    per = defaultdict(lambda: [0, 0, 0, 0])
    for g, t, o in rows:
        per[t][(0 if g == 1 else 2) + (1 - o)] += 1
    times = sorted(per)
    n1 = n0 = 0
    suf = {}
    for t in reversed(times):
        d1, c1, d0, c0 = per[t]
        n1 += d1 + c1
        n0 += d0 + c0
        suf[t] = (n1, n0)
    ev = [
        (t, per[t][0], per[t][0] + per[t][2], *suf[t])
        for t in times
        if per[t][0] + per[t][2] > 0
    ]
    b = 0.0
    for _ in range(iters):
        u = i = 0.0
        for t, d1, d, m1, m0 in ev:
            rr = m1 * math.exp(b) / (m1 * math.exp(b) + m0)
            u += d1 - d * rr
            i += d * rr * (1 - rr)
        if i > 0:
            b += u / i
    tmin, tmax = ev[0][0], ev[-1][0]
    ss = sv = sgs = sgv = sg2v = 0.0
    for t, d1, d, m1, m0 in ev:
        rr = m1 * math.exp(b) / (m1 * math.exp(b) + m0)
        s, v = d1 - d * rr, d * rr * (1 - rr)
        g = (t - tmin) / (tmax - tmin) if tmax > tmin else 0.0
        ss += s
        sv += v
        sgs += g * s
        sgv += g * v
        sg2v += g * g * v
    u_theta = sgs - sgv * ss / sv
    var_theta = sg2v - sgv * sgv / sv
    chi2 = u_theta * u_theta / var_theta if var_theta > 0 else None
    return b, u_theta, var_theta, chi2


def test_schoenfeld_ph_numpy_reference(spark):
    """Mixed-censoring two-cohort data: the operator must land on the
    independent numpy GT statistic to 1e-5 on every output."""
    from datafusion_gpu_spark.operators.events import cox_schoenfeld_ph

    rows = [
        (1, 2, 1), (1, 3, 1), (1, 3, 0), (1, 5, 1), (1, 8, 0),
        (1, 9, 1), (1, 12, 1), (1, 15, 0), (0, 1, 1), (0, 2, 1),
        (0, 4, 1), (0, 4, 1), (0, 6, 0), (0, 7, 1), (0, 11, 1),
        (0, 14, 0), (0, 16, 1),
    ]
    got = cox_schoenfeld_ph(
        spark.createDataFrame(rows, "grp int, duration long, observed int")
    ).collect()[0]
    b, u, var, chi2 = _gt_zph_reference(rows)
    assert got.n_events == 12
    assert abs(got.beta - b) <= 1e-5
    assert abs(got.u_theta - u) <= 1e-5
    assert abs(got.var_theta - var) <= 1e-5
    assert abs(got.chi2_ph - chi2) <= 1e-4
    assert got.reject_05 == (chi2 > 3.841459)


def test_schoenfeld_ph_violation_fires(spark):
    """Crossing hazards (cohort 1 fails first, cohort 0 later, both
    with late-censored survivors keeping the risk sets informative):
    the GT trend is strongly negative and the check FIRES. The
    time-symmetric null (one failure per cohort per time) scores
    u_theta = chi2 = 0 and does not."""
    from datafusion_gpu_spark.operators.events import cox_schoenfeld_ph

    crossing = (
        [(1, t, 1) for t in range(1, 11)]
        + [(0, t, 1) for t in range(11, 21)]
        + [(1, 30, 0)] * 8
        + [(0, 30, 0)] * 8
    )
    hot = cox_schoenfeld_ph(
        spark.createDataFrame(crossing, "grp int, duration long, observed int")
    ).collect()[0]
    _, u, var, chi2 = _gt_zph_reference(crossing)
    assert hot.reject_05 is True and hot.chi2_ph > 3.841459
    assert abs(hot.chi2_ph - chi2) <= 1e-4

    null_rows = (
        [(1, t, 1) for t in range(1, 11)]
        + [(0, t, 1) for t in range(1, 11)]
        + [(1, 15, 0)] * 3
        + [(0, 15, 0)] * 3
    )
    cold = cox_schoenfeld_ph(
        spark.createDataFrame(null_rows, "grp int, duration long, observed int")
    ).collect()[0]
    assert cold.reject_05 is False
    assert cold.u_theta == 0.0 and cold.chi2_ph == 0.0
    # signed-zero normalization: +0.0, never -0.0, on the exact-null row
    import math
    assert not math.copysign(1.0, cold.u_theta) < 0


def test_schoenfeld_beta_matches_cox(spark):
    """Cross-query invariance: the diagnostic evaluates at the SAME
    converged beta the fit reports (Freireich 6-MP)."""
    from datafusion_gpu_spark.operators.events import (
        cox_ph_binary,
        cox_schoenfeld_ph,
    )

    df = spark.createDataFrame(
        _freireich_rows(), "grp int, duration long, observed int"
    )
    fit = cox_ph_binary(df).collect()[0]
    diag = cox_schoenfeld_ph(df).collect()[0]
    assert diag.beta == fit.beta
    assert diag.n_events == fit.n_events
    # the 6-MP trial satisfies PH (the published zph p is ~0.9)
    assert diag.reject_05 is False


def test_schoenfeld_degenerate_one_cohort(spark):
    """One cohort empty: every v_t = 0, so var_theta = 0 and the
    chi2/reject outputs go NULL through the guard instead of dividing
    by zero."""
    from datafusion_gpu_spark.operators.events import cox_schoenfeld_ph

    rows = [(1, t, 1) for t in range(1, 8)] + [(1, 9, 0)] * 2
    got = cox_schoenfeld_ph(
        spark.createDataFrame(rows, "grp int, duration long, observed int")
    ).collect()[0]
    assert got.chi2_ph is None and got.reject_05 is None
