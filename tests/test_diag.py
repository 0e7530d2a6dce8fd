"""Closed-form / planted / brute-force tests for the round-13
second-wave diagnostics family (queries/pipeline_diag.py, the graph
additions, and the streaming Jarque-Bera twin).

Every test either (a) plants a table whose statistic is known in closed
form, (b) brute-forces the statistic in numpy/pandas from the same
parquet the query reads, replicating the documented quantization
spelling, or (c) pins a stream==batch identity — the established test
strategy (SURVEY §5)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from tests.conftest import SF_DIR


# ---------------------------------------------------------------------------
# Jarque-Bera
# ---------------------------------------------------------------------------
def test_jarque_bera_matches_numpy(spark, duck):
    from datafusion_gpu_spark.queries.pipeline import _agg_jarque_bera

    rows = {r.event_type: r for r in _agg_jarque_bera(spark, SF_DIR).collect()}
    df = duck.execute(
        "SELECT event_type, CAST(ROUND(value, 0) AS BIGINT) AS d "
        "FROM events WHERE value IS NOT NULL"
    ).df()
    for g, sub in df.groupby("event_type"):
        d = sub.d.to_numpy().astype(float)
        n = len(d)
        m2 = ((d - d.mean()) ** 2).mean()
        g1 = ((d - d.mean()) ** 3).mean() / m2**1.5
        g2 = ((d - d.mean()) ** 4).mean() / m2**2 - 3
        jb = n * (g1**2 / 6 + g2**2 / 24)
        r = rows[g]
        assert r.n == n
        assert abs(r.skewness - g1) < 1e-4
        assert abs(r.excess_kurtosis - g2) < 1e-4
        assert abs(r.jb - jb) < max(1e-3, abs(jb) * 1e-6)
        assert r.reject_normal_05 == (jb > 5.991465)


def test_jarque_bera_planted_degenerate(spark):
    # one distinct value -> m2 = 0 -> NULL moments, NULL decision
    from datafusion_gpu_spark.queries.pipeline import _JARQUE_BERA

    df = spark.createDataFrame(
        [("click", 7.0)] * 5, "event_type string, value double"
    )
    df.createOrReplaceTempView("events")
    try:
        [row] = spark.sql(_JARQUE_BERA).collect()
    finally:
        spark.catalog.dropTempView("events")
    assert row.n == 5
    assert row.skewness is None and row.jb is None
    assert row.reject_normal_05 is None


# ---------------------------------------------------------------------------
# G-test
# ---------------------------------------------------------------------------
def test_g_test_matches_numpy(spark, duck):
    from datafusion_gpu_spark.queries.pipeline import _agg_g_test

    [row] = _agg_g_test(spark, SF_DIR).collect()
    obs = duck.execute(
        "SELECT o_orderpriority AS r, o_orderstatus AS c, COUNT(*) AS o "
        "FROM orders GROUP BY 1, 2"
    ).df()
    piv = obs.pivot_table(index="r", columns="c", values="o", fill_value=0)
    o = piv.to_numpy().astype(float)
    n = o.sum()
    rt = o.sum(axis=1, keepdims=True)
    ct = o.sum(axis=0, keepdims=True)
    nz = o > 0
    # G = 2 sum o*ln(o*n/(rt*ct)) over nonzero cells
    g_ref = 2 * (o[nz] * np.log(
        o[nz] * n
        / (np.broadcast_to(rt, o.shape) * np.broadcast_to(ct, o.shape))[nz]
    )).sum()
    assert row.df == (o.shape[0] - 1) * (o.shape[1] - 1)
    assert abs(row.g_stat - g_ref) < 1e-3


def test_g_test_planted_independent(spark):
    # exp == obs in every cell -> each ln term is ln(1) = 0 -> G == 0.0
    from datafusion_gpu_spark.queries.pipeline import _G_TEST

    rows = []
    for r, rw in (("1-URGENT", 2), ("2-HIGH", 3)):
        for c, cw in (("F", 4), ("O", 1)):
            rows += [(r, c)] * (rw * cw)
    df = spark.createDataFrame(rows, "o_orderpriority string, o_orderstatus string")
    df.createOrReplaceTempView("orders")
    try:
        [row] = spark.sql(_G_TEST).collect()
    finally:
        spark.catalog.dropTempView("orders")
    assert row.df == 1 and row.g_stat == 0.0


# ---------------------------------------------------------------------------
# Cochran-Armitage
# ---------------------------------------------------------------------------
def test_cochran_armitage_planted_monotone(spark):
    # shares rise 10% -> 50% across five levels of 10 trials each; the
    # statistic is hand-computable: T = sum w*r - R*sum w*n / N
    from datafusion_gpu_spark.queries.pipeline import _COCHRAN_ARMITAGE

    rows = []
    cases = {1: 1, 2: 2, 3: 3, 4: 4, 5: 5}
    for w, r in cases.items():
        pr = f"{w}-LEVEL"
        rows += [(pr, "F")] * r + [(pr, "O")] * (10 - r)
    df = spark.createDataFrame(rows, "o_orderpriority string, o_orderstatus string")
    df.createOrReplaceTempView("orders")
    try:
        [row] = spark.sql(_COCHRAN_ARMITAGE).collect()
    finally:
        spark.catalog.dropTempView("orders")
    n, rt = 50, 15
    swr = sum(w * r for w, r in cases.items())  # 55
    swn = sum(w * 10 for w in cases)  # 150
    sw2n = sum(w * w * 10 for w in cases)  # 550
    t = swr - rt * swn / n
    var = (rt / n) * (1 - rt / n) * (sw2n - swn**2 / n)
    assert row.n_levels == 5 and row.n_total == n and row.n_cases == rt
    assert abs(row.trend_t - t) < 1e-9
    assert abs(row.z - t / np.sqrt(var)) < 1e-6
    assert bool(row.reject_05) == (abs(t / np.sqrt(var)) > 1.959964)


def test_cochran_armitage_planted_flat_is_zero(spark):
    # identical shares at every level -> T == 0 exactly
    from datafusion_gpu_spark.queries.pipeline import _COCHRAN_ARMITAGE

    rows = []
    for w in range(1, 6):
        pr = f"{w}-LEVEL"
        rows += [(pr, "F")] * 3 + [(pr, "O")] * 7
    df = spark.createDataFrame(rows, "o_orderpriority string, o_orderstatus string")
    df.createOrReplaceTempView("orders")
    try:
        [row] = spark.sql(_COCHRAN_ARMITAGE).collect()
    finally:
        spark.catalog.dropTempView("orders")
    assert row.trend_t == 0.0 and row.z == 0.0 and row.reject_05 is False


# ---------------------------------------------------------------------------
# Fleiss' kappa
# ---------------------------------------------------------------------------
def _plant_events_panel(spark, panels):
    """panels: list of per-user event_type triples."""
    rows = []
    eid = 0
    for uid, types in enumerate(panels):
        for j, t in enumerate(types):
            rows.append((eid, uid, f"2024-01-01 00:{j:02d}:00", t, 1.0))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string, value double"
    ).selectExpr(
        "event_id", "user_id", "CAST(ts AS TIMESTAMP) AS ts", "event_type", "value"
    )
    df.createOrReplaceTempView("events")


def test_fleiss_kappa_perfect_agreement(spark):
    from datafusion_gpu_spark.queries.pipeline import _FLEISS_KAPPA

    _plant_events_panel(
        spark, [["click"] * 3, ["view"] * 3, ["error"] * 3, ["click"] * 3]
    )
    try:
        [row] = spark.sql(_FLEISS_KAPPA).collect()
    finally:
        spark.catalog.dropTempView("events")
    assert row.n_subjects == 4 and row.p_bar == 1.0
    assert row.kappa == 1.0


def test_fleiss_kappa_matches_formula(spark):
    from datafusion_gpu_spark.queries.pipeline import _FLEISS_KAPPA

    panels = [
        ["click", "click", "view"],
        ["view", "view", "view"],
        ["click", "error", "view"],
        ["error", "error", "click"],
        ["click", "click", "click"],
        ["view", "click", "view"],
    ]
    _plant_events_panel(spark, panels)
    try:
        [row] = spark.sql(_FLEISS_KAPPA).collect()
    finally:
        spark.catalog.dropTempView("events")
    cats = sorted({t for p in panels for t in p})
    nij = np.array([[p.count(c) for c in cats] for p in panels], dtype=float)
    n_sub, n_rat = nij.shape[0], 3
    p_i = ((nij**2).sum(axis=1) - n_rat) / (n_rat * (n_rat - 1))
    p_bar = p_i.mean()
    p_j = nij.sum(axis=0) / (n_sub * n_rat)
    p_e = (p_j**2).sum()
    kappa = (p_bar - p_e) / (1 - p_e)
    assert row.n_subjects == n_sub
    # outputs are ROUND(...,6) -> compare on the 6dp grid
    assert abs(row.p_bar - p_bar) < 1e-6
    assert abs(row.p_e - p_e) < 1e-6
    assert abs(row.kappa - kappa) < 1e-6


def test_fleiss_kappa_short_users_excluded(spark):
    # users with < 3 events contribute nothing (not partial panels)
    from datafusion_gpu_spark.queries.pipeline import _FLEISS_KAPPA

    _plant_events_panel(spark, [["click"] * 3, ["view"] * 2, ["error"]])
    try:
        [row] = spark.sql(_FLEISS_KAPPA).collect()
    finally:
        spark.catalog.dropTempView("events")
    assert row.n_subjects == 1


# ---------------------------------------------------------------------------
# Somers' D (brute force over the purchase pairs)
# ---------------------------------------------------------------------------
def test_somers_d_matches_bruteforce(spark, duck):
    from datafusion_gpu_spark.queries.pipeline import _agg_somers_d

    [row] = _agg_somers_d(spark, SF_DIR).collect()
    df = duck.execute(
        "SELECT CAST(hour(ts) AS BIGINT) AS h, "
        "CAST(ROUND(value * 100) AS BIGINT) AS v FROM events "
        "WHERE event_type = 'purchase' AND value IS NOT NULL"
    ).df()
    h = df.h.to_numpy()
    v = df.v.to_numpy()
    n = len(h)
    sh = np.sign(h[:, None] - h[None, :])
    sv = np.sign(v[:, None] - v[None, :])
    prod = sh * sv
    iu = np.triu_indices(n, 1)
    nc = int((prod[iu] > 0).sum())
    nd = int((prod[iu] < 0).sum())
    tx = int((sh[iu] == 0).sum())
    ty = int((sv[iu] == 0).sum())
    n0 = n * (n - 1) // 2
    assert row.nc == nc and row.nd == nd
    assert row.pairs_x_untied == n0 - tx
    assert row.pairs_y_untied == n0 - ty
    assert abs(row.d_yx - (nc - nd) / (n0 - tx)) < 1e-6
    assert abs(row.d_xy - (nc - nd) / (n0 - ty)) < 1e-6


# ---------------------------------------------------------------------------
# Kendall's W
# ---------------------------------------------------------------------------
def test_kendall_w_matches_bruteforce(spark, duck):
    from datafusion_gpu_spark.queries.pipeline import _agg_kendall_w

    [row] = _agg_kendall_w(spark, SF_DIR).collect()
    df = duck.execute(
        "SELECT event_type AS g, CAST(hour(ts) AS BIGINT) AS h, "
        "SUM(CAST(ROUND(value * 100) AS BIGINT)) AS v FROM events "
        "WHERE value IS NOT NULL GROUP BY 1, 2"
    ).df()
    judges = sorted(df.g.unique())
    grid = np.zeros((len(judges), 24))
    for _, r in df.iterrows():
        grid[judges.index(r.g), int(r.h)] = r.v
    ranks = np.vstack(
        [pd.Series(grid[j]).rank(method="average").to_numpy()
         for j in range(len(judges))]
    )
    m, n = ranks.shape
    r_i = ranks.sum(axis=0)
    s = ((r_i - r_i.mean()) ** 2).sum()
    sum_t = 0.0
    for j in range(m):
        _, cnt = np.unique(grid[j], return_counts=True)
        sum_t += (cnt**3 - cnt).sum()
    w = 12 * s / (m**2 * (n**3 - n) - m * sum_t)
    assert row.m_judges == m and row.n_items == n
    assert abs(row.w_concordance - w) < 1e-6
    assert abs(row.chi2_w - m * (n - 1) * w) < 1e-4


def test_kendall_w_perfect_agreement_is_one(spark):
    # every judge ranks the hours identically (distinct volumes) -> W = 1
    from datafusion_gpu_spark.queries.pipeline import _KENDALL_W

    rows = []
    eid = 0
    for t in ("click", "view", "error"):
        for hod in range(24):
            # one event per (type, hour), value strictly increasing in hour
            rows.append(
                (eid, 1, f"2024-01-01 {hod:02d}:30:00", t, float(hod + 1))
            )
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string, value double"
    ).selectExpr(
        "event_id", "user_id", "CAST(ts AS TIMESTAMP) AS ts", "event_type", "value"
    )
    df.createOrReplaceTempView("events")
    try:
        [row] = spark.sql(_KENDALL_W).collect()
    finally:
        spark.catalog.dropTempView("events")
    assert row.m_judges == 3 and row.w_concordance == 1.0
    assert row.reject_05 is True


# ---------------------------------------------------------------------------
# Dunn post-hoc
# ---------------------------------------------------------------------------
def test_dunn_posthoc_matches_bruteforce(spark, duck):
    from datafusion_gpu_spark.queries.pipeline import _agg_dunn_posthoc

    rows = _agg_dunn_posthoc(spark, SF_DIR).collect()
    df = duck.execute(
        "SELECT event_type AS g, CAST(ROUND(value * 100) AS BIGINT) AS c "
        "FROM events WHERE value IS NOT NULL"
    ).df()
    ranks = df.c.rank(method="average")
    n = len(df)
    _, cnt = np.unique(df.c.to_numpy(), return_counts=True)
    tie3 = float((cnt**3 - cnt).sum())
    sig2 = n * (n + 1) / 12 - tie3 / (12 * (n - 1))
    means = {g: ranks[df.g == g].mean() for g in df.g.unique()}
    sizes = {g: int((df.g == g).sum()) for g in df.g.unique()}
    assert len(rows) == 10
    for r in rows:
        z_ref = (means[r.g1] - means[r.g2]) / np.sqrt(
            sig2 * (1 / sizes[r.g1] + 1 / sizes[r.g2])
        )
        assert abs(r.z - z_ref) < 1e-5, (r.g1, r.g2)
    # BH step-up semantics: the rejected set is exactly ranks <= k*
    ps = sorted((r.p_rank, r.p_value, bool(r.rejected)) for r in rows)
    m = len(ps)
    kstar = max(
        (rk for rk, p, _ in ps if p <= 0.05 * rk / m + 5e-7), default=None
    )
    for rk, _, rej in ps:
        if kstar is None:
            assert not rej
        else:
            assert rej == (rk <= kstar)


# ---------------------------------------------------------------------------
# Average precision / log loss
# ---------------------------------------------------------------------------
def test_average_precision_unique_scores_classical(spark):
    # distinct scores -> blocked AP == classical AP (hand-computed):
    # labels by descending score: 1,0,1,1,0 -> AP = (1 + 2/3 + 3/4)/3
    from datafusion_gpu_spark.queries.pipeline import _AVG_PRECISION

    rows = [
        (1, "purchase", 5.00),
        (2, "click", 4.00),
        (3, "purchase", 3.00),
        (4, "purchase", 2.00),
        (5, "click", 1.00),
    ]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    df.createOrReplaceTempView("events")
    try:
        [row] = spark.sql(_AVG_PRECISION).collect()
    finally:
        spark.catalog.dropTempView("events")
    ap = (1 + 2 / 3 + 3 / 4) / 3
    assert row.n_pos == 3 and row.n_neg == 2
    assert abs(row.average_precision - ap) < 1e-6
    assert abs(row.prevalence_baseline - 0.6) < 1e-9


def test_average_precision_matches_bruteforce(spark, duck):
    from datafusion_gpu_spark.queries.pipeline import _agg_average_precision

    [row] = _agg_average_precision(spark, SF_DIR).collect()
    df = duck.execute(
        "SELECT CAST(ROUND(value * 100) AS BIGINT) AS c, "
        "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos "
        "FROM events WHERE event_type IN ('click', 'purchase') "
        "AND value IS NOT NULL"
    ).df()
    blocks = (
        df.groupby("c")
        .agg(dp=("pos", "sum"), tc=("pos", "size"))
        .sort_index(ascending=False)
    )
    cump = blocks.dp.cumsum()
    cumt = blocks.tc.cumsum()
    ap = float((blocks.dp * cump / cumt).sum() / blocks.dp.sum())
    assert abs(row.average_precision - ap) < 1e-6


def test_log_loss_matches_numpy(spark, duck):
    from datafusion_gpu_spark.queries.pipeline import _agg_log_loss

    [row] = _agg_log_loss(spark, SF_DIR).collect()
    df = duck.execute(
        "SELECT CAST(ROUND(value * 100) AS BIGINT) AS c, "
        "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos "
        "FROM events WHERE event_type IN ('click', 'purchase') "
        "AND value IS NOT NULL"
    ).df()
    p = np.clip(df.c.to_numpy() / 50000.0, 1e-6, 1 - 1e-6)
    y = df.pos.to_numpy()
    ll = -(y * np.log(p) + (1 - y) * np.log(1 - p)).mean()
    assert row.n == len(df)
    assert abs(row.log_loss - ll) < 1e-6


# ---------------------------------------------------------------------------
# Ljung-Box / KPSS / variance ratio (spelling replicated in numpy)
# ---------------------------------------------------------------------------
def _hourly(duck, quantum_sql):
    df = duck.execute(
        "SELECT event_type, date_trunc('hour', ts) AS b, "
        f"SUM(CAST(ROUND({quantum_sql}) AS BIGINT)) AS v "
        "FROM events WHERE value IS NOT NULL GROUP BY 1, 2 ORDER BY 1, 2"
    ).df()
    return {g: sub.v.to_numpy().astype(float) for g, sub in df.groupby("event_type")}


def test_ljung_box_matches_numpy(spark, duck):
    from datafusion_gpu_spark.queries.pipeline import _events_ljung_box

    rows = {r.event_type: r for r in _events_ljung_box(spark, SF_DIR).collect()}
    for g, v in _hourly(duck, "value * 100, 0").items():
        n = len(v)
        q = 0.0
        for k in (1, 2, 3):
            x, y = v[:-k], v[k:]
            r = np.corrcoef(x, y)[0, 1]
            q += r * r / (n - k)
        q *= n * (n + 2)
        assert rows[g].n_buckets == n
        assert abs(rows[g].q_ljung_box - q) < max(1e-4, q * 1e-6)
        assert rows[g].reject_white_noise_05 == (q > 7.814728)


def test_kpss_matches_numpy_spelling(spark, duck):
    from datafusion_gpu_spark.queries.pipeline import _events_kpss

    rows = {r.event_type: r for r in _events_kpss(spark, SF_DIR).collect()}
    for g, v in _hourly(duck, "value, 0").items():
        n = len(v)
        s = v.sum()
        eq = np.round((n * v - s) / n)
        p = eq.cumsum()
        sg = [float((eq[k:] * eq[: n - k if k else n]).sum()) for k in range(5)]
        l5 = 5 * sg[0] + 2 * (4 * sg[1] + 3 * sg[2] + 2 * sg[3] + sg[4])
        eta = 5 * (p**2).sum() / (n * l5)
        assert rows[g].n_buckets == n
        assert abs(rows[g].kpss_eta - eta) < 1e-5
        assert rows[g].reject_level_stationary_05 == (eta > 0.463)


def test_kpss_planted_trend_rejects(spark):
    # a strongly trending hourly series is the textbook KPSS rejection
    from datafusion_gpu_spark.queries.pipeline import _KPSS

    rows = [
        (i, 1, f"2024-01-{1 + i // 24:02d} {i % 24:02d}:15:00", "click",
         float(10 * i + 5))
        for i in range(240)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string, value double"
    ).selectExpr(
        "event_id", "user_id", "CAST(ts AS TIMESTAMP) AS ts", "event_type", "value"
    )
    df.createOrReplaceTempView("events")
    try:
        [row] = spark.sql(_KPSS).collect()
    finally:
        spark.catalog.dropTempView("events")
    assert row.n_buckets == 240
    assert row.reject_level_stationary_05 is True


def test_variance_ratio_matches_numpy_spelling(spark, duck):
    from datafusion_gpu_spark.queries.pipeline import _events_variance_ratio

    rows = {
        r.event_type: r for r in _events_variance_ratio(spark, SF_DIR).collect()
    }
    for g, v in _hourly(duck, "value, 0").items():
        n = len(v)
        mu = (v[-1] - v[0]) / (n - 1)
        d1 = v[1:] - v[:-1]
        d4 = v[4:] - v[:-4]
        var1 = ((d1 - mu) ** 2).sum() / len(d1)
        varq = ((d4 - 4 * mu) ** 2).sum() / (4 * len(d4))
        vr = varq / var1
        z = (vr - 1) / np.sqrt(2 * (2 * 4 - 1) * (4 - 1) / (3 * 4 * n))
        assert abs(rows[g].vr_4 - vr) < 1e-5
        assert abs(rows[g].z_homosked - z) < 1e-4


def test_classical_decomp_recovers_planted_seasonality(spark):
    # linear trend + exact hour-of-day pattern: the centered 24-MA kills
    # the trend exactly (it is linear), so the seasonal indices recover
    # the planted pattern up to its own mean
    from datafusion_gpu_spark.queries.pipeline import _CLASSICAL_DECOMP

    pattern = [float((h % 6) * 12) for h in range(24)]
    rows = []
    for i in range(24 * 10):
        val = 2.0 * i + pattern[i % 24]
        rows.append(
            (i, 1, f"2024-01-{1 + i // 24:02d} {i % 24:02d}:40:00", "view",
             val / 100.0)
        )
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string, value double"
    ).selectExpr(
        "event_id", "user_id", "CAST(ts AS TIMESTAMP) AS ts", "event_type", "value"
    )
    df.createOrReplaceTempView("events")
    try:
        out = spark.sql(_CLASSICAL_DECOMP).collect()
    finally:
        spark.catalog.dropTempView("events")
    centered = np.array(pattern) - np.mean(pattern)
    got = {r.hod: r.seasonal_cents for r in out}
    assert len(got) == 24
    for h in range(24):
        assert abs(got[h] - centered[h]) < 0.75, h


# ---------------------------------------------------------------------------
# Harrell's C
# ---------------------------------------------------------------------------
def test_harrell_c_matches_bruteforce(spark, duck):
    from datafusion_gpu_spark.queries.pipeline import _events_harrell_c

    [row] = _events_harrell_c(spark, SF_DIR).collect()
    df = duck.execute(
        """
        WITH life AS (
          SELECT user_id, MIN(epoch_us(ts)) AS start,
                 MIN(CASE WHEN event_type = 'purchase'
                     THEN epoch_us(ts) END) AS fp,
                 MAX(epoch_us(ts)) AS last
          FROM events GROUP BY user_id)
        SELECT user_id % 2 AS grp,
               (COALESCE(fp, last) - start) // 3600000000 AS t,
               CASE WHEN fp IS NULL THEN 0 ELSE 1 END AS obs
        FROM life
        """
    ).df()
    grp = df.grp.to_numpy()
    t = df.t.to_numpy()
    obs = df.obs.to_numpy()
    conc = disc = tied = 0
    n = len(df)
    for i in range(n):
        if not obs[i]:
            continue
        later = (t > t[i]) | ((t == t[i]) & (obs == 0))
        hi = grp[later]
        if grp[i] == 1:
            conc += int((hi == 0).sum())
            tied += int((hi == 1).sum())
        else:
            disc += int((hi == 1).sum())
            tied += int((hi == 0).sum())
    assert row.n_subjects == n
    assert row.concordant == conc and row.discordant == disc
    assert row.tied_score == tied
    c_ref = (conc + tied / 2) / (conc + disc + tied)
    assert abs(row.c_index - c_ref) < 1e-6


# ---------------------------------------------------------------------------
# RSI
# ---------------------------------------------------------------------------
def test_rsi_hand_case(spark):
    # 15 daily closes alternating +2/-1 dollar steps: every 14-diff
    # window holds 7 gains of 200 cents and 7 losses of 100 cents ->
    # RSI = 100*1400/2100 = 66.666667
    from datafusion_gpu_spark.queries.pipeline import _RSI

    rows = []
    price = 50.0
    for d in range(15):
        price += 2.0 if d % 2 == 1 else (-1.0 if d else 0.0)
        rows.append((d, 1, f"2024-01-{d + 1:02d} 12:00:00", "purchase", price))
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string, value double"
    ).selectExpr(
        "event_id", "user_id", "CAST(ts AS TIMESTAMP) AS ts", "event_type", "value"
    )
    df.createOrReplaceTempView("events")
    try:
        out = spark.sql(_RSI).collect()
    finally:
        spark.catalog.dropTempView("events")
    assert len(out) == 1
    assert out[0].gain_cents_14 == 1400 and out[0].loss_cents_14 == 700
    assert abs(out[0].rsi_14 - 100 * 1400 / 2100) < 1e-6


# ---------------------------------------------------------------------------
# HITS / modularity (operator-level hand cases)
# ---------------------------------------------------------------------------
def test_hits_path_counts_hand_case(spark):
    # c1 -> {s1, s2}, c2 -> {s2}. One round: a1 = in-degree = (s1:1,
    # s2:2); h1 = out-fold of a1 = (c1: 1+2 = 3, c2: 2). Two rounds:
    # a2 = in-fold of h1 = (s1: 3, s2: 3+2 = 5).
    from datafusion_gpu_spark.operators import graph

    e = spark.createDataFrame(
        [("c1", "s1"), ("c1", "s2"), ("c2", "s2")], "src string, dst string"
    )
    out = {(r.side, r.node): r for r in graph.hits(e, iters=1).collect()}
    assert out[("authority", "s1")].raw == 1
    assert out[("authority", "s2")].raw == 2
    assert out[("hub", "c1")].raw == 3
    assert out[("hub", "c2")].raw == 2
    assert out[("authority", "s2")].score == 1.0
    assert abs(out[("authority", "s1")].score - 0.5) < 1e-9
    assert abs(out[("hub", "c2")].score - 2 / 3) < 1e-8
    out2 = {(r.side, r.node): r for r in graph.hits(e, iters=2).collect()}
    assert out2[("authority", "s1")].raw == 3
    assert out2[("authority", "s2")].raw == 5
    assert abs(out2[("authority", "s1")].score - 0.6) < 1e-9


def test_modularity_two_cliques_hand_case(spark):
    # two triangles joined by one bridge edge, labeled by triangle:
    # m = 7, each community: 3 internal edges, degree sum 7
    # contribution = 3/7 - (7/14)^2 = 3/7 - 1/4; Q = 2*(3/7 - 1/4) = 5/14
    from datafusion_gpu_spark.operators import graph

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)],
        "a long, b long",
    )
    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4), (6, 4)], "node long, label long"
    )
    out = {r.community: r for r in graph.partition_modularity(edges, labels).collect()}
    assert out[1].internal_edges == 3 and out[4].internal_edges == 3
    assert out[1].degree_sum == 7 and out[4].degree_sum == 7
    q = sum(r.contribution for r in out.values())
    assert abs(q - 5 / 14) < 1e-6


def test_modularity_trivial_partition_is_zero_ish(spark):
    # all nodes in ONE community: Q = m/m - (2m/2m)^2 = 0 exactly
    from datafusion_gpu_spark.operators import graph

    edges = spark.createDataFrame([(1, 2), (2, 3), (1, 3)], "a long, b long")
    labels = spark.createDataFrame(
        [(1, 9), (2, 9), (3, 9)], "node long, label long"
    )
    [row] = graph.partition_modularity(edges, labels).collect()
    assert row.internal_edges == 3 and row.contribution == 0.0


# ---------------------------------------------------------------------------
# streaming twin
# ---------------------------------------------------------------------------
def test_streaming_jarque_bera_matches_batch_exactly(spark):
    from datafusion_gpu_spark.queries.pipeline import (
        _agg_jarque_bera,
        _streaming_jarque_bera,
    )

    sf = "/root/testdata/sf0.001"
    batch = {r.event_type: tuple(r) for r in _agg_jarque_bera(spark, sf).collect()}
    stream = {
        r.event_type: tuple(r) for r in _streaming_jarque_bera(spark, sf).collect()
    }
    assert stream == batch and len(batch) == 5


# ---------------------------------------------------------------------------
# Welch ANOVA / Bartlett
# ---------------------------------------------------------------------------
def test_welch_anova_matches_numpy(spark, duck):
    from datafusion_gpu_spark.queries.pipeline import _agg_welch_anova

    [row] = _agg_welch_anova(spark, SF_DIR).collect()
    df = duck.execute(
        "SELECT event_type AS g, CAST(ROUND(value * 100, 0) AS BIGINT) AS c "
        "FROM events WHERE value IS NOT NULL"
    ).df()
    groups = [sub.c.to_numpy().astype(float) for _, sub in df.groupby("g")]
    groups = [x for x in groups if len(np.unique(x)) > 1 and len(x) > 1]
    k = len(groups)
    n = np.array([len(x) for x in groups], dtype=float)
    m = np.array([x.mean() for x in groups])
    v = np.array([x.var(ddof=1) for x in groups])
    w = n / v
    xw = (w * m).sum() / w.sum()
    a = (w * (m - xw) ** 2).sum() / (k - 1)
    h = ((1 - w / w.sum()) ** 2 / (n - 1)).sum()
    f_ref = a / (1 + 2 * (k - 2) / (k**2 - 1) * h)
    df2_ref = (k**2 - 1) / (3 * h)
    assert row.k_used == k and row.df1 == k - 1
    assert abs(row.f_welch - f_ref) < max(1e-3, abs(f_ref) * 1e-4)
    assert abs(row.df2 - df2_ref) < max(0.05, df2_ref * 1e-4)


def test_bartlett_matches_numpy(spark, duck):
    from datafusion_gpu_spark.queries.pipeline import _agg_bartlett

    [row] = _agg_bartlett(spark, SF_DIR).collect()
    df = duck.execute(
        "SELECT event_type AS g, CAST(ROUND(value * 100, 0) AS BIGINT) AS c "
        "FROM events WHERE value IS NOT NULL"
    ).df()
    groups = [sub.c.to_numpy().astype(float) for _, sub in df.groupby("g")]
    groups = [x for x in groups if len(np.unique(x)) > 1 and len(x) > 1]
    k = len(groups)
    n = np.array([len(x) for x in groups], dtype=float)
    v = np.array([x.var(ddof=1) for x in groups])
    nt = n.sum()
    sp2 = ((n - 1) * v).sum() / (nt - k)
    b = (nt - k) * np.log(sp2) - ((n - 1) * np.log(v)).sum()
    c = 1 + ((1 / (n - 1)).sum() - 1 / (nt - k)) / (3 * (k - 1))
    b_ref = b / c
    assert row.k_used == k and row.df == k - 1
    assert abs(row.bartlett_stat - b_ref) < max(1e-3, abs(b_ref) * 1e-5)
    assert row.reject_05 == (b_ref > 9.487729)


# ---------------------------------------------------------------------------
# Lin CCC / Bland-Altman
# ---------------------------------------------------------------------------
def _user_mean_pairs(duck):
    df = duck.execute(
        """
        SELECT CAST(ROUND(SUM(CASE WHEN event_type = 'click'
                 THEN CAST(ROUND(value * 100, 0) AS BIGINT) END)
               / CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END)
                      AS DOUBLE), 0) AS BIGINT) AS x,
               CAST(ROUND(SUM(CASE WHEN event_type = 'purchase'
                 THEN CAST(ROUND(value * 100, 0) AS BIGINT) END)
               / CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)
                      AS DOUBLE), 0) AS BIGINT) AS y
        FROM events WHERE value IS NOT NULL GROUP BY user_id
        HAVING COUNT(CASE WHEN event_type = 'click' THEN 1 END) > 0
           AND COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) > 0
        """
    ).df()
    return df.x.to_numpy().astype(float), df.y.to_numpy().astype(float)


def test_lin_ccc_matches_numpy(spark, duck):
    from datafusion_gpu_spark.queries.pipeline import _agg_lin_ccc

    [row] = _agg_lin_ccc(spark, SF_DIR).collect()
    x, y = _user_mean_pairs(duck)
    n = len(x)
    sxy = ((x - x.mean()) * (y - y.mean())).mean()
    ccc = 2 * sxy / (x.var() + y.var() + (x.mean() - y.mean()) ** 2)
    r = np.corrcoef(x, y)[0, 1]
    assert row.n_pairs == n
    assert abs(row.pearson_r - r) < 1e-5
    assert abs(row.ccc - ccc) < 1e-5


def test_bland_altman_matches_numpy(spark, duck):
    from datafusion_gpu_spark.queries.pipeline import _agg_bland_altman

    [row] = _agg_bland_altman(spark, SF_DIR).collect()
    x, y = _user_mean_pairs(duck)
    d = x - y
    bias = d.mean()
    sd = d.std(ddof=1)
    lo, hi = bias - 1.959964 * sd, bias + 1.959964 * sd
    assert row.n_pairs == len(d)
    assert abs(row.bias_cents - bias) < 1e-5
    assert abs(row.sd_cents - sd) < 1e-5
    assert row.n_outside == int(((d < lo) | (d > hi)).sum())


# ---------------------------------------------------------------------------
# Mann-Kendall / Page trend
# ---------------------------------------------------------------------------
def test_mann_kendall_matches_bruteforce(spark, duck):
    from datafusion_gpu_spark.queries.pipeline import _events_mann_kendall

    [row] = _events_mann_kendall(spark, SF_DIR).collect()
    df = duck.execute(
        "SELECT epoch_us(ts) // 3600000000 AS x, "
        "SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS y FROM events "
        "WHERE event_type = 'purchase' GROUP BY 1 ORDER BY 1"
    ).df()
    y = df.y.to_numpy()
    n = len(y)
    s = int(np.sign(y[None, :] - y[:, None])[np.triu_indices(n, 1)].sum())
    _, t = np.unique(y, return_counts=True)
    tcorr = int((t * (t - 1) * (2 * t + 5))[t > 1].sum())
    var_s = (n * (n - 1) * (2 * n + 5) - tcorr) / 18
    z = (s - np.sign(s)) / np.sqrt(var_s)
    assert row.n_buckets == n and row.s_mk == s
    assert abs(row.var_s - var_s) < 1e-6
    assert abs(row.z_mk - z) < 1e-6


def test_page_trend_planted_perfect_increase(spark):
    # every block strictly increasing -> per-block L = 14 (max for
    # k = 3), so L2 = 28m and z = sqrt(2m)
    from datafusion_gpu_spark.queries.pipeline import _PAGE_TREND

    rows = []
    eid = 0
    m = 50
    for uid in range(m):
        for j, day in enumerate(("05", "15", "25")):
            rows.append(
                (eid, uid, f"2024-01-{day} 10:00:00", "view",
                 float(j + 1) + uid * 0.0)
            )
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string, value double"
    ).selectExpr(
        "event_id", "user_id", "CAST(ts AS TIMESTAMP) AS ts", "event_type", "value"
    )
    df.createOrReplaceTempView("events")
    try:
        [row] = spark.sql(_PAGE_TREND).collect()
    finally:
        spark.catalog.dropTempView("events")
    assert row.n_blocks == m and row.l2 == 28 * m
    assert abs(row.z_page - np.sqrt(2 * m)) < 1e-6
    assert row.reject_increasing_05 is True


def test_page_trend_matches_bruteforce(spark, duck):
    from datafusion_gpu_spark.queries.pipeline import _events_page_trend

    [row] = _events_page_trend(spark, SF_DIR).collect()
    df = duck.execute(
        """
        SELECT user_id,
               CASE WHEN CAST(ts AS DATE) < DATE '2024-01-11' THEN 1
                    WHEN CAST(ts AS DATE) < DATE '2024-01-21' THEN 2
                    ELSE 3 END AS j,
               SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS v
        FROM events WHERE value IS NOT NULL GROUP BY 1, 2
        """
    ).df()
    full = df.groupby("user_id").filter(lambda g: len(g) == 3)
    l = 0.0
    for _, g in full.groupby("user_id"):
        g = g.sort_values("j")
        r = g.v.rank(method="average").to_numpy()
        l += (g.j.to_numpy() * r).sum()
    m = full.user_id.nunique()
    z = (l - 12 * m) / np.sqrt(2 * m)
    assert row.n_blocks == m and row.l2 == int(round(2 * l))
    assert abs(row.z_page - z) < 1e-5


# ---------------------------------------------------------------------------
# Uncertainty coefficient / GK lambda / Cohen's h
# ---------------------------------------------------------------------------
def test_uncertainty_coeff_matches_numpy(spark, duck):
    from datafusion_gpu_spark.queries.pipeline import _agg_uncertainty_coeff

    [row] = _agg_uncertainty_coeff(spark, SF_DIR).collect()
    obs = duck.execute(
        "SELECT o_orderpriority AS x, o_orderstatus AS y, COUNT(*) AS o "
        "FROM orders GROUP BY 1, 2"
    ).df()
    n = obs.o.sum()
    px = obs.groupby("x").o.sum() / n
    py = obs.groupby("y").o.sum() / n
    pxy = obs.o / n
    hx = -(px * np.log(px)).sum()
    hy = -(py * np.log(py)).sum()
    hxy = -(pxy * np.log(pxy)).sum()
    assert abs(row.h_x - hx) < 1e-5
    assert abs(row.h_y - hy) < 1e-5
    assert abs(row.h_xy - hxy) < 1e-5
    assert abs(row.u_y_given_x - (hx + hy - hxy) / hy) < 1e-5
    assert abs(row.u_x_given_y - (hx + hy - hxy) / hx) < 1e-5
    assert abs(row.u_symmetric - 2 * (hx + hy - hxy) / (hx + hy)) < 1e-5


def test_gk_lambda_matches_numpy(spark, duck):
    from datafusion_gpu_spark.queries.pipeline import _agg_gk_lambda

    [row] = _agg_gk_lambda(spark, SF_DIR).collect()
    obs = duck.execute(
        "SELECT o_orderpriority AS x, o_orderstatus AS y, COUNT(*) AS o "
        "FROM orders GROUP BY 1, 2"
    ).df()
    piv = obs.pivot_table(index="x", columns="y", values="o", fill_value=0)
    o = piv.to_numpy()
    n = o.sum()
    lam_yx = (o.max(axis=1).sum() - o.sum(axis=0).max()) / (
        n - o.sum(axis=0).max()
    )
    lam_xy = (o.max(axis=0).sum() - o.sum(axis=1).max()) / (
        n - o.sum(axis=1).max()
    )
    assert row.n_total == n
    assert abs(row.lambda_y_given_x - lam_yx) < 1e-6
    assert abs(row.lambda_x_given_y - lam_xy) < 1e-6


def test_gk_lambda_perfect_prediction_is_one(spark):
    # priority fully determines status -> lambda(Y|X) = 1 exactly
    from datafusion_gpu_spark.queries.pipeline import _GK_LAMBDA

    rows = [("1-A", "F")] * 5 + [("2-B", "O")] * 3 + [("3-C", "P")] * 2
    df = spark.createDataFrame(rows, "o_orderpriority string, o_orderstatus string")
    df.createOrReplaceTempView("orders")
    try:
        [row] = spark.sql(_GK_LAMBDA).collect()
    finally:
        spark.catalog.dropTempView("orders")
    assert row.lambda_y_given_x == 1.0


def test_cohens_h_matches_numpy(spark, duck):
    from datafusion_gpu_spark.queries.pipeline import _agg_cohens_h

    [row] = _agg_cohens_h(spark, SF_DIR).collect()
    df = duck.execute(
        "SELECT user_id % 2 AS grp, "
        "SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS k, "
        "COUNT(*) AS n FROM events GROUP BY 1 ORDER BY 1"
    ).df()
    p0 = df.k[0] / df.n[0]
    p1 = df.k[1] / df.n[1]
    h = 2 * np.arcsin(np.sqrt(p1)) - 2 * np.arcsin(np.sqrt(p0))
    assert abs(row.cohens_h - h) < 1e-6
    assert row.at_least_small == (abs(h) >= 0.2)


# ---------------------------------------------------------------------------
# Cronbach alpha / ICC on the complete-blocks design
# ---------------------------------------------------------------------------
def _segment_matrix(duck):
    df = duck.execute(
        """
        SELECT user_id,
               CASE WHEN CAST(ts AS DATE) < DATE '2024-01-11' THEN 1
                    WHEN CAST(ts AS DATE) < DATE '2024-01-21' THEN 2
                    ELSE 3 END AS j,
               SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS v
        FROM events WHERE value IS NOT NULL GROUP BY 1, 2
        """
    ).df()
    full = df.groupby("user_id").filter(lambda g: len(g) == 3)
    return full.pivot_table(index="user_id", columns="j", values="v").to_numpy(
        dtype=float
    )


def test_cronbach_alpha_matches_numpy(spark, duck):
    from datafusion_gpu_spark.queries.pipeline import _agg_cronbach_alpha

    [row] = _agg_cronbach_alpha(spark, SF_DIR).collect()
    x = _segment_matrix(duck)
    k = x.shape[1]
    alpha = k / (k - 1) * (
        1 - x.var(axis=0, ddof=1).sum() / x.sum(axis=1).var(ddof=1)
    )
    assert row.n_blocks == x.shape[0] and row.k_items == k
    assert abs(row.cronbach_alpha - alpha) < 1e-4


def test_icc_matches_numpy(spark, duck):
    from datafusion_gpu_spark.queries.pipeline import _agg_icc

    [row] = _agg_icc(spark, SF_DIR).collect()
    x = _segment_matrix(duck)
    n, k = x.shape
    grand = x.mean()
    msb = k * ((x.mean(axis=1) - grand) ** 2).sum() / (n - 1)
    msw = ((x - x.mean(axis=1, keepdims=True)) ** 2).sum() / (n * (k - 1))
    icc = (msb - msw) / (msb + (k - 1) * msw)
    assert row.n_blocks == n
    assert abs(row.ms_between - msb) < max(1e-3, msb * 1e-9)
    assert abs(row.ms_within - msw) < max(1e-3, msw * 1e-9)
    assert abs(row.icc_1_1 - icc) < 1e-6


def test_streaming_log_loss_matches_batch_exactly(spark):
    from datafusion_gpu_spark.queries.pipeline import (
        _agg_log_loss,
        _streaming_log_loss,
    )

    sf = "/root/testdata/sf0.001"
    [batch] = _agg_log_loss(spark, sf).collect()
    [stream] = _streaming_log_loss(spark, sf).collect()
    assert tuple(stream) == tuple(batch)


# ---------------------------------------------------------------------------
# Cross-query invariances (the round-13 invariance-test pattern)
# ---------------------------------------------------------------------------
def test_tau_b_squared_is_somers_product(spark):
    # Kendall & Somers on the SAME grid satisfy tau_b^2 = d_yx * d_xy
    # exactly (both denominators multiply to tau_b's): a cross-query
    # identity on exact integer folds, so it holds to fp precision of
    # the two terminal divisions
    from datafusion_gpu_spark.queries.pipeline import (
        _agg_kendall_tau,
        _agg_somers_d,
    )

    [kt] = _agg_kendall_tau(spark, SF_DIR).collect()
    [sd] = _agg_somers_d(spark, SF_DIR).collect()
    assert kt.nc == sd.nc and kt.nd == sd.nd
    # all three outputs are ROUND(...,6), so the identity holds on the
    # 6dp grid (error propagation ~2*|tau|*5e-7)
    assert abs(kt.tau_b**2 - sd.d_yx * sd.d_xy) < 3e-6


def test_mann_kendall_sign_agrees_with_theil_sen(spark):
    # the MK statistic's sign and the Theil-Sen slope's sign must agree
    # on the same hourly purchase series (both are monotone-trend reads
    # of the identical relation; exact zero slopes exempt)
    from datafusion_gpu_spark.queries.pipeline import (
        _events_mann_kendall,
        _events_theil_sen,
    )

    [mk] = _events_mann_kendall(spark, SF_DIR).collect()
    [ts] = _events_theil_sen(spark, SF_DIR).collect()
    # resolve the slope column by name fragment to stay schema-robust
    slope_cols = [c for c in ts.__fields__ if "slope" in c]
    assert slope_cols, ts.__fields__
    slope = ts[slope_cols[0]]
    if slope != 0 and mk.s_mk != 0:
        assert (slope > 0) == (mk.s_mk > 0)


def test_g_test_and_chi2_agree_on_shape(spark):
    # same contingency -> same df, and both statistics nonnegative;
    # the LR and Pearson forms agree asymptotically (NOT asserted
    # numerically — only the exact-shape contract)
    from datafusion_gpu_spark.queries.pipeline import (
        _agg_chi2_independence,
        _agg_g_test,
    )

    [g] = _agg_g_test(spark, SF_DIR).collect()
    [c] = _agg_chi2_independence(spark, SF_DIR).collect()
    assert g.df == c.df and g.n_cells == c.n_cells
    assert g.g_stat >= 0 and c.chi2 >= 0


def test_average_precision_beats_prevalence_iff_ranking_helps(spark):
    # on this data value IS a positive signal for purchase (AUC > 0.5,
    # pinned by the auc gate) — AP must then sit above the prevalence
    # baseline; the two queries must also agree on the class counts
    from datafusion_gpu_spark.queries.pipeline import (
        _agg_auc_exact,
        _agg_average_precision,
    )

    [auc] = _agg_auc_exact(spark, SF_DIR).collect()
    [ap] = _agg_average_precision(spark, SF_DIR).collect()
    assert (auc.n_pos, auc.n_neg) == (ap.n_pos, ap.n_neg)
    if auc.auc > 0.5:
        assert ap.average_precision > ap.prevalence_baseline


def test_kendall_w_friedman_consistency_on_shared_design(spark):
    # Kendall's W and Friedman's Q are the SAME statistic up to
    # scaling (Q = m(n-1)W) when computed on one blocked design; our
    # two gates use different designs on purpose, so assert the
    # internal identity on the W gate's own outputs instead
    from datafusion_gpu_spark.queries.pipeline import _agg_kendall_w

    [w] = _agg_kendall_w(spark, SF_DIR).collect()
    assert abs(w.chi2_w - w.m_judges * (w.n_items - 1) * w.w_concordance) < 1e-3
    assert 0.0 <= w.w_concordance <= 1.0


def test_harrell_c_bounds_and_complement(spark):
    # C in [0,1]; flipping the score (parity) complements C around the
    # tied mass: C + C_flipped = 1 exactly (conc and disc swap, tied
    # stays) — asserted via the suffix identity on one query's outputs
    from datafusion_gpu_spark.queries.pipeline import _events_harrell_c

    [c] = _events_harrell_c(spark, SF_DIR).collect()
    assert 0.0 <= c.c_index <= 1.0
    total = c.concordant + c.discordant + c.tied_score
    flipped = (c.discordant + c.tied_score / 2.0) / total
    # c_index is ROUND(...,6); the complement identity holds on that grid
    assert abs(c.c_index + flipped - 1.0) < 1e-6


def test_brunner_munzel_matches_numpy(spark, duck):
    # replicate the scipy.stats.brunnermunzel formulas from the pooled
    # and within-group midranks (Brunner & Munzel 2000)
    from datafusion_gpu_spark.queries.pipeline import _agg_brunner_munzel

    [row] = _agg_brunner_munzel(spark, SF_DIR).collect()
    df = duck.execute(
        "SELECT CAST(ROUND(value * 100, 0) AS BIGINT) AS c, "
        "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos "
        "FROM events WHERE event_type IN ('click', 'purchase') "
        "AND value IS NOT NULL"
    ).df()
    x = df.c[df.pos == 0].to_numpy()
    y = df.c[df.pos == 1].to_numpy()
    n1, n2 = len(x), len(y)
    pooled = pd.Series(np.concatenate([x, y])).rank(method="average").to_numpy()
    rx, ry = pooled[:n1], pooled[n1:]
    rxin = pd.Series(x).rank(method="average").to_numpy()
    ryin = pd.Series(y).rank(method="average").to_numpy()
    s1 = ((rx - rxin - rx.mean() + (n1 + 1) / 2) ** 2).sum() / (n1 - 1)
    s2 = ((ry - ryin - ry.mean() + (n2 + 1) / 2) ** 2).sum() / (n2 - 1)
    w = n1 * n2 * (ry.mean() - rx.mean()) / (
        (n1 + n2) * np.sqrt(n1 * s1 + n2 * s2)
    )
    dfree = (n1 * s1 + n2 * s2) ** 2 / (
        (n1 * s1) ** 2 / (n1 - 1) + (n2 * s2) ** 2 / (n2 - 1)
    )
    p_hat = (ry.mean() - (n2 + 1) / 2) / n1
    assert (row.n1, row.n2) == (n1, n2)
    assert abs(row.p_hat_xy - p_hat) < 1e-6
    assert abs(row.w_bm - w) < 1e-5
    assert abs(row.df_bm - dfree) < max(0.05, dfree * 1e-5)


def test_brunner_munzel_planted_unbalanced(spark):
    # an UNBALANCED plant (n1 != n2) — the case where the rank-mean
    # constants do not cancel; clicks at low cents, purchases high,
    # one overlap point
    from datafusion_gpu_spark.queries.pipeline import _BRUNNER_MUNZEL

    rows = (
        [(i, "click", 1.0 + i * 0.01) for i in range(8)]
        + [(100 + i, "purchase", 2.0 + i * 0.01) for i in range(4)]
    )
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    df.createOrReplaceTempView("events")
    try:
        [row] = spark.sql(_BRUNNER_MUNZEL).collect()
    finally:
        spark.catalog.dropTempView("events")
    # complete separation: p_hat = 1, zero placement variance -> the
    # degenerate guard (v1 = v2 = 0) must emit NULL W, not a 0-divide
    assert row.n1 == 8 and row.n2 == 4
    assert row.p_hat_xy == 1.0
    assert row.w_bm is None and row.reject_05_normal is None


def test_seasonal_mk_matches_bruteforce(spark, duck):
    from datafusion_gpu_spark.queries.pipeline import _events_seasonal_mk

    [row] = _events_seasonal_mk(spark, SF_DIR).collect()
    df = duck.execute(
        "SELECT CAST(hour(ts) AS BIGINT) AS g, CAST(ts AS DATE) AS d, "
        "SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS y FROM events "
        "WHERE event_type = 'purchase' AND value IS NOT NULL "
        "GROUP BY 1, 2 ORDER BY 1, 2"
    ).df()
    s = 0
    varnum = 0
    n_obs = 0
    for _, sub in df.groupby("g"):
        y = sub.sort_values("d").y.to_numpy()
        n = len(y)
        n_obs += n
        s += int(np.sign(y[None, :] - y[:, None])[np.triu_indices(n, 1)].sum())
        _, t = np.unique(y, return_counts=True)
        varnum += n * (n - 1) * (2 * n + 5) - int(
            (t * (t - 1) * (2 * t + 5))[t > 1].sum()
        )
    z = (s - np.sign(s)) / np.sqrt(varnum / 18)
    assert row.n_obs == n_obs and row.s_mk == s
    assert abs(row.var_s - varnum / 18) < 1e-6
    assert abs(row.z_smk - z) < 1e-6


def test_seasonal_mk_cancels_planted_diurnal_cycle(spark):
    # a pure diurnal cycle with NO day-over-day trend: plain MK sees
    # structure, seasonal MK must see S' == 0 exactly (each season's
    # series is constant across days)
    from datafusion_gpu_spark.queries.pipeline import _SEASONAL_MK

    rows = []
    eid = 0
    for day in range(1, 11):
        for h in range(24):
            rows.append(
                (eid, 1, f"2024-01-{day:02d} {h:02d}:00:00", "purchase",
                 float(10 + (h % 6) * 5))
            )
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string, value double"
    ).selectExpr(
        "event_id", "user_id", "CAST(ts AS TIMESTAMP) AS ts", "event_type", "value"
    )
    df.createOrReplaceTempView("events")
    try:
        [row] = spark.sql(_SEASONAL_MK).collect()
    finally:
        spark.catalog.dropTempView("events")
    assert row.s_mk == 0 and row.n_seasons == 24
    # all-tied seasons -> zero variance -> honest NULL, never 0/0
    assert row.z_smk is None


# ---------------------------------------------------------------------------
# Round 14: multi-level-score Harrell C (two-level score x duration
# cumulative on the bounded dense grid)
# ---------------------------------------------------------------------------
def test_harrell_c_cont_matches_bruteforce(spark, duck):
    """The grid-cumulative pair counts must equal O(n^2) enumeration of
    the lifelines pair convention on the same capped activity score."""
    from datafusion_gpu_spark.queries.pipeline import _events_harrell_c_cont

    [row] = _events_harrell_c_cont(spark, SF_DIR).collect()
    df = duck.execute(
        """
        WITH life AS (
          SELECT user_id, MIN(epoch_us(ts)) AS start,
                 MIN(CASE WHEN event_type = 'purchase'
                     THEN epoch_us(ts) END) AS fp,
                 MAX(epoch_us(ts)) AS last, COUNT(*) AS n_ev
          FROM events GROUP BY user_id)
        SELECT CASE WHEN n_ev > 64 THEN 64 ELSE n_ev END AS s,
               (COALESCE(fp, last) - start) // 3600000000 AS t,
               CASE WHEN fp IS NULL THEN 0 ELSE 1 END AS obs
        FROM life
        """
    ).df()
    s = df.s.to_numpy()
    t = df.t.to_numpy()
    obs = df.obs.to_numpy()
    conc = disc = tied = 0
    for i in range(len(df)):
        if not obs[i]:
            continue
        later = (t > t[i]) | ((t == t[i]) & (obs == 0))
        sl = s[later]
        conc += int((sl < s[i]).sum())
        disc += int((sl > s[i]).sum())
        tied += int((sl == s[i]).sum())
    assert row.n_subjects == len(df)
    assert row.concordant == conc and row.discordant == disc
    assert row.tied_score == tied
    c_ref = (conc + tied / 2) / (conc + disc + tied)
    assert abs(row.c_index - c_ref) < 1e-6


def test_harrell_c_cont_hand_case(spark):
    """Four users: u1 (2 events, purchase at +1h), u2 (1 event,
    censored at 0h), u3 (3 events, purchase at +2h), u4 (2 events,
    censored at +3h). Comparable pairs: u1-u3 (u3 scores higher but
    fails later: discordant), u1-u4 (score tie), u3-u4 (concordant) ->
    C = (1 + 0.5) / 3 = 0.5."""
    from datafusion_gpu_spark.queries.pipeline import _HARRELL_C_CONT_SPARK

    rows = [
        (1, 1, "2024-01-01 00:00:00", "view", None),
        (2, 1, "2024-01-01 01:00:00", "purchase", 5.0),
        (3, 2, "2024-01-01 00:00:00", "view", None),
        (4, 3, "2024-01-01 00:00:00", "view", None),
        (5, 3, "2024-01-01 02:00:00", "purchase", 7.0),
        (6, 3, "2024-01-01 05:00:00", "view", None),
        (7, 4, "2024-01-01 00:00:00", "view", None),
        (8, 4, "2024-01-01 03:00:00", "view", None),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts string, event_type string,"
        " value double",
    ).selectExpr(
        "event_id", "user_id", "CAST(ts AS TIMESTAMP) AS ts",
        "event_type", "value",
    )
    df.createOrReplaceTempView("events")
    try:
        [out] = spark.sql(_HARRELL_C_CONT_SPARK).collect()
    finally:
        spark.catalog.dropTempView("events")
    assert out.n_subjects == 4 and out.max_level == 3
    assert out.concordant == 1 and out.discordant == 1
    assert out.tied_score == 1
    assert out.c_index == 0.5


def test_harrell_c_cont_cap_is_64(spark):
    """A user with 200 events lands on score level 64 exactly (the
    literal cap is the scale contract, and the grid axis never grows
    past it)."""
    from datafusion_gpu_spark.queries.pipeline import _HARRELL_C_CONT_SPARK

    rows = [
        (i, 1, f"2024-01-01 {i % 24:02d}:{i % 60:02d}:00", "view", None)
        for i in range(200)
    ] + [
        (200, 1, "2024-01-02 00:00:00", "purchase", 1.0),
        (201, 2, "2024-01-01 00:00:00", "view", None),
        (202, 2, "2024-01-03 00:00:00", "view", None),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts string, event_type string,"
        " value double",
    ).selectExpr(
        "event_id", "user_id", "CAST(ts AS TIMESTAMP) AS ts",
        "event_type", "value",
    )
    df.createOrReplaceTempView("events")
    try:
        [out] = spark.sql(_HARRELL_C_CONT_SPARK).collect()
    finally:
        spark.catalog.dropTempView("events")
    assert out.max_level == 64
    # u1 (201 events -> level 64) purchases at +24h; u2 (level 2)
    # censored at +48h: one comparable pair, higher score failed
    # first -> concordant, C = 1.
    assert out.concordant == 1 and out.discordant == 0
    assert out.tied_score == 0 and out.c_index == 1.0


# ---------------------------------------------------------------------------
# Round 14: Uno's censoring-adjusted C (IPCW weights off the
# censoring Kaplan-Meier)
# ---------------------------------------------------------------------------
def _uno_reference(subjects, tau):
    """Independent float spelling of Uno's C_tau over (grp, t, obs)
    subjects (censoring already applied): censoring-KM weights
    1/G(t-)^2 with deaths-before-censorings ties, strict t_i < t_j
    comparability, half-credit score ties."""
    from collections import defaultdict

    per = defaultdict(lambda: [0, 0, 0, 0])  # d1, c1, d0, c0
    for g, t, o in subjects:
        per[t][(0 if g == 1 else 2) + (1 - o)] += 1
    times = sorted(per)
    suf = {}
    n1 = n0 = 0
    for t in reversed(times):
        d1, c1, d0, c0 = per[t]
        suf[t] = (n1, n0, n1 + n0 + d1 + c1 + d0 + c0)  # later1, later0, n_risk
        n1 += d1 + c1
        n0 += d0 + c0
    g_before = 1.0
    num = den = 0.0
    for t in times:
        d1, c1, d0, c0 = per[t]
        later1, later0, n_risk = suf[t]
        if t < tau and d1 + d0 > 0 and g_before > 0:
            w = 1.0 / (g_before * g_before)
            num += w * (d1 * later0 + 0.5 * (d1 * later1 + d0 * later0))
            den += w * (d1 + d0) * (later1 + later0)
        c_tot = c1 + c0
        g_before *= (1.0 - c_tot / n_risk) if c_tot < n_risk else 0.0
    return num / den if den > 0 else None


def _uno_events_view(spark, users):
    """Build an events temp view from (user_id, purchase_hour or None,
    last_hour) rows: first view at hour 0; a purchase at purchase_hour
    or a final view at last_hour."""
    rows = []
    eid = 0
    for uid, ph, lh in users:
        rows.append((eid, uid, "2024-01-01 00:00:00", "view", None))
        eid += 1
        h = ph if ph is not None else lh
        day, hod = 1 + h // 24, h % 24
        ts = f"2024-01-{day:02d} {hod:02d}:00:00"
        rows.append(
            (eid, uid, ts, "purchase" if ph is not None else "view",
             1.0 if ph is not None else None)
        )
        eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts string, event_type string,"
        " value double",
    ).selectExpr(
        "event_id", "user_id", "CAST(ts AS TIMESTAMP) AS ts",
        "event_type", "value",
    )
    df.createOrReplaceTempView("events")


def test_uno_c_numpy_reference(spark):
    """Mixed censored/observed users with interleaved staggered
    censoring: the SQL must land on the independent float reference to
    1e-5, with weights genuinely above 1."""
    from datafusion_gpu_spark.queries.pipeline import _UNO_C_SPARK

    # user u: ct = 24 + (u * 37) % 120; purchases at (3u + 7) % 200 h unless
    # u % 5 == 0 (then a censored trace ending at (7u + 11) % 150 h)
    users = []
    for u in range(40):
        if u % 5 == 0:
            users.append((u, None, (7 * u + 11) % 150))
        else:
            users.append((u, (3 * u + 7) % 200, None))
    _uno_events_view(spark, users)
    try:
        [out] = spark.sql(_UNO_C_SPARK).collect()
    finally:
        spark.catalog.dropTempView("events")

    subjects = []
    for u, ph, lh in users:
        ct = 24 + (u * 37) % 120
        tr = ph if ph is not None else lh
        orr = 1 if ph is not None else 0
        t = min(tr, ct)
        obs = 1 if (orr == 1 and tr <= ct) else 0
        subjects.append((u % 2, t, obs))
    ref = _uno_reference(subjects, tau=120)
    assert out.n_subjects == 40
    assert out.w_max > 1.0  # the IPCW path is genuinely exercised
    assert ref is not None and abs(out.c_uno - ref) <= 1e-5


def test_uno_c_no_censoring_equals_unweighted(spark):
    """Every purchase lands inside every C_u (tr < 24 <= ct) -> no
    censoring anywhere, all weights exactly 1 (ln terms fold to the
    exact integer 0), and C equals the unweighted strict-comparability
    brute force."""
    from datafusion_gpu_spark.queries.pipeline import _UNO_C_SPARK

    users = [(u, (u * 5 + 3) % 24, None) for u in range(30)]
    _uno_events_view(spark, users)
    try:
        [out] = spark.sql(_UNO_C_SPARK).collect()
    finally:
        spark.catalog.dropTempView("events")

    subjects = [(u % 2, (u * 5 + 3) % 24, 1) for u in range(30)]
    conc = disc = tied = 0
    for i, (gi, ti, _oi) in enumerate(subjects):
        for j, (gj, tj, _oj) in enumerate(subjects):
            if tj > ti:  # strict comparability, i is the event anchor
                if gi > gj:
                    conc += 1
                elif gi < gj:
                    disc += 1
                else:
                    tied += 1
    c_ref = (conc + tied / 2) / (conc + disc + tied)
    assert out.w_max == 1.0
    assert abs(out.c_uno - round(c_ref, 6)) <= 1e-6


def test_uno_c_degenerate_single_time(spark):
    """All events at one duration: no strictly-later subjects, den
    folds to 0, c_uno goes NULL through the guard."""
    from datafusion_gpu_spark.queries.pipeline import _UNO_C_SPARK

    users = [(u, 5, None) for u in range(10)]
    _uno_events_view(spark, users)
    try:
        [out] = spark.sql(_UNO_C_SPARK).collect()
    finally:
        spark.catalog.dropTempView("events")
    assert out.c_uno is None


# ---------------------------------------------------------------------------
# Round 14: time-dependent cumulative/dynamic AUC (IPCW case weights)
# ---------------------------------------------------------------------------
def _auc_td_reference(subjects, tau):
    """Independent float spelling of the IPCW cumulative/dynamic AUC
    over (s, t, obs) subjects (censoring already applied): case weight
    1/G(t-) off the censoring KM, controls = t > tau (their common
    weight cancels), half-credit score ties."""
    from collections import defaultdict

    per_c = defaultdict(int)
    per_all = defaultdict(int)
    for _s, t, o in subjects:
        per_all[t] += 1
        if not o:
            per_c[t] += 1
    times = sorted(per_all)
    at_risk = len(subjects)
    g_before = 1.0
    g_at = {}
    for t in times:
        g_at[t] = g_before  # G(t-): censorings strictly before t
        g_before *= (
            (1.0 - per_c[t] / at_risk) if per_c[t] < at_risk else 0.0
        )
        at_risk -= per_all[t]
    controls = [s for s, t, _o in subjects if t > tau]
    num = den = 0.0
    for s, t, o in subjects:
        if o and t <= tau and g_at[t] > 0:
            w = 1.0 / g_at[t]
            num += w * (
                sum(1 for sc in controls if sc < s)
                + 0.5 * sum(1 for sc in controls if sc == s)
            )
            den += w * len(controls)
    return num / den if den > 0 else None


def _auc_events_view(spark, users):
    """Events temp view from (user_id, n_extra_views, purchase_hour or
    None, last_hour): first view + extras at hour 0 (score = 2 +
    extras without touching durations), then the terminal event."""
    rows = []
    eid = 0
    for uid, extras, ph, lh in users:
        for _ in range(1 + extras):
            rows.append((eid, uid, "2024-01-01 00:00:00", "view", None))
            eid += 1
        h = ph if ph is not None else lh
        day, hod = 1 + h // 24, h % 24
        ts = f"2024-01-{day:02d} {hod:02d}:00:00"
        rows.append(
            (eid, uid, ts, "purchase" if ph is not None else "view",
             1.0 if ph is not None else None)
        )
        eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts string, event_type string,"
        " value double",
    ).selectExpr(
        "event_id", "user_id", "CAST(ts AS TIMESTAMP) AS ts",
        "event_type", "value",
    )
    df.createOrReplaceTempView("events")


def test_auc_td_numpy_reference(spark):
    """Varied scores, interleaved staggered censoring: the SQL must
    land on the independent float reference to 1e-5 with weights
    genuinely above 1."""
    from datafusion_gpu_spark.queries.pipeline import _AUC_TD_SPARK

    users = []
    for u in range(40):
        extras = u % 5
        if u % 4 == 0:
            users.append((u, extras, None, (7 * u + 11) % 90))
        else:
            users.append((u, extras, (3 * u + 5) % 90, None))
    _auc_events_view(spark, users)
    try:
        [out] = spark.sql(_AUC_TD_SPARK).collect()
    finally:
        spark.catalog.dropTempView("events")

    subjects = []
    for u, extras, ph, lh in users:
        ct = 6 + (u * 37) % 120
        tr = ph if ph is not None else lh
        orr = 1 if ph is not None else 0
        t = min(tr, ct)
        obs = 1 if (orr == 1 and tr <= ct) else 0
        subjects.append((min(2 + extras, 64), t, obs))
    ref = _auc_td_reference(subjects, tau=24)
    assert out.n_subjects == 40
    assert out.w_max > 1.0
    assert ref is not None and abs(out.auc_td - ref) <= 1e-5


def test_auc_td_no_censoring_equals_mw_auc(spark):
    """Every uid is ~107 mod 120 (C_u = 125 h), every trace ends
    before 100 h, every subject purchases -> zero censoring, weights
    exactly 1, and the statistic collapses to the plain Mann-Whitney
    AUC of score for cases (t <= 24) vs controls (t > 24)."""
    from datafusion_gpu_spark.queries.pipeline import _AUC_TD_SPARK

    users = [
        (107 + 120 * k, k % 6, (11 * k + 3) % 90, None) for k in range(30)
    ]
    _auc_events_view(spark, users)
    try:
        [out] = spark.sql(_AUC_TD_SPARK).collect()
    finally:
        spark.catalog.dropTempView("events")

    subjects = [
        (min(2 + k % 6, 64), (11 * k + 3) % 90, 1) for k in range(30)
    ]
    cases = [s for s, t, _ in subjects if t <= 24]
    controls = [s for s, t, _ in subjects if t > 24]
    num = sum(
        sum(1 for c in controls if c < s)
        + 0.5 * sum(1 for c in controls if c == s)
        for s in cases
    )
    den = len(cases) * len(controls)
    assert out.w_max == 1.0
    assert abs(out.auc_td - round(num / den, 6)) <= 1e-6


def test_auc_td_no_controls_null(spark):
    """Every duration inside the horizon: no controls, auc goes NULL
    through the den > 0 guard."""
    from datafusion_gpu_spark.queries.pipeline import _AUC_TD_SPARK

    users = [(107 + 120 * k, k % 3, (k * 3) % 20, None) for k in range(10)]
    _auc_events_view(spark, users)
    try:
        [out] = spark.sql(_AUC_TD_SPARK).collect()
    finally:
        spark.catalog.dropTempView("events")
    assert out.auc_td is None


# ---------------------------------------------------------------------------
# Round 14: IPCW Brier score at a horizon (Graf et al. 1999)
# ---------------------------------------------------------------------------
def _brier_reference(subjects, tau):
    """Independent float spelling: cohort-KM predictions at tau,
    censoring-KM weights (1/G(t-) for failures, 1/G(tau) for
    survivors), censored-inside-horizon subjects dropped."""
    from collections import defaultdict

    per = defaultdict(lambda: [0, 0, 0, 0])  # d1, c1, d0, c0
    for g, t, o in subjects:
        per[t][(0 if g == 1 else 2) + (1 - o)] += 1
    times = sorted(per)
    n = len(subjects)
    n1 = sum(1 for g, _t, _o in subjects if g == 1)
    n0 = n - n1
    s1 = s0 = g_km = 1.0
    g_before = {}
    r1, r0 = n1, n0
    for t in times:
        d1, c1, d0, c0 = per[t]
        g_before[t] = g_km
        if t <= tau:
            if d1:
                s1 *= 1.0 - d1 / r1
            if d0:
                s0 *= 1.0 - d0 / r0
            ct = c1 + c0
            if ct:
                g_km *= 1.0 - ct / (r1 + r0) if ct < r1 + r0 else 0.0
        r1 -= d1 + c1
        r0 -= d0 + c0
    total = 0.0
    for g, t, o in subjects:
        pred = s1 if g == 1 else s0
        if o and t <= tau:
            total += pred * pred / g_before[t]
        elif t > tau:
            total += (1.0 - pred) * (1.0 - pred) / g_km
    return total / n, s1, s0, g_km


def test_brier_ipcw_numpy_reference(spark):
    """Mixed censored/observed users, interleaved 6 h-offset staggered
    censoring: the SQL must land on the independent float reference to
    1e-5 on brier and both cohort KMs."""
    from datafusion_gpu_spark.queries.pipeline import _BRIER_IPCW_SPARK

    users = []
    for u in range(40):
        if u % 4 == 0:
            users.append((u, None, (7 * u + 11) % 90))
        else:
            users.append((u, (3 * u + 5) % 90, None))
    _uno_events_view(spark, users)
    try:
        [out] = spark.sql(_BRIER_IPCW_SPARK).collect()
    finally:
        spark.catalog.dropTempView("events")

    subjects = []
    for u, ph, lh in users:
        ct = 6 + (u * 37) % 120
        tr = ph if ph is not None else lh
        orr = 1 if ph is not None else 0
        subjects.append(
            (u % 2, min(tr, ct), 1 if (orr == 1 and tr <= ct) else 0)
        )
    bs, s1, s0, g_tau = _brier_reference(subjects, tau=24)
    assert out.n_subjects == 40
    assert abs(out.s1_tau - s1) <= 1e-5
    assert abs(out.s0_tau - s0) <= 1e-5
    assert abs(out.g_tau - g_tau) <= 1e-5
    assert abs(out.brier_ipcw - bs) <= 1e-5


def test_brier_ipcw_no_censoring_is_group_mean_brier(spark):
    """Zero censoring (uids ~107 mod 120 -> C_u = 125 h; every trace a
    purchase before 100 h): weights are exactly 1, the cohort KM at
    tau is the empirical survival fraction, and the statistic equals
    the classic Brier score of group-mean predictions."""
    from datafusion_gpu_spark.queries.pipeline import _BRIER_IPCW_SPARK

    # uids alternate 107 mod 120 (odd, C_u = 125 h) and 94 mod 120
    # (even, C_u = 124 h) so BOTH parity cohorts are populated
    uids = [(107 if k % 2 else 94) + 120 * k for k in range(30)]
    users = [(uid, (11 * k + 3) % 90, None) for k, uid in enumerate(uids)]
    _uno_events_view(spark, users)
    try:
        [out] = spark.sql(_BRIER_IPCW_SPARK).collect()
    finally:
        spark.catalog.dropTempView("events")

    subjects = [
        (uid % 2, (11 * k + 3) % 90, 1) for k, uid in enumerate(uids)
    ]
    tot = {g: sum(1 for gg, _t, _ in subjects if gg == g) for g in (0, 1)}
    surv = {
        g: sum(1 for gg, t, _ in subjects if gg == g and t > 24) / tot[g]
        for g in (0, 1)
    }
    bs = sum(
        ((1.0 if t > 24 else 0.0) - surv[g]) ** 2 for g, t, _ in subjects
    ) / len(subjects)
    assert out.w_max == 1.0 and out.g_tau == 1.0
    assert abs(out.brier_ipcw - bs) <= 1e-5


def test_brier_ipcw_g_zero_guard(spark):
    """Every subject censored inside the horizon: G(tau) hits exact
    zero and brier goes NULL through the g_dead guard."""
    from datafusion_gpu_spark.queries.pipeline import _BRIER_IPCW_SPARK

    users = [(107 + 120 * k, None, 3 + k % 5) for k in range(10)]
    _uno_events_view(spark, users)
    try:
        [out] = spark.sql(_BRIER_IPCW_SPARK).collect()
    finally:
        spark.catalog.dropTempView("events")
    assert out.g_tau == 0.0 and out.brier_ipcw is None


# ---------------------------------------------------------------------------
# Round 14: calibration-in-the-large for survival
# ---------------------------------------------------------------------------
def _calib_reference(subjects, tau):
    """Pooled KM vs cohort-size-weighted mean of cohort KMs at tau."""
    from collections import defaultdict

    per = defaultdict(lambda: [0, 0, 0, 0])
    for g, t, o in subjects:
        per[t][(0 if g == 1 else 2) + (1 - o)] += 1
    n1 = sum(1 for g, _t, _o in subjects if g == 1)
    n0 = len(subjects) - n1
    s1 = s0 = sp = 1.0
    r1, r0 = n1, n0
    for t in sorted(per):
        d1, c1, d0, c0 = per[t]
        if t <= tau:
            if d1:
                s1 *= 1.0 - d1 / r1
            if d0:
                s0 *= 1.0 - d0 / r0
            if d1 + d0:
                sp *= 1.0 - (d1 + d0) / (r1 + r0)
        r1 -= d1 + c1
        r0 -= d0 + c0
    exp = (n1 * s1 + n0 * s0) / (n1 + n0)
    return sp, exp


def test_survival_calibration_numpy_reference(spark):
    from datafusion_gpu_spark.queries.pipeline import _SURV_CALIB_SPARK

    users = []
    for u in range(40):
        if u % 4 == 0:
            users.append((u, None, (7 * u + 11) % 90))
        else:
            users.append((u, (3 * u + 5) % 90, None))
    _uno_events_view(spark, users)
    try:
        [out] = spark.sql(_SURV_CALIB_SPARK).collect()
    finally:
        spark.catalog.dropTempView("events")

    subjects = []
    for u, ph, lh in users:
        ct = 6 + (u * 37) % 120
        tr = ph if ph is not None else lh
        orr = 1 if ph is not None else 0
        subjects.append(
            (u % 2, min(tr, ct), 1 if (orr == 1 and tr <= ct) else 0)
        )
    sp, exp = _calib_reference(subjects, tau=24)
    assert out.n_subjects == 40
    assert abs(out.observed_s - sp) <= 1e-5
    assert abs(out.expected_s - exp) <= 1e-5
    assert abs(out.calib_diff - (sp - exp)) <= 1e-5


def test_survival_calibration_identical_cohorts_zero_diff(spark):
    """Identical cohort profiles (paired uids u, u+1 with the same
    trace and the same C_u would need equal stagger — instead pair
    uids 120k+94 and 120k+107 whose C_u are 124/125 h, both far above
    every trace): pooled KM == both cohort KMs, calib_diff is EXACTLY
    +0.0 (the signed-zero normalization in the wild)."""
    import math

    from datafusion_gpu_spark.queries.pipeline import _SURV_CALIB_SPARK

    users = []
    for k in range(12):
        h = (9 * k + 4) % 80
        users.append((94 + 120 * k, h, None))   # even cohort
        users.append((107 + 120 * k, h, None))  # odd cohort, same trace
    _uno_events_view(spark, users)
    try:
        [out] = spark.sql(_SURV_CALIB_SPARK).collect()
    finally:
        spark.catalog.dropTempView("events")
    assert out.observed_s == out.expected_s
    assert out.calib_diff == 0.0 and out.calib_ratio == 1.0
    assert not math.copysign(1.0, out.calib_diff) < 0
