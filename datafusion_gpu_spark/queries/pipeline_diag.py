"""Distribution / agreement / stationarity diagnostics (round 13, second wave).

The inference suite (pipeline_stats) answers "do these groups differ?";
this module holds the DIAGNOSTIC gates an analyst runs before trusting
those answers: normality (Jarque-Bera), likelihood-ratio independence
(G-test), ordered-dose trend (Cochran-Armitage), multi-rater agreement
(Fleiss' kappa), and the time-series stationarity/memory family
(Ljung-Box, KPSS, variance ratio, classical decomposition).

House discipline throughout (the pipeline_stats contract): one portable
ANSI-SQL string per gate run verbatim on Spark and DuckDB, all
data-sized folds exact bigints over quantized values, libm-dependent
terms (LN) quantized ONCE per distinct value before any cross-row fold
(the survival_km lesson), terminal single-expression doubles, visible
int64 headroom guards from birth.

pipeline.py merges QUERIES/ORACLES from here (round-12 family-split
architecture), so the public surface stays `queries.pipeline`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from datafusion_gpu_spark.queries import load

QUERIES: dict = {}
ORACLES: dict = {}


# ---------------------------------------------------------------------------
# Jarque-Bera normality test (Jarque & Bera 1980) of the event-value
# distribution per event type — the moment-based normality gate the
# parametric members of the suite (Welch t, ANOVA F, Cohen's d) assume
# and nothing previously checked. JB = n*(g1^2/6 + g2^2/24) with g1 the
# sample skewness m3/m2^1.5 and g2 the excess kurtosis m4/m2^2 - 3,
# asymptotically chi-square(2) under normality.
#
# Spelling: values quantize to integer DOLLARS (the fourth-power fold is
# the binding constraint — cent quantization puts a single 490.02^4 term
# at 5.8e18, one row from wrapping int64; dollars give 5.8e10 per term),
# raw power sums S1..S4 are EXACT bigint folds in one groupBy(event_type)
# pass, central moments come from the raw-moment identities, and the
# whole g1/g2/JB tail is one terminal IEEE expression on exact operands —
# bit-identical cross-engine, no libm beyond SQRT. VISIBLE guard:
# n * mx^4 bounds the S4 fold, so outputs go NULL once
# CAST(n AS DOUBLE)*mx*mx*mx*mx reaches 9e18 (~1.5e8 rows at the
# observed $490 max; the dollar quantum is the knob). Degenerate guard:
# a single distinct value has m2 = 0 (nv > 1).
# ---------------------------------------------------------------------------
_JARQUE_BERA = """
WITH t AS (
  SELECT event_type, CAST(ROUND(value, 0) AS BIGINT) AS d
  FROM events WHERE value IS NOT NULL
),
m AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(d) AS BIGINT) AS s1,
         CAST(SUM(d * d) AS BIGINT) AS s2,
         CAST(SUM(d * d * d) AS BIGINT) AS s3,
         CAST(SUM(d * d * d * d) AS BIGINT) AS s4,
         CAST(MAX(ABS(d)) AS BIGINT) AS mx,
         CAST(COUNT(DISTINCT d) AS BIGINT) AS nv
  FROM t GROUP BY event_type
),
c AS (
  SELECT event_type, n, nv,
         CAST(n AS DOUBLE) * mx * mx * mx * mx < 9e18 AS headroom,
         CAST(s1 AS DOUBLE) / n AS mu,
         CAST(s2 AS DOUBLE) / n
           - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) AS m2,
         CAST(s3 AS DOUBLE) / n
           - 3.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n)
           + 2.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
                 * (CAST(s1 AS DOUBLE) / n) AS m3,
         CAST(s4 AS DOUBLE) / n
           - 4.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s3 AS DOUBLE) / n)
           + 6.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
                 * (CAST(s2 AS DOUBLE) / n)
           - 3.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
                 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) AS m4
  FROM m
),
g AS (
  SELECT event_type, n, headroom,
         ROUND(mu, 6) AS mean_dollars,
         CASE WHEN headroom AND nv > 1
              THEN m3 / (m2 * SQRT(m2)) END AS g1,
         CASE WHEN headroom AND nv > 1
              THEN m4 / (m2 * m2) - 3.0 END AS g2
  FROM c
)
SELECT event_type, n, mean_dollars,
       ROUND(g1, 6) AS skewness,
       ROUND(g2, 6) AS excess_kurtosis,
       ROUND(CAST(n AS DOUBLE) * (g1 * g1 / 6e0 + g2 * g2 / 24e0), 6) AS jb,
       CASE WHEN g1 IS NOT NULL THEN
         CAST(n AS DOUBLE) * (g1 * g1 / 6e0 + g2 * g2 / 24e0) > 5.991465
       END AS reject_normal_05
FROM g ORDER BY event_type
"""


def _agg_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque-Bera normality test of dollar-quantized event values per
    event type — exact bigint raw-moment folds (one pass), terminal
    skewness/kurtosis/JB vs chi-square(2) at 5.991465. See
    _JARQUE_BERA."""
    load(spark, sf_dir)
    return spark.sql(_JARQUE_BERA)


QUERIES["agg_jarque_bera"] = _agg_jarque_bera
ORACLES["agg_jarque_bera"] = _JARQUE_BERA


# ---------------------------------------------------------------------------
# G-test of independence (log-likelihood ratio; Woolf 1957, Sokal &
# Rohlf's spelling) on the SAME priority x status contingency as
# agg_chi2_independence: G = 2 * sum_cells O * ln(O*N / (R*C)), which
# dominates Pearson's chi-square when any expected cell is small and is
# additive across table partitions (the property meta-analyses use).
# Empty cells contribute exactly 0 (lim x->0 of x ln x), so the
# GROUP BY's nonzero-cell relation IS the full sum — no empty-cell
# correction term, unlike Pearson's form.
#
# Spelling: O, N, R, C are exact bigints, so each cell's LN argument is
# the identical double on both engines; the per-cell term quantizes ONCE
# to 1e-9 units (the greenwood/survival_km libm-LN discipline — one
# libm call per CELL, then exact integer folds), and G is the quantized
# sum divided once. VISIBLE guard: a term is bounded by
# 2 * O * ln(N) <= 2 * N * 43 nano-scaled, so outputs go NULL once
# CAST(nt AS DOUBLE) * 86e9 reaches 9e18 (~1e8 orders).
# ---------------------------------------------------------------------------
_G_TEST = """
WITH obs AS (
  SELECT o_orderpriority AS r, o_orderstatus AS c,
         CAST(COUNT(*) AS BIGINT) AS o
  FROM orders GROUP BY o_orderpriority, o_orderstatus
),
rt AS (SELECT r, CAST(SUM(o) AS BIGINT) AS nr FROM obs GROUP BY r),
ct AS (SELECT c, CAST(SUM(o) AS BIGINT) AS nc FROM obs GROUP BY c),
tot AS (SELECT CAST(SUM(o) AS BIGINT) AS nt FROM obs),
q AS (
  SELECT CAST(ROUND(1e9 * 2.0 * o
              * LN(CAST(o AS DOUBLE) * nt
                   / (CAST(rt.nr AS DOUBLE) * ct.nc)), 0) AS BIGINT) AS gq
  FROM obs o JOIN rt ON o.r = rt.r JOIN ct ON o.c = ct.c
  CROSS JOIN tot
),
s AS (
  SELECT CAST(SUM(gq) AS BIGINT) AS sgq, CAST(COUNT(*) AS BIGINT) AS n_cells
  FROM q
),
d AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM rt) AS kr,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM ct) AS kc
)
SELECT n_cells, (kr - 1) * (kc - 1) AS df,
       CASE WHEN kr > 1 AND kc > 1
             AND CAST(nt AS DOUBLE) * 86e9 < 9e18
            THEN ROUND(sgq / 1e9, 6) END AS g_stat
FROM s CROSS JOIN tot CROSS JOIN d
"""


def _agg_g_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Likelihood-ratio G-test of independence between order priority
    and order status — the chi-square's LR sibling on the identical
    contingency folds, empty-cell-exact by construction, per-cell LN
    quantized before the fold. See _G_TEST."""
    load(spark, sf_dir)
    return spark.sql(_G_TEST)


QUERIES["agg_g_test"] = _agg_g_test
ORACLES["agg_g_test"] = _G_TEST


# ---------------------------------------------------------------------------
# Cochran-Armitage trend test (Cochran 1954; Armitage 1955) for a
# monotone trend in a binary outcome across ORDERED groups — the
# dose-response member the 2xk family lacked: chi2_independence asks
# "is status independent of priority AT ALL", this asks the sharper,
# one-degree-of-freedom "does the 'F' share RISE with priority urgency",
# which has far more power when the truth is monotone. Scores w = the
# priority's leading digit (1-URGENT .. 5-LOW, the natural order the
# column encodes); outcome y = (o_orderstatus = 'F').
#
# T = sum_i w_i (r_i - n_i * pbar); Var(T) = pbar(1-pbar)
# (sum w^2 n - (sum w n)^2 / N); z = T / sqrt(Var). All folds are exact
# bigints over the k-row (score) relation (w <= 5, so sum w^2 n <= 25N
# — VISIBLE guard CAST(nt AS DOUBLE)*25 < 9e18); T and Var are terminal
# doubles on exact operands. Degenerate guards: 0 < cases < N and a
# positive score variance (>= 2 distinct scores present).
# ---------------------------------------------------------------------------
_COCHRAN_ARMITAGE = """
WITH t AS (
  SELECT CAST(SUBSTRING(o_orderpriority, 1, 1) AS BIGINT) AS w,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
  FROM orders
),
g AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS r
  FROM t GROUP BY w
),
f AS (
  SELECT CAST(SUM(n) AS BIGINT) AS nt, CAST(SUM(r) AS BIGINT) AS rt,
         CAST(SUM(w * r) AS BIGINT) AS swr,
         CAST(SUM(w * n) AS BIGINT) AS swn,
         CAST(SUM(w * w * n) AS BIGINT) AS sw2n,
         CAST(COUNT(*) AS BIGINT) AS k
  FROM g
),
z AS (
  SELECT k, nt, rt, swr, swn, sw2n,
         CAST(nt AS DOUBLE) * 25 < 9e18 AS headroom,
         CAST(swr AS DOUBLE) - CAST(rt AS DOUBLE) * swn / nt AS tt,
         (CAST(rt AS DOUBLE) / nt) * (1.0 - CAST(rt AS DOUBLE) / nt)
           * (CAST(sw2n AS DOUBLE) - CAST(swn AS DOUBLE) * swn / nt) AS vt
  FROM f
)
SELECT k AS n_levels, nt AS n_total, rt AS n_cases,
       CASE WHEN headroom THEN ROUND(tt, 6) END AS trend_t,
       CASE WHEN headroom AND vt > 0 THEN ROUND(vt, 6) END AS var_t,
       CASE WHEN headroom AND vt > 0 AND rt > 0 AND rt < nt
            THEN ROUND(tt / SQRT(vt), 6) END AS z,
       CASE WHEN headroom AND vt > 0 AND rt > 0 AND rt < nt
            THEN ABS(tt / SQRT(vt)) > 1.959964 END AS reject_05
FROM z
"""


def _agg_cochran_armitage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Armitage test for a monotone trend of the 'F'-status
    share across the five ordered priority levels — exact bigint
    score-weighted folds on the k-row relation, one terminal z vs
    1.959964. See _COCHRAN_ARMITAGE."""
    load(spark, sf_dir)
    return spark.sql(_COCHRAN_ARMITAGE)


QUERIES["agg_cochran_armitage"] = _agg_cochran_armitage
ORACLES["agg_cochran_armitage"] = _COCHRAN_ARMITAGE


# ---------------------------------------------------------------------------
# Fleiss' kappa (Fleiss 1971) — chance-corrected agreement among a FIXED
# number of raters per subject, the multi-rater generalization of
# agg_cohen_kappa (two raters). Rating design here: each user with >= 3
# events is a subject; the user's first three events by (ts, event_id)
# are three "raters" each assigning the event_type category — a
# deterministic, reproducible panel that asks "how consistent is a
# user's early event mix".
#
# With n = 3 raters, N subjects, SS = sum_ij n_ij^2 and category margins
# C_j, the whole statistic is INTEGER until one terminal division:
#   P_bar  = (SS - 3N) / (6N)
#   P_e    = sum C_j^2 / (9 N^2)
#   kappa  = (3N(SS - 3N) - 2 sum C_j^2) / (2 (9 N^2 - sum C_j^2))
# (substitute and clear denominators — the 18N^2 common denominator
# cancels). VISIBLE guard: every operand is bounded by 27 N^2, so kappa
# goes NULL once CAST(N AS DOUBLE)*N*27 reaches 9e18 (~5.8e8 subjects).
# Degenerate guard: 9N^2 = sum C_j^2 iff every rating lands in one
# category (P_e = 1) — kappa undefined, NULL.
# ---------------------------------------------------------------------------
_FLEISS_KAPPA = """
WITH eligible AS (
  SELECT user_id FROM events GROUP BY user_id HAVING COUNT(*) >= 3
),
seq AS (
  SELECT e.user_id, e.event_type,
         ROW_NUMBER() OVER (PARTITION BY e.user_id
                            ORDER BY e.ts, e.event_id) AS rn
  FROM events e JOIN eligible g ON e.user_id = g.user_id
),
cellcnt AS (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS nij
  FROM seq WHERE rn <= 3 GROUP BY user_id, event_type
),
subj AS (
  SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_subj,
         CAST(SUM(nij * nij) AS BIGINT) AS ss
  FROM cellcnt
),
marg AS (
  SELECT CAST(SUM(cj * cj) AS BIGINT) AS sc2,
         CAST(COUNT(*) AS BIGINT) AS n_cats
  FROM (SELECT event_type, CAST(SUM(nij) AS BIGINT) AS cj
        FROM cellcnt GROUP BY event_type)
),
k AS (
  SELECT n_subj, ss, sc2, n_cats,
         CAST(n_subj AS DOUBLE) * n_subj * 27 < 9e18 AS headroom
  FROM subj CROSS JOIN marg
)
SELECT n_subj AS n_subjects, CAST(3 AS BIGINT) AS n_raters, n_cats,
       CASE WHEN headroom AND n_subj > 0
            THEN ROUND(CAST(ss - 3 * n_subj AS DOUBLE)
                       / (6.0 * n_subj), 6) END AS p_bar,
       CASE WHEN headroom AND n_subj > 0
            THEN ROUND(CAST(sc2 AS DOUBLE)
                       / (9.0 * n_subj * n_subj), 6) END AS p_e,
       CASE WHEN headroom AND n_subj > 0
             AND 9 * n_subj * n_subj - sc2 > 0
            THEN ROUND(CAST(3 * n_subj * (ss - 3 * n_subj)
                            - 2 * sc2 AS DOUBLE)
                       / (2.0 * (9 * n_subj * n_subj - sc2)), 6)
       END AS kappa
FROM k
"""


def _agg_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' kappa over the deterministic three-rater panel (each
    eligible user's first three events rating event_type) — integer
    agreement folds, one terminal division. See _FLEISS_KAPPA."""
    load(spark, sf_dir)
    return spark.sql(_FLEISS_KAPPA)


QUERIES["agg_fleiss_kappa"] = _agg_fleiss_kappa
ORACLES["agg_fleiss_kappa"] = _FLEISS_KAPPA
