"""Exact-arithmetic statistical inference gates (rounds 8-13).

Two-sample tests (Mann-Whitney U, KS, Cramer-von Mises, Welch t,
Spearman, Benford), the k-group family (Kruskal-Wallis, ANOVA F,
Brown-Forsythe, Mood, chi-square independence), sequential detectors
(Page-Hinkley + streaming twin, streaming CUSUM twin), seasonal
anomaly machinery, equidepth bins, JSD drift, RAKE, cross-correlation.

Mechanically moved from queries/pipeline.py (round-12 split, VERDICT
r11 ask #6): zero query renames, zero spelling changes. pipeline.py
merges QUERIES/ORACLES from here and re-exports the private helpers,
so existing import sites are unaffected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_gpu_spark.operators import events, graph, text
from datafusion_gpu_spark.queries import load
from datafusion_gpu_spark.queries.pipeline_common import (
    _CUSUM_ORACLE,
    _sparse_copurchase_edges,
)

QUERIES: dict = {}
ORACLES: dict = {}

# ---------------------------------------------------------------------------
# Round 8 — exact-arithmetic statistical testing family. Each entry is ONE
# portable SQL run verbatim on both engines: ranks/ECDFs/moments reduce to
# bigint sums over value-level aggregates, so the only float ops are a fixed
# handful of identically-spelled IEEE divisions/sqrts at the very end
# (SQRT is correctly rounded by IEEE 754, unlike libm ln — the survival_km
# lesson), and every windowed cumulative runs over the DISTINCT-VALUE
# relation, never the row relation.
# ---------------------------------------------------------------------------

# Mann-Whitney U (Wilcoxon rank-sum) with tie correction: do 'click' and
# 'purchase' event values come from the same distribution? Rank algebra is
# done on the value-level aggregate: for a distinct value with tc total
# rows and cumb rows strictly below, every row there has
# 2*avg_rank = 2*cumb + tc + 1 (an integer — the classic *2 trick), so
# R_a, U_a and the tie term sum(t^3 - t) are exact bigints; z is one fixed
# float expression (one SQRT, three divisions) over exactly-converted
# operands, rounded to 4. Degenerate inputs (either group empty, or all
# pooled values tied) yield z_stat NULL via an integer predicate, never
# a 0-divide (ADVICE r8; same pattern as _SPEARMAN). The tie variance
# term collapses to zero exactly when there is ONE distinct pooled
# value, so the guard is nv > 1 on the distinct-value count — the
# algebraically equivalent N^3 - N > tie3 spelling overflows bigint at
# N ~ 2.1e6 rows (caught by the 10M-distinct-value window probe).
_MANN_WHITNEY = """
WITH t AS (
  SELECT event_type AS grp, CAST(ROUND(value * 100, 0) AS BIGINT) AS c
  FROM events
  WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL
),
pv AS (
  SELECT c,
         CAST(SUM(CASE WHEN grp = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS da,
         CAST(COUNT(*) AS BIGINT) AS tc
  FROM t GROUP BY c
),
cw AS (
  SELECT da, tc,
         CAST(COALESCE(SUM(tc) OVER (ORDER BY c
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS cumb
  FROM pv
),
s AS (
  SELECT CAST(SUM(da) AS BIGINT) AS n_a,
         CAST(SUM(tc - da) AS BIGINT) AS n_b,
         CAST(SUM(da * (2 * cumb + tc + 1)) AS BIGINT) AS r2_a,
         CAST(SUM(tc * tc * tc - tc) AS BIGINT) AS tie3,
         CAST(COUNT(*) AS BIGINT) AS nv
  FROM cw
)
SELECT n_a, n_b,
       r2_a - n_a * (n_a + 1) AS u2_a,
       tie3,
       CASE WHEN n_a > 0 AND n_b > 0 AND nv > 1
       THEN
       ROUND(((CAST(r2_a - n_a * (n_a + 1) AS DOUBLE)
               - CAST(n_a AS DOUBLE) * n_b) / 2)
             / SQRT(CAST(n_a AS DOUBLE) * n_b / 12.0
                    * (CAST(n_a + n_b + 1 AS DOUBLE)
                       - CAST(tie3 AS DOUBLE)
                         / (CAST(n_a + n_b AS DOUBLE) * (n_a + n_b - 1)))),
             4) END AS z_stat
FROM s
"""


def _agg_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-corrected Mann-Whitney U over click-vs-purchase event values
    — the nonparametric A/B location test (complements events_ab_test's
    t-style contrast and events_ab_srm's ratio gate). Scale shape: one
    hash aggregation to the value-level relation, then ONE ordered
    window over DISTINCT cent values (bounded by the value domain, not
    the row count) — the row relation is never globally sorted. See
    _MANN_WHITNEY for the integer rank algebra."""
    load(spark, sf_dir)
    return spark.sql(_MANN_WHITNEY)


# Two-sample Kolmogorov-Smirnov: D = max |ECDF_a - ECDF_b| over the merged
# support, kept exact as the integer numerator max|cum_a*n_b - cum_b*n_a|
# (D = that / (n_a*n_b)). The alpha=0.05 decision compares D to
# c(.05)*sqrt((n_a+n_b)/(n_a*n_b)) squared through (n_a*n_b)^2 — i.e.
# m^2 > c^2 * (n_a+n_b) * n_a * n_b with c^2 = 1.844164 — one float
# comparison of identically-spelled products of exact operands (m <= n_a*n_b
# stays double-exact through m^2 up to n_a*n_b ~ 9e7; the gate is 4e6).
_KS_TEST = """
WITH t AS (
  SELECT event_type AS grp, CAST(ROUND(value * 100, 0) AS BIGINT) AS c
  FROM events
  WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL
),
pv AS (
  SELECT c,
         CAST(SUM(CASE WHEN grp = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS da,
         CAST(SUM(CASE WHEN grp = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
           AS db
  FROM t GROUP BY c
),
cum AS (
  SELECT CAST(SUM(da) OVER (ORDER BY c) AS BIGINT) AS ca,
         CAST(SUM(db) OVER (ORDER BY c) AS BIGINT) AS cb
  FROM pv
),
nn AS (
  SELECT CAST(SUM(da) AS BIGINT) AS n_a, CAST(SUM(db) AS BIGINT) AS n_b
  FROM pv
),
mx AS (
  SELECT CAST(MAX(ABS(ca * n_b - cb * n_a)) AS BIGINT) AS m
  FROM cum CROSS JOIN nn
)
SELECT n_a, n_b, m AS d_num,
       CASE WHEN n_a > 0 AND n_b > 0 THEN
         ROUND(CAST(m AS DOUBLE) / (CAST(n_a AS DOUBLE) * n_b), 6)
       END AS d_stat,
       CASE WHEN n_a > 0 AND n_b > 0 THEN
         (CAST(m AS DOUBLE) * m
            > 1.844164 * (n_a + n_b) * CAST(n_a AS DOUBLE) * n_b)
       END AS reject_05
FROM mx CROSS JOIN nn
"""


def _events_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov distance between the click and
    purchase value distributions — the whole-shape drift test a
    pipeline runs when a mean test (events_ab_test) can't see a
    variance/tail change. The merged-ECDF window runs over distinct
    cent values only; the two one-row CTEs join as the documented
    exempt broadcast-scalar class. See _KS_TEST for the exact integer
    numerator and the cross-multiplied decision rule."""
    load(spark, sf_dir)
    return spark.sql(_KS_TEST)


# Spearman rank correlation per brand: Pearson over 2x-average-ranks
# (integers via 2*rank_min + tie_count - 1), so all five moments are exact
# bigint sums; rho is the one fixed float expression shared with
# events_autocorr / window_rolling_corr. Degenerate brands (any zero
# variance) are filtered by an integer predicate, not a float epsilon.
_SPEARMAN = """
WITH t AS (
  SELECT p_brand AS brand,
         CAST(ROUND(p_retailprice * 100, 0) AS BIGINT) AS x,
         CAST(p_size AS BIGINT) AS y
  FROM part
),
r AS (
  SELECT brand,
         2 * RANK() OVER (PARTITION BY brand ORDER BY x)
           + COUNT(*) OVER (PARTITION BY brand, x) - 1 AS rx,
         2 * RANK() OVER (PARTITION BY brand ORDER BY y)
           + COUNT(*) OVER (PARTITION BY brand, y) - 1 AS ry
  FROM t
),
m AS (
  SELECT brand, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(rx) AS BIGINT) AS sx, CAST(SUM(ry) AS BIGINT) AS sy,
         CAST(SUM(rx * rx) AS BIGINT) AS sxx,
         CAST(SUM(ry * ry) AS BIGINT) AS syy,
         CAST(SUM(rx * ry) AS BIGINT) AS sxy
  FROM r GROUP BY brand
)
SELECT brand, n AS n_parts,
       ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / SQRT((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                    * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)),
             6) AS rho
FROM m
WHERE n >= 2 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
"""


def _agg_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand Spearman rank correlation between part price and size
    — the monotone-association measure that survives outliers and
    nonlinearity where Pearson (agg_regression) does not. Rank windows
    partition by brand (bounded groups — no global sort anywhere);
    moments are exact bigints. See _SPEARMAN."""
    load(spark, sf_dir)
    return spark.sql(_SPEARMAN)


# Benford first-digit conformance of order totals — the classic synthetic-
# data / fraud smell test. The leading digit comes from the decimal string
# of the exact cent value (never FLOOR(LOG10(x)) — libm log10 is not
# ulp-pinned and floor flips at exact powers of ten); the nine expected
# probabilities are CONSTANTS (log10(1+1/d) pre-rounded to 6dp here, not
# computed in-engine), so the only engine float ops are one division and
# one subtraction per digit row. Rows are filtered on the QUANTIZED cent
# value (cents >= 1), not the raw price: a price in (0, 0.005) rounds to
# 0 cents, whose leading digit 0 matches no expd row — filtering on the
# raw price would count it in nt and p_obs would no longer sum to 1
# (ADVICE r8).
_BENFORD = """
WITH q AS (
  SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders
),
t AS (
  SELECT CAST(SUBSTRING(CAST(cents AS STRING), 1, 1) AS BIGINT) AS d
  FROM q WHERE cents >= 1
),
obs AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS n FROM t GROUP BY d),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nt FROM obs),
expd AS (
  SELECT 1 AS d, 0.301030 AS p
  UNION ALL SELECT 2, 0.176091 UNION ALL SELECT 3, 0.124939
  UNION ALL SELECT 4, 0.096910 UNION ALL SELECT 5, 0.079181
  UNION ALL SELECT 6, 0.066947 UNION ALL SELECT 7, 0.057992
  UNION ALL SELECT 8, 0.051153 UNION ALL SELECT 9, 0.045757
)
SELECT CAST(e.d AS BIGINT) AS digit,
       COALESCE(o.n, 0) AS n_obs,
       CAST(e.p AS DOUBLE) AS p_benford,
       ROUND(CAST(COALESCE(o.n, 0) AS DOUBLE) / nt, 6) AS p_obs,
       ROUND(ABS(CAST(COALESCE(o.n, 0) AS DOUBLE) / nt
                 - CAST(e.p AS DOUBLE)), 6) AS abs_dev
FROM expd e LEFT JOIN obs o ON o.d = e.d CROSS JOIN tot
"""


def _agg_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of order totals vs
    Benford's law — the data-quality screen that catches synthetic or
    truncated monetary columns before they poison a training mix. One
    row-level aggregation; the nine-row expected relation joins as a
    broadcast; the one-row total is the exempt scalar class. See
    _BENFORD for why the digit is extracted from the exact cent string
    rather than via log10."""
    load(spark, sf_dir)
    return spark.sql(_BENFORD)


# Bollinger-band breakouts over the hourly purchase-cents series: a point
# breaks the 24h +/-2-sigma band iff (n*x - S1)^2 > 4*(n*S2 - S1^2) with
# n = 24 — the squared inequality clears both the division by n and the
# square root, so every band decision is EXACT BIGINT arithmetic (cents
# keep all four products under 2^63 through ~sf0.1; rescale the quantum to
# dollars for the same headroom at 100x — the knob, not a redesign).
_BOLLINGER = """
WITH hourly AS (
  SELECT DATE_TRUNC('hour', ts) AS h,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents
  FROM events
  WHERE event_type = 'purchase' AND value IS NOT NULL
  GROUP BY DATE_TRUNC('hour', ts)
),
w AS (
  SELECT h, cents,
         CAST(COUNT(*) OVER (ORDER BY h
                ROWS BETWEEN 23 PRECEDING AND CURRENT ROW) AS BIGINT) AS n,
         CAST(SUM(cents) OVER (ORDER BY h
                ROWS BETWEEN 23 PRECEDING AND CURRENT ROW) AS BIGINT) AS s1,
         CAST(SUM(cents * cents) OVER (ORDER BY h
                ROWS BETWEEN 23 PRECEDING AND CURRENT ROW) AS BIGINT) AS s2
  FROM hourly
)
SELECT h, cents,
       CAST(FLOOR(CAST(s1 AS DOUBLE) / n) AS BIGINT) AS mean_cents,
       (n = 24 AND 24 * cents > s1
          AND (24 * cents - s1) * (24 * cents - s1)
                > 4 * (24 * s2 - s1 * s1)) AS break_upper,
       (n = 24 AND 24 * cents < s1
          AND (24 * cents - s1) * (24 * cents - s1)
                > 4 * (24 * s2 - s1 * s1)) AS break_lower
FROM w
"""


def _window_bollinger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-24h Bollinger band (mean +/- 2 sigma) breakout flags on
    the hourly purchase series — the volatility-aware twin of the
    fixed-k anomaly monitors (events_anomalies, events_anomaly_mad).
    Same single-series window caveat as window_rolling_corr: the hourly
    relation is time-bounded, and a per-key deployment partitions the
    frame by key. Every breakout decision is exact bigint arithmetic —
    see _BOLLINGER for the squared-inequality spelling."""
    load(spark, sf_dir)
    return spark.sql(_BOLLINGER)


QUERIES["agg_mann_whitney"] = _agg_mann_whitney
QUERIES["events_ks_test"] = _events_ks_test
QUERIES["agg_spearman"] = _agg_spearman
QUERIES["agg_benford"] = _agg_benford
QUERIES["window_bollinger"] = _window_bollinger
ORACLES["agg_mann_whitney"] = _MANN_WHITNEY
ORACLES["events_ks_test"] = _KS_TEST
ORACLES["agg_spearman"] = _SPEARMAN
ORACLES["agg_benford"] = _BENFORD
ORACLES["window_bollinger"] = _BOLLINGER


def _graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity (graph.degree_assortativity, Newman 2002)
    of the bulk-purchase co-purchase graph — does this graph mix hubs
    with hubs? The number that decides whether the hub-cap guards
    (common_neighbors/local_clustering max_degree) are load-bearing.
    Exact bigint moments over both edge orientations, one terminal
    float expression; the oracle replays the identical moment algebra
    in SQL."""
    load(spark, sf_dir)
    return graph.degree_assortativity(_sparse_copurchase_edges(spark))


QUERIES["graph_assortativity"] = _graph_assortativity
ORACLES["graph_assortativity"] = """
WITH e AS (
  SELECT DISTINCT a.l_partkey AS lo, b.l_partkey AS hi
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  WHERE a.l_quantity >= 40 AND b.l_quantity >= 40
),
bo AS (SELECT lo AS u, hi AS v FROM e UNION ALL SELECT hi AS u, lo AS v FROM e),
deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS d FROM bo GROUP BY u),
p AS (
  SELECT du.d AS dx, dv.d AS dy
  FROM bo JOIN deg du ON bo.u = du.u JOIN deg dv ON bo.v = dv.u
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS m2,
         CAST(SUM(dx) AS BIGINT) AS sx,
         CAST(SUM(dx * dx) AS BIGINT) AS sxx,
         CAST(SUM(dy * dy) AS BIGINT) AS syy,
         CAST(SUM(dx * dy) AS BIGINT) AS sxy
  FROM p
)
SELECT CAST(m2 / 2 AS BIGINT) AS n_edges,
       CASE WHEN m2 * sxx - sx * sx > 0 AND m2 * syy - sx * sx > 0
            THEN ROUND((CAST(m2 AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sx)
                 / SQRT((CAST(m2 AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                        * (CAST(m2 AS DOUBLE) * syy - CAST(sx AS DOUBLE) * sx)),
                 6)
            END AS r
FROM m
"""


def _streaming_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of events_changepoint_cusum
    (streaming.stream_cusum): batch-trained integer baseline +
    stateful two-bigint CUSUM automaton in applyInPandasWithState,
    integer-only Python. Graded by the BATCH oracle — the
    stream==batch contract, 14th streaming twin."""
    load(spark, sf_dir)
    from datafusion_gpu_spark import streaming

    return streaming.stream_cusum(spark, sf_dir)


QUERIES["streaming_cusum"] = _streaming_cusum
ORACLES["streaming_cusum"] = _CUSUM_ORACLE


# ---------------------------------------------------------------------------
# Round 9 additions.
# ---------------------------------------------------------------------------


def _text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (text.rake_keywords, Rose et al. 2010)
    over the corpus: top-20 stopword-delimited phrases by summed
    deg/freq word score — the corpus-statistics-free keyworder that
    complements text_collocations (PMI) and retrieval_tfidf. Word
    scores are 1e-9-quantized bigints before the per-phrase sum, so the
    ranking is engine-independent; the oracle replays the identical
    gaps-and-islands + deg/freq algebra in SQL."""
    load(spark, sf_dir)
    return text.rake_keywords(spark.table("documents"), top_k=20)


QUERIES["text_rake_keywords"] = _text_rake_keywords
# Same normalize/split tokenization, same stopword set, same running-
# stopword-count island ids, same 1e-9 deg/freq quantization, same
# (score DESC, phrase) top-20.
ORACLES["text_rake_keywords"] = r"""
WITH norm AS (
  SELECT doc_id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS t
  FROM documents
),
words AS (
  SELECT doc_id, u.i AS pos, arr[u.i] AS word
  FROM (SELECT doc_id, string_split(t, ' ') AS arr FROM norm),
       UNNEST(range(1, len(arr) + 1)) AS u(i)
),
flagged AS (
  SELECT doc_id, pos, word,
         CASE WHEN word IN ('the','a','an','of','and','or','to','in','is',
                            'on','for','with','as','by','at','it')
              THEN 1 ELSE 0 END AS is_stop
  FROM words
),
content AS (
  SELECT * FROM (
    SELECT doc_id, pos, word, is_stop,
           SUM(is_stop) OVER (PARTITION BY doc_id ORDER BY pos) AS island
    FROM flagged
  ) WHERE is_stop = 0
),
phrases AS (
  SELECT doc_id, island,
         string_agg(word, ' ' ORDER BY pos) AS phrase,
         CAST(COUNT(*) AS BIGINT) AS n_words
  FROM content GROUP BY doc_id, island
),
sq AS (
  SELECT word,
         CAST(ROUND(CAST(SUM(n_words) AS DOUBLE) / COUNT(*) * 1e9, 0)
              AS BIGINT) AS sq
  FROM content JOIN phrases USING (doc_id, island)
  GROUP BY word
),
pscore AS (
  SELECT doc_id, island, CAST(SUM(sq) AS BIGINT) AS score_q
  FROM content JOIN sq USING (word) GROUP BY doc_id, island
),
agg AS (
  SELECT phrase,
         CAST(MIN(n_words) AS BIGINT) AS n_words,
         CAST(COUNT(*) AS BIGINT) AS n_occurrences,
         CAST(MIN(score_q) AS BIGINT) AS score_q
  FROM pscore JOIN phrases USING (doc_id, island) GROUP BY phrase
)
SELECT phrase, n_words, n_occurrences,
       ROUND(score_q / 1e9, 4) AS score
FROM agg ORDER BY score DESC, phrase LIMIT 20
"""


def _agg_mann_whitney_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The two-level bucketed-cumsum spelling of agg_mann_whitney
    (stats.mann_whitney_u): identical doubled-rank integer algebra and
    terminal float expression, but the distinct-value cumulative runs
    as per-bucket parallel windows + an n_buckets-row offset window +
    a broadcast recombination — the documented fallback for value
    domains past a few million distinct values (SCALE.md two-level
    spelling). Graded by the SAME oracle as the single-window SQL, so
    a green row here IS the parity proof at gate scale."""
    load(spark, sf_dir)
    from datafusion_gpu_spark.operators import stats

    ev = spark.table("events").select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    return stats.mann_whitney_u(
        ev, "event_type", "cents", "click", "purchase", n_buckets=64
    )


def _events_ks_test_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level bucketed-cumsum spelling of events_ks_test
    (stats.ks_two_sample) — same exact integer ECDF numerator and
    cross-multiplied decision, cumulatives via stats.bucketed_cumsum.
    Graded by the single-window SQL's oracle."""
    load(spark, sf_dir)
    from datafusion_gpu_spark.operators import stats

    ev = spark.table("events").select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    return stats.ks_two_sample(
        ev, "event_type", "cents", "click", "purchase", n_buckets=64
    )


QUERIES["agg_mann_whitney_bucketed"] = _agg_mann_whitney_bucketed
QUERIES["events_ks_test_bucketed"] = _events_ks_test_bucketed


# Two-sample Cramér-von Mises (Anderson 1962): the whole-curve companion
# to events_ks_test on the SAME distinct-value cumulative machinery — KS
# takes the max ECDF gap, CvM the tc-weighted integral of the SQUARED
# gap, so broad mid-distribution drift that never produces one large gap
# still registers. Exact bigint gap numerators; ONE 1e12 quantization of
# each squared relative gap (identical IEEE ops both engines); bigint
# fold with the VISIBLE N >= 9e6 headroom guard; asymptotic 0.461
# critical value (Anderson & Darling 1952). Spark side runs
# operators/stats.cvm_two_sample (cumsum_auto-routed).
_CVM_TEST = """
WITH t AS (
  SELECT event_type AS grp, CAST(ROUND(value * 100, 0) AS BIGINT) AS c
  FROM events
  WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL
),
pv AS (
  SELECT c,
         CAST(SUM(CASE WHEN grp = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS da,
         CAST(SUM(CASE WHEN grp = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
           AS db
  FROM t GROUP BY c
),
cum AS (
  SELECT CAST(SUM(da) OVER (ORDER BY c) AS BIGINT) AS ca,
         CAST(SUM(db) OVER (ORDER BY c) AS BIGINT) AS cb,
         da + db AS tc
  FROM pv
),
nn AS (
  SELECT CAST(SUM(da) AS BIGINT) AS n_a, CAST(SUM(db) AS BIGINT) AS n_b
  FROM pv
),
s AS (
  SELECT CAST(SUM(tc * CAST(ROUND(1e12
           * (CAST(ca * n_b - cb * n_a AS DOUBLE)
              / (CAST(n_a AS DOUBLE) * n_b))
           * (CAST(ca * n_b - cb * n_a AS DOUBLE)
              / (CAST(n_a AS DOUBLE) * n_b)), 0) AS BIGINT))
         AS BIGINT) AS s_q
  FROM cum CROSS JOIN nn
)
SELECT n_a, n_b,
       CASE WHEN n_a > 0 AND n_b > 0 AND n_a + n_b < 9000000
            THEN s_q END AS s_q,
       CASE WHEN n_a > 0 AND n_b > 0 AND n_a + n_b < 9000000 THEN
         ROUND(CAST(n_a AS DOUBLE) * n_b
               / ((CAST(n_a AS DOUBLE) + n_b) * (CAST(n_a AS DOUBLE) + n_b))
               * (CAST(s_q AS DOUBLE) / 1e12), 6)
       END AS t_stat,
       CASE WHEN n_a > 0 AND n_b > 0 AND n_a + n_b < 9000000 THEN
         (CAST(n_a AS DOUBLE) * n_b
            / ((CAST(n_a AS DOUBLE) + n_b) * (CAST(n_a AS DOUBLE) + n_b))
            * (CAST(s_q AS DOUBLE) / 1e12) > 0.461)
       END AS reject_05
FROM s CROSS JOIN nn
"""


def _events_cvm_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Cramér-von Mises between the click and purchase value
    distributions (operators/stats.cvm_two_sample): the integrated-
    squared-gap drift test next to events_ks_test's max-gap, on the
    same runtime-routed distinct-value cumulative. See _CVM_TEST."""
    from datafusion_gpu_spark.operators import stats

    load(spark, sf_dir)
    ev = spark.table("events").select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    return stats.cvm_two_sample(ev, "event_type", "cents", "click", "purchase")


QUERIES["events_cvm_test"] = _events_cvm_test
ORACLES["events_cvm_test"] = _CVM_TEST


# Page-Hinkley mean-shift detector (Page 1954; Hinkley 1971) over the
# hourly value series per event type — the sequential drift monitor next
# to CUSUM (events_changepoint_cusum tests against a FIXED baseline;
# Page-Hinkley tracks deviation from the RUNNING mean, so it needs no
# training pass and adapts to slow level moves). Spelling: hourly sums
# are exact cents; each deviation term x_t - mean_t quantizes ONCE to a
# 1e-6-cent bigint (identical IEEE division/round both engines); the PH
# statistic is the quantized cumsum minus its running minimum (floored
# at 0, the CUSUM convention), all exact bigint window folds partitioned
# by type. VISIBLE headroom guard: |M_t| <= t * max|g|, so ph/alarm go
# NULL when running max|g| * t approaches int64 (the quantum is the
# knob). Alarm at lambda = $100 (1e10 in quantized units).
_PAGE_HINKLEY = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS x
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
),
c AS (
  SELECT event_type, bucket, x,
         CAST(ROW_NUMBER() OVER wo AS BIGINT) AS t,
         CAST(SUM(x) OVER w AS BIGINT) AS sx
  FROM hourly
  WINDOW wo AS (PARTITION BY event_type ORDER BY bucket),
         w AS (PARTITION BY event_type ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
g AS (
  SELECT event_type, bucket, x, t,
         CAST(ROUND(1e6 * (CAST(x AS DOUBLE) - CAST(sx AS DOUBLE) / t), 0)
              AS BIGINT) AS gq
  FROM c
),
m AS (
  SELECT event_type, bucket, x, t, gq,
         CAST(SUM(gq) OVER w AS BIGINT) AS mt,
         CAST(MAX(ABS(gq)) OVER w AS BIGINT) AS mg
  FROM g
  WINDOW w AS (PARTITION BY event_type ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
p AS (
  SELECT event_type, bucket, x, t, gq, mt, mg,
         CAST(LEAST(CAST(0 AS BIGINT), MIN(mt) OVER w) AS BIGINT) AS minm
  FROM m
  WINDOW w AS (PARTITION BY event_type ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_type, bucket, x, t, gq, mt,
       CASE WHEN CAST(mg AS DOUBLE) * t < 9e18 THEN mt - minm END AS ph,
       CASE WHEN CAST(mg AS DOUBLE) * t < 9e18 THEN
         (mt - minm > 10000000000) END AS alarm
FROM p
"""


def _events_page_hinkley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-Hinkley running-mean drift detector over the hourly value
    series per event type — quantized deviation terms, exact bigint
    cumsum minus running minimum, visible int64 headroom guard. See
    _PAGE_HINKLEY."""
    load(spark, sf_dir)
    return spark.sql(_PAGE_HINKLEY)


def _streaming_page_hinkley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of events_page_hinkley
    (streaming.stream_page_hinkley): per-type state is SIX bigints plus
    the open hour's accumulator; each event re-emits the open bucket's
    provisional row, which equals the batch row once the hour is fully
    absorbed — graded by the BATCH oracle (21st stream==batch twin)."""
    load(spark, sf_dir)
    from datafusion_gpu_spark import streaming

    return streaming.stream_page_hinkley(spark, sf_dir)


QUERIES["events_page_hinkley"] = _events_page_hinkley
QUERIES["streaming_page_hinkley"] = _streaming_page_hinkley
ORACLES["events_page_hinkley"] = _PAGE_HINKLEY
ORACLES["streaming_page_hinkley"] = _PAGE_HINKLEY
ORACLES["agg_mann_whitney_bucketed"] = _MANN_WHITNEY
ORACLES["events_ks_test_bucketed"] = _KS_TEST


# Welch's unequal-variance t-test: click vs purchase event values. Moments
# (n, sum, sum-of-squares per group) are exact bigint folds over cent
# values; means/variances/t/df are terminal double expressions (products
# of exact operands computed in DOUBLE — a bigint n*s2 product would
# overflow around sf700; the s2 fold itself holds to ~5e18 at cent
# quantization, the quantum is the knob). Degenerate guards are integer
# predicates: n>=2 per group, and pooled squared-error > 0 via distinct-
# value counts (variance is zero iff a group has ONE distinct value — the
# overflow-free nv spelling, same lesson as agg_mann_whitney's guard).
_WELCH_T = """
WITH t AS (
  SELECT event_type AS grp, CAST(ROUND(value * 100, 0) AS BIGINT) AS c
  FROM events
  WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL
),
m AS (
  SELECT
    CAST(SUM(CASE WHEN grp = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
    CAST(SUM(CASE WHEN grp = 'click' THEN c ELSE 0 END) AS BIGINT) AS s1_a,
    CAST(SUM(CASE WHEN grp = 'click' THEN c * c ELSE 0 END) AS BIGINT) AS s2_a,
    CAST(COUNT(DISTINCT CASE WHEN grp = 'click' THEN c END) AS BIGINT) AS nv_a,
    CAST(SUM(CASE WHEN grp = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
    CAST(SUM(CASE WHEN grp = 'purchase' THEN c ELSE 0 END) AS BIGINT) AS s1_b,
    CAST(SUM(CASE WHEN grp = 'purchase' THEN c * c ELSE 0 END) AS BIGINT) AS s2_b,
    CAST(COUNT(DISTINCT CASE WHEN grp = 'purchase' THEN c END) AS BIGINT) AS nv_b
  FROM t
),
v AS (
  SELECT n_a, n_b, nv_a, nv_b, s1_a, s1_b,
         (CAST(n_a AS DOUBLE) * s2_a - CAST(s1_a AS DOUBLE) * s1_a)
           / (CAST(n_a AS DOUBLE) * n_a * (n_a - 1)) AS vn_a,
         (CAST(n_b AS DOUBLE) * s2_b - CAST(s1_b AS DOUBLE) * s1_b)
           / (CAST(n_b AS DOUBLE) * n_b * (n_b - 1)) AS vn_b
  FROM m WHERE n_a >= 2 AND n_b >= 2
)
SELECT n_a, n_b,
       ROUND(CAST(s1_a AS DOUBLE) / n_a - CAST(s1_b AS DOUBLE) / n_b, 6)
         AS mean_diff_cents,
       CASE WHEN nv_a > 1 OR nv_b > 1 THEN
         ROUND((CAST(s1_a AS DOUBLE) / n_a - CAST(s1_b AS DOUBLE) / n_b)
               / SQRT(vn_a + vn_b), 4)
       END AS t_stat,
       CASE WHEN nv_a > 1 OR nv_b > 1 THEN
         ROUND((vn_a + vn_b) * (vn_a + vn_b)
               / (vn_a * vn_a / (n_a - 1) + vn_b * vn_b / (n_b - 1)), 2)
       END AS df
FROM v
"""


def _agg_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test on click-vs-purchase event values
    — the parametric mean test a curation gate runs when the two
    samples' variances differ (the pooled-variance events_ab_test
    assumes them equal; Mann-Whitney drops the location model
    entirely). vn_a/vn_b in the SQL are var_i/n_i (the per-group
    squared standard errors), so t and the Welch-Satterthwaite df are
    the textbook forms. One hash aggregation, zero joins, zero windows
    — the cheapest plan in the family. See _WELCH_T."""
    load(spark, sf_dir)
    return spark.sql(_WELCH_T)


# Chi-squared two-way independence (priority x status contingency over
# orders) via the exact identity chi2 = N * (sum obs^2/(rowtot*coltot) - 1)
# — algebraically equal to sum (obs-exp)^2/exp INCLUDING empty cells
# (which contribute exp to the classic form and 0 to the identity's sum;
# the -N term absorbs exactly that). Each cell ratio <= 1 is quantized to
# 1e-12 bigints so the across-cell fold is exact integer arithmetic (the
# RAKE/zipf trick); quantization bias <= N * cells * 5e-13, and the CASE
# guard makes the headroom limit VISIBLE: past N * cells >= 1e8 (~sf10
# for this shape) chi2 is NULL instead of drifting at the 4dp round
# (round-10 ADVICE; the knob is the 1e12 quantum — see _MOOD_MEDIAN's
# note). The existing agg_chi_squared is goodness-of-fit against fixed
# probabilities; this is the two-margin independence test.
_CHI2_INDEP = """
WITH obs AS (
  SELECT o_orderpriority AS r, o_orderstatus AS c,
         CAST(COUNT(*) AS BIGINT) AS o
  FROM orders GROUP BY o_orderpriority, o_orderstatus
),
rt AS (SELECT r, CAST(SUM(o) AS BIGINT) AS nr FROM obs GROUP BY r),
ct AS (SELECT c, CAST(SUM(o) AS BIGINT) AS nc FROM obs GROUP BY c),
tot AS (SELECT CAST(SUM(o) AS BIGINT) AS nt FROM obs),
q AS (
  SELECT CAST(ROUND(CAST(o.o AS DOUBLE) * o.o
                    / (CAST(rt.nr AS DOUBLE) * ct.nc) * 1e12, 0) AS BIGINT)
           AS term_q
  FROM obs o JOIN rt ON o.r = rt.r JOIN ct ON o.c = ct.c
),
s AS (
  SELECT CAST(SUM(term_q) AS BIGINT) AS sq,
         CAST(COUNT(*) AS BIGINT) AS n_cells
  FROM q
),
d AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM rt) AS kr,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM ct) AS kc
)
SELECT n_cells,
       (kr - 1) * (kc - 1) AS df,
       CASE WHEN kr > 1 AND kc > 1
             AND CAST(nt AS DOUBLE) * n_cells * 5e-13 < 5e-5 THEN
         ROUND(CAST(nt AS DOUBLE) * (CAST(sq AS DOUBLE) / 1e12 - 1), 4)
       END AS chi2
FROM s CROSS JOIN tot CROSS JOIN d
"""


def _agg_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-squared test of independence between order priority and
    order status — the two-way-margin counterpart of agg_chi_squared's
    fixed-probability goodness-of-fit; the categorical drift gate
    between corpus snapshots. Plan: one contingency aggregation, two
    margin re-aggregations joined back by key (both margin relations
    are category-sized — broadcast), one exact quantized fold. See
    _CHI2_INDEP for the empty-cell-exact identity."""
    load(spark, sf_dir)
    return spark.sql(_CHI2_INDEP)


QUERIES["agg_welch_ttest"] = _agg_welch_ttest
QUERIES["agg_chi2_independence"] = _agg_chi2_independence
ORACLES["agg_welch_ttest"] = _WELCH_T
ORACLES["agg_chi2_independence"] = _CHI2_INDEP


# ---------------------------------------------------------------------------
# Round 9 — k-group inference family. Extends the two-sample r8 tests to
# the k-sample questions a curation pipeline asks across ALL segments at
# once (are the five event types drawn from one value distribution?).
# Same portable-SQL contract: value-level aggregates, exact bigint folds,
# per-group float terms quantized to bigints BEFORE the cross-group sum
# (a plain double SUM over groups would be accumulation-order-dependent
# cross-engine), terminal IEEE ops only.
# ---------------------------------------------------------------------------

# Kruskal-Wallis H (tie-corrected) across all five event types. Rank
# algebra on the distinct-value relation exactly as agg_mann_whitney
# (doubled average ranks are integers); per-group doubled rank sums R2_g
# are exact bigints; the cross-group sum uses the deviation form
# H = 3/(N(N+1)) * sum_g e_g^2/n_g with e_g = R2_g - n_g*(N+1) (exact
# bigint), each group's e^2/n term ROUNDED but summed in DOUBLE: under
# strong group separation e_g ~ n_g*N so a term reaches ~n_g*N^2 (N^3
# worst case), which would wrap a bigint fold near N ~ 3e6 (round-10
# ADVICE). Each rounded term is integer-valued, so the double sum is
# EXACT (hence order-independent cross-engine) below 2^53 — full
# separation at N ~ 2e5 — and beyond that degrades to ~1e-16 relative
# error against an H scale of O(N): invisible at the 4dp round until
# N ~ 1e11, where the bigint spelling wrapped silently. Tie correction
# divides by 1 - tie3/(N^3-N) computed in double (the bigint N^3
# spelling overflows at N~2.1e6 — the r9 probe lesson); e_g itself is
# exact bigint up to n_g*N ~ 9.2e18, i.e. N ~ 3e9 rows.
_KRUSKAL_WALLIS = """
WITH t AS (
  SELECT event_type AS grp, CAST(ROUND(value * 100, 0) AS BIGINT) AS c
  FROM events WHERE value IS NOT NULL
),
vg AS (
  SELECT grp, c, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM t GROUP BY grp, c
),
pv AS (
  SELECT c, CAST(SUM(cnt) AS BIGINT) AS tc FROM vg GROUP BY c
),
cw AS (
  SELECT c, tc,
         CAST(COALESCE(SUM(tc) OVER (ORDER BY c
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS cumb
  FROM pv
),
g AS (
  SELECT vg.grp,
         CAST(SUM(vg.cnt) AS BIGINT) AS n_g,
         CAST(SUM(vg.cnt * (2 * cw.cumb + cw.tc + 1)) AS BIGINT) AS r2_g
  FROM vg JOIN cw ON vg.c = cw.c
  GROUP BY vg.grp
),
tot AS (
  SELECT CAST(SUM(tc) AS BIGINT) AS n,
         CAST(SUM(tc * tc * tc - tc) AS BIGINT) AS tie3,
         CAST(COUNT(*) AS BIGINT) AS nv
  FROM pv
),
q AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         SUM(ROUND(
           CAST(r2_g - n_g * (n + 1) AS DOUBLE)
             * (r2_g - n_g * (n + 1)) / n_g, 0)) AS sq
  FROM g CROSS JOIN tot
)
SELECT n AS n_total, k AS k_groups, (k - 1) AS df, tie3,
       CASE WHEN nv > 1 AND k > 1 THEN
         ROUND(3.0 * sq / (CAST(n AS DOUBLE) * (n + 1))
               / (1.0 - CAST(tie3 AS DOUBLE)
                        / (CAST(n AS DOUBLE) * n * n - n)), 4)
       END AS h_stat
FROM q CROSS JOIN tot
"""


def _agg_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-corrected Kruskal-Wallis H across all five event types — the
    k-sample extension of agg_mann_whitney (same doubled-rank algebra
    on the distinct-value relation, deviation-form cross-group fold).
    Scale shape: value-group + value aggregations, ONE window over
    distinct cents, a k-row final fold. See _KRUSKAL_WALLIS."""
    load(spark, sf_dir)
    return spark.sql(_KRUSKAL_WALLIS)


# One-way ANOVA F across event types: SSB/SSW from exact per-group
# (n, s1, s2) cent moments. Each group's s1^2/n term is rounded to a
# bigint before the cross-group sum (same quantized-fold trick as RAKE /
# chi2 / Kruskal-Wallis); the degenerate guard is the INTEGER predicate
# s2 > tq on the QUANTIZED divisor itself — guarding on the unquantized
# variance (count distinct (grp, cent) > k) is not enough, because tq
# can round UP to exactly s2 while the true SSW is a positive fraction,
# leaving a 0-divide behind a passing guard (caught by round-9 review:
# cents {1,2} give s1^2/n = 4.5 -> tq 5 == s2). When quantization eats
# a sub-cent SSW the query emits NULL — conservative and identical on
# both engines.
_ANOVA_F = """
WITH t AS (
  SELECT event_type AS grp, CAST(ROUND(value * 100, 0) AS BIGINT) AS c
  FROM events WHERE value IS NOT NULL
),
g AS (
  SELECT grp,
         CAST(COUNT(*) AS BIGINT) AS n_g,
         CAST(SUM(c) AS BIGINT) AS s1_g,
         CAST(SUM(c * c) AS BIGINT) AS s2_g,
         CAST(COUNT(DISTINCT c) AS BIGINT) AS nv_g
  FROM t GROUP BY grp
),
q AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(n_g) AS BIGINT) AS n,
         CAST(SUM(s1_g) AS BIGINT) AS s1,
         CAST(SUM(s2_g) AS BIGINT) AS s2,
         CAST(SUM(nv_g) AS BIGINT) AS nvg,
         CAST(SUM(CAST(ROUND(
           CAST(s1_g AS DOUBLE) * s1_g / n_g, 0) AS BIGINT)) AS BIGINT) AS tq
  FROM g
)
SELECT n AS n_total, k AS k_groups,
       (k - 1) AS df_between, (n - k) AS df_within,
       CASE WHEN k > 1 AND n > k AND s2 > tq THEN
         ROUND(((CAST(tq AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n) / (k - 1))
               / ((CAST(s2 AS DOUBLE) - tq) / (n - k)), 4)
       END AS f_stat
FROM q
"""


def _agg_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F across all five event types — the parametric
    k-group mean test (Welch's t generalizes pairwise; this is the
    omnibus gate). One hash aggregation to k rows, zero joins/windows
    — the cheapest plan in the family. See _ANOVA_F."""
    load(spark, sf_dir)
    return spark.sql(_ANOVA_F)


# Brown-Forsythe (Levene-on-medians) homogeneity-of-variance test: ANOVA
# F applied to z = |2c - 2*median_g| — DOUBLED absolute deviations from
# the group median, because 2*median of integers is always itself an
# integer (single middle -> 2a; even-count interpolation -> a+b), so z
# is an exact bigint and the whole downstream fold is the exact ANOVA
# algebra (F is scale-invariant: the 2x cancels). The one engine float
# is percentile/median itself, whose interpolated value is exactly
# representable, CAST back to bigint identically on both engines.
_BROWN_FORSYTHE = """
WITH t AS (
  SELECT event_type AS grp, CAST(ROUND(value * 100, 0) AS BIGINT) AS c
  FROM events WHERE value IS NOT NULL
),
med AS (
  SELECT grp, CAST(ROUND(2 * MEDIAN(c), 0) AS BIGINT) AS m2
  FROM t GROUP BY grp
),
d AS (
  SELECT t.grp, ABS(2 * t.c - med.m2) AS z
  FROM t JOIN med ON t.grp = med.grp
),
g AS (
  SELECT grp,
         CAST(COUNT(*) AS BIGINT) AS n_g,
         CAST(SUM(z) AS BIGINT) AS s1_g,
         CAST(SUM(z * z) AS BIGINT) AS s2_g,
         CAST(COUNT(DISTINCT z) AS BIGINT) AS nv_g
  FROM d GROUP BY grp
),
q AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(n_g) AS BIGINT) AS n,
         CAST(SUM(s1_g) AS BIGINT) AS s1,
         CAST(SUM(s2_g) AS BIGINT) AS s2,
         CAST(SUM(nv_g) AS BIGINT) AS nvg,
         CAST(SUM(CAST(ROUND(
           CAST(s1_g AS DOUBLE) * s1_g / n_g, 0) AS BIGINT)) AS BIGINT) AS tq
  FROM g
)
SELECT n AS n_total, k AS k_groups,
       (k - 1) AS df_between, (n - k) AS df_within,
       CASE WHEN k > 1 AND n > k AND s2 > tq THEN
         ROUND(((CAST(tq AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n) / (k - 1))
               / ((CAST(s2 AS DOUBLE) - tq) / (n - k)), 4)
       END AS f_stat
FROM q
"""


def _agg_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe homogeneity-of-variance test across event types —
    the gate that decides whether pooled-variance tests (events_ab_test,
    agg_anova_f) are trustworthy or the Welch corrections are needed.
    Plan: one exact per-group median, one broadcast-size join back
    (k-row med relation), then the exact ANOVA fold on integer doubled
    deviations. See _BROWN_FORSYTHE."""
    load(spark, sf_dir)
    return spark.sql(_BROWN_FORSYTHE)


QUERIES["agg_kruskal_wallis"] = _agg_kruskal_wallis
QUERIES["agg_anova_f"] = _agg_anova_f
QUERIES["agg_brown_forsythe"] = _agg_brown_forsythe
ORACLES["agg_kruskal_wallis"] = _KRUSKAL_WALLIS
ORACLES["agg_anova_f"] = _ANOVA_F
ORACLES["agg_brown_forsythe"] = _BROWN_FORSYTHE


def _streaming_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of agg_welch_ttest (streaming.stream_welch_ttest):
    incremental exact moments + streaming-dedup distinct counts, batch
    terminal expression — graded by the BATCH oracle (the stream==batch
    contract, 15th twin)."""
    load(spark, sf_dir)
    from datafusion_gpu_spark import streaming

    return streaming.stream_welch_ttest(spark, sf_dir)


QUERIES["streaming_welch_ttest"] = _streaming_welch_ttest
ORACLES["streaming_welch_ttest"] = _WELCH_T


def _events_cross_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag -3..+3 cross-correlation between the hourly click-count and
    purchase-cents series (events.cross_correlation) — the lead/lag
    diagnostic (do clicks lead purchases?) that precedes any causal
    read of paired telemetry; the two-series sibling of events_autocorr
    with the same exact-bigint-moment contract. Buckets where either
    series is absent are dropped by the inner join (positional lags
    over observed shared buckets — the autocorr convention)."""
    load(spark, sf_dir)
    ev = spark.table("events")
    x = (
        ev.where(F.col("event_type") == "click")
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("bucket"))
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    y = (
        ev.where((F.col("event_type") == "purchase") & F.col("value").isNotNull())
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("bucket"))
        .agg(
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("y")
        )
    )
    joined = x.join(y, "bucket")
    return events.cross_correlation(joined, "bucket", "x", "y", max_lag=3)


QUERIES["events_cross_corr"] = _events_cross_corr
# Same hourly series, same inner join, same positional LAG over shared
# buckets, same exact moments and terminal Pearson expression.
ORACLES["events_cross_corr"] = """
WITH x AS (
  SELECT date_trunc('hour', ts) AS bucket, CAST(COUNT(*) AS BIGINT) AS x
  FROM events WHERE event_type = 'click' GROUP BY 1
),
y AS (
  SELECT date_trunc('hour', ts) AS bucket,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS y
  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL GROUP BY 1
),
j AS (SELECT x.bucket, x.x, y.y FROM x JOIN y ON x.bucket = y.bucket),
l AS (
  SELECT x AS x0, y AS y0,
         LAG(x, 1) OVER w AS xl1, LAG(y, 1) OVER w AS yl1,
         LAG(x, 2) OVER w AS xl2, LAG(y, 2) OVER w AS yl2,
         LAG(x, 3) OVER w AS xl3, LAG(y, 3) OVER w AS yl3
  FROM j
  WINDOW w AS (ORDER BY bucket)
),
p AS (
  SELECT 0 AS lag_k, x0 AS x, y0 AS y FROM l
  UNION ALL SELECT 1, xl1, y0 FROM l
  UNION ALL SELECT -1, x0, yl1 FROM l
  UNION ALL SELECT 2, xl2, y0 FROM l
  UNION ALL SELECT -2, x0, yl2 FROM l
  UNION ALL SELECT 3, xl3, y0 FROM l
  UNION ALL SELECT -3, x0, yl3 FROM l
),
m AS (
  SELECT lag_k, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy,
         CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM p WHERE x IS NOT NULL AND y IS NOT NULL GROUP BY lag_k
)
SELECT lag_k, n_pairs,
  CASE WHEN (CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
        AND (CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
             - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
       THEN ROUND((CAST(n_pairs AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                  / SQRT((CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                         * (CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
                            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
       END AS r
FROM m
"""


# Exact equi-depth (k=8) bin edges of order totals — the distributed
# exact-quantile operator a feature pipeline uses for calibration/binning
# where approx_percentile's error bound is not acceptable. Definition:
# edge_j = MIN{v : cum_count(v) >= ceil(j*N/8)} over the DISTINCT-VALUE
# cumulative relation (the same domain-bounded window as the rank family;
# the two-level operators/stats.py spelling is the documented fallback).
# ceil(j*N/8) is computed with pure integer arithmetic spelled portably
# (x - x%8 is divisible by 8, and dividing an int64 by 2^3 is exact in
# double — no FLOOR/CEIL on floats anywhere); the 8-row target relation
# joins the cumulative by a range predicate (the documented exempt
# broadcast-tiny non-equi class, same as agg_benford's 9-row expd).
_EQUIDEPTH = """
WITH t AS (
  SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS c FROM orders
),
pv AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS tc FROM t GROUP BY c),
cum AS (
  SELECT c, CAST(SUM(tc) OVER (ORDER BY c) AS BIGINT) AS cm FROM pv
),
n AS (SELECT CAST(SUM(tc) AS BIGINT) AS nt FROM pv),
j AS (
  SELECT 1 AS j UNION ALL SELECT 2 UNION ALL SELECT 3 UNION ALL SELECT 4
  UNION ALL SELECT 5 UNION ALL SELECT 6 UNION ALL SELECT 7 UNION ALL SELECT 8
),
tgt AS (
  SELECT j, CAST((j * nt + 7 - (j * nt + 7) % 8) / 8 AS BIGINT) AS target,
         nt
  FROM j CROSS JOIN n
)
SELECT tgt.j AS bin, tgt.target AS target_rank,
       CAST(MIN(cum.c) AS BIGINT) AS edge_cents,
       CAST(MIN_BY(cum.cm, cum.c) AS BIGINT) AS count_le_edge
FROM tgt JOIN cum ON cum.cm >= tgt.target
GROUP BY tgt.j, tgt.target
"""


def _agg_equidepth_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact equi-depth bin edges (8 bins) of order totals — the
    exact-quantile counterpart of agg_kll_quantiles/agg_approximate:
    reproducible bin boundaries for feature calibration, computed on
    the distinct-value cumulative relation with zero row-level sort.
    See _EQUIDEPTH for the integer target-rank arithmetic."""
    load(spark, sf_dir)
    return spark.sql(_EQUIDEPTH)


QUERIES["agg_equidepth_bins"] = _agg_equidepth_bins
ORACLES["agg_equidepth_bins"] = _EQUIDEPTH


# Seasonality-aware anomaly flags: each hour's purchase cents compared to
# the SAME-HOUR-OF-DAY profile (daily-rhythm baseline) instead of a
# trailing window — the monitor that doesn't page at 9am because 9am is
# always busy. Same exact-integer decision as window_bollinger: |x-mean|
# > 2*sigma_pop spelled as the cross-multiplied squared inequality
# (n*x - S1)^2 > 4*(n*S2 - S1^2) over exact bigint profile moments —
# zero float anywhere (headroom: (n*x)^2 under 2^63 through ~sf500 at
# cent quantization; the quantum is the knob).
_SEASONAL_ANOM = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS b,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS x
  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
  GROUP BY 1
),
hod AS (SELECT b, x, CAST(EXTRACT(HOUR FROM b) AS BIGINT) AS h FROM hourly),
prof AS (
  SELECT h, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS s1,
         CAST(SUM(x * x) AS BIGINT) AS s2
  FROM hod GROUP BY h
)
SELECT hod.b AS bucket, hod.h AS hour_of_day, hod.x AS cents,
       prof.n AS n_same_hour,
       (prof.n >= 2 AND prof.n * hod.x - s1 > 0
        AND (prof.n * hod.x - s1) * (prof.n * hod.x - s1)
            > 4 * (prof.n * s2 - s1 * s1)) AS break_upper,
       (prof.n >= 2 AND prof.n * hod.x - s1 < 0
        AND (prof.n * hod.x - s1) * (prof.n * hod.x - s1)
            > 4 * (prof.n * s2 - s1 * s1)) AS break_lower
FROM hod JOIN prof ON hod.h = prof.h
"""


def _events_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonal anomaly flags on the hourly purchase series
    — the daily-rhythm-aware member of the monitoring family
    (events_anomalies = trailing window, events_anomaly_mad = robust
    location, window_bollinger = volatility band; this one scores each
    hour against ITS OWN hour-of-day cohort). Plan: one hourly
    aggregation, one 24-row profile aggregation broadcast back, exact
    integer decisions. See _SEASONAL_ANOM."""
    load(spark, sf_dir)
    return spark.sql(_SEASONAL_ANOM)


QUERIES["events_seasonal_anomaly"] = _events_seasonal_anomaly
ORACLES["events_seasonal_anomaly"] = _SEASONAL_ANOM


# Jensen-Shannon divergence between the word distributions of two corpus
# halves (doc_id parity split — the deterministic stand-in for "yesterday
# vs today") — the TEXT drift gate, complementing the numeric KS/MW
# tests: symmetric, bounded by ln 2, defined even where one side has
# zero-probability words. Per-word contribution 0.5*(p*ln(p/m) +
# q*ln(q/m)) is quantized to an exact 1e-12 bigint BEFORE the vocabulary
# sum (the agg_entropy pattern — the only cross-engine float op is libm
# ln, 4 decimal orders below the quantum; the fold is exact integers).
_JSD_SPARK = r"""
WITH w AS (
  SELECT doc_id % 2 AS half,
         explode(split(regexp_replace(trim(lower(text)), '\\s+', ' '), ' '))
           AS word
  FROM documents
),
c AS (
  SELECT word,
         CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
  FROM w GROUP BY word
),
n AS (
  SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb,
         CAST(COUNT(*) AS BIGINT) AS vocab
  FROM c
),
t AS (
  SELECT CAST(ROUND((
           CASE WHEN ca > 0 THEN 0.5 * (CAST(ca AS DOUBLE) / na)
             * LN((CAST(ca AS DOUBLE) / na)
                  / ((CAST(ca AS DOUBLE) / na + CAST(cb AS DOUBLE) / nb) / 2))
             ELSE 0.0 END
           + CASE WHEN cb > 0 THEN 0.5 * (CAST(cb AS DOUBLE) / nb)
             * LN((CAST(cb AS DOUBLE) / nb)
                  / ((CAST(ca AS DOUBLE) / na + CAST(cb AS DOUBLE) / nb) / 2))
             ELSE 0.0 END) * 1e12, 0) AS BIGINT) AS term_q
  FROM c CROSS JOIN n
)
SELECT na AS n_words_a, nb AS n_words_b, vocab,
       ROUND(CAST(SUM(term_q) AS BIGINT) / 1e12, 6) AS jsd_nats,
       ROUND(CAST(SUM(term_q) AS BIGINT) / 1e12 / 0.693147, 6) AS jsd_norm
FROM t CROSS JOIN n
GROUP BY na, nb, vocab
"""

# DuckDB spelling: identical algebra, DuckDB tokenizer (regexp_replace
# 'g' flag + unnest(string_split)).
# DuckDB spelling derived from the Spark string (single-source algebra,
# the _PROP_ZTEST pattern): only the tokenizer line differs.
_JSD_DUCK = _JSD_SPARK.replace(
    "explode(split(regexp_replace(trim(lower(text)), '\\\\s+', ' '), ' '))\n"
    "           AS word",
    "unnest(string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'),\n"
    "                             ' ')) AS word",
)



def _text_jsd_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence between the word distributions of the
    two doc_id-parity corpus halves — the symmetric, ln2-bounded text
    drift measure run between corpus snapshots (the numeric siblings
    are events_ks_test/agg_mann_whitney). One vocabulary aggregation,
    one one-row totals broadcast, one exact quantized fold. Scale: the
    summed relation is vocabulary-sized, not corpus-sized."""
    load(spark, sf_dir)
    return spark.sql(_JSD_SPARK)


QUERIES["text_jsd_drift"] = _text_jsd_drift
ORACLES["text_jsd_drift"] = _JSD_DUCK


# Mood's median test across the five event types: the k-group MEDIAN
# counterpart of Kruskal-Wallis (rank) and ANOVA (mean) — robust to any
# monotone transform of the values. Counts above/at-or-below the GRAND
# median form a k x 2 contingency whose chi2 uses the same empty-cell-
# exact identity and 1e-12-quantized fold as agg_chi2_independence. The
# grand median enters as 2*MEDIAN (always an integer for integer cents —
# the Brown-Forsythe trick), so "above" is the exact predicate 2c > m2.
# Both this and _CHI2_INDEP guard the identity's linear-in-N bias
# amplification VISIBLY: the worst-case quantization bias on chi2 is
# N * cells * 5e-13, and once that could touch the 4dp round (half-ulp
# 5e-5, i.e. N * cells >= 1e8 — around sf10 for these shapes) the
# statistic is NULL rather than silently drifting. The knob is the
# 1e12 quantum: each 10x raise buys 10x N at ~one fewer safe digit.
_MOOD_MEDIAN = """
WITH t AS (
  SELECT event_type AS grp, CAST(ROUND(value * 100, 0) AS BIGINT) AS c
  FROM events WHERE value IS NOT NULL
),
med AS (SELECT CAST(ROUND(2 * MEDIAN(c), 0) AS BIGINT) AS m2 FROM t),
obs AS (
  SELECT grp, CASE WHEN 2 * c > m2 THEN 1 ELSE 0 END AS above,
         CAST(COUNT(*) AS BIGINT) AS o
  FROM t CROSS JOIN med GROUP BY grp, CASE WHEN 2 * c > m2 THEN 1 ELSE 0 END
),
rt AS (SELECT grp, CAST(SUM(o) AS BIGINT) AS nr FROM obs GROUP BY grp),
ct AS (SELECT above, CAST(SUM(o) AS BIGINT) AS nc FROM obs GROUP BY above),
tot AS (SELECT CAST(SUM(o) AS BIGINT) AS nt FROM obs),
q AS (
  SELECT CAST(ROUND(CAST(o.o AS DOUBLE) * o.o
                    / (CAST(rt.nr AS DOUBLE) * ct.nc) * 1e12, 0) AS BIGINT)
           AS term_q
  FROM obs o JOIN rt ON o.grp = rt.grp JOIN ct ON o.above = ct.above
),
d AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM rt) AS kr,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM ct) AS kc,
         (SELECT CAST(SUM(CASE WHEN above = 1 THEN nc ELSE 0 END) AS BIGINT)
            FROM ct) AS n_above
)
SELECT nt AS n_total, kr AS k_groups, n_above, (kr - 1) * (kc - 1) AS df,
       CASE WHEN kr > 1 AND kc > 1
             AND CAST(nt AS DOUBLE) * kr * kc * 5e-13 < 5e-5 THEN
         ROUND(CAST(nt AS DOUBLE)
               * (CAST(SUM(term_q) AS BIGINT) / 1e12 - 1), 4)
       END AS chi2
FROM q CROSS JOIN tot CROSS JOIN d
GROUP BY nt, kr, kc, n_above
"""


def _agg_mood_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mood's median test across event types — the k-group location
    test that only uses above/below-the-grand-median counts (robust
    where Kruskal-Wallis' rank sums and ANOVA's means are not). One
    exact grand median, one contingency fold, the chi2 identity. See
    _MOOD_MEDIAN."""
    load(spark, sf_dir)
    return spark.sql(_MOOD_MEDIAN)


QUERIES["agg_mood_median"] = _agg_mood_median
ORACLES["agg_mood_median"] = _MOOD_MEDIAN




# ---------------------------------------------------------------------------
# Round 12 — Wald's SPRT (Wald 1945), group-sequential over hourly batches
# (VERDICT r11 ask #5): Page-Hinkley detects drift with no baseline; the
# SPRT is its decision-theoretic sibling for EXPERIMENTS — the earliest-
# possible accept/reject boundary on a running log-likelihood ratio.
# Here: is the purchase share of the event stream p0 = 0.15 (H0) or
# p1 = 0.20 (H1), alpha = beta = 0.05? The two per-observation LLR
# increments ln(p1/p0) and ln((1-p1)/(1-p0)) quantize ONCE (at authoring
# time, constants below) to exact 1e-12 bigints, so the running LLR is
# pure int64 arithmetic — cumulative successes times 287682072452 plus
# cumulative failures times -60624621816 — and the Wald boundaries
# ln((1-beta)/alpha) = -ln(beta/(1-alpha)) = ln(19) quantize to
# +-2944438979166. Batching observations into hourly groups is the
# standard group-sequential spelling: the LLR at each closed hour equals
# the per-observation cumsum at the hour boundary. The decision LATCHES
# at the first crossing (MIN-over-history of the crossing count, NULL-
# skipping), exactly what "sequential" means; later data never un-
# decides. VISIBLE headroom guard: |llr_q| <= cn * 287682072452, so
# llr/decision go NULL once CAST(cn AS DOUBLE) * 287682072452 reaches
# 9e18 (~3e7 observations per this quantum) instead of wrapping.
_SPRT = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS bucket,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS d
  FROM events
  GROUP BY 1
),
c AS (
  SELECT bucket, n, d,
         CAST(SUM(n) OVER w AS BIGINT) AS cn,
         CAST(SUM(d) OVER w AS BIGINT) AS cd
  FROM hourly
  WINDOW w AS (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW)
),
l AS (
  SELECT bucket, n, d, cn, cd,
         cd * 287682072452 + (cn - cd) * (-60624621816) AS llr_q
  FROM c
),
x AS (
  SELECT bucket, n, d, cn, cd, llr_q,
         MIN(CASE WHEN llr_q >= 2944438979166 THEN cn END) OVER w AS cn_up,
         MIN(CASE WHEN llr_q <= -2944438979166 THEN cn END) OVER w AS cn_dn
  FROM l
  WINDOW w AS (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW)
)
SELECT bucket, n, d, cn, cd,
       CASE WHEN CAST(cn AS DOUBLE) * 287682072452 < 9e18
            THEN ROUND(llr_q / 1e12, 6) END AS llr,
       CASE WHEN CAST(cn AS DOUBLE) * 287682072452 >= 9e18 THEN NULL
            WHEN cn_up IS NOT NULL AND (cn_dn IS NULL OR cn_up <= cn_dn)
              THEN 'accept_h1'
            WHEN cn_dn IS NOT NULL THEN 'accept_h0'
            ELSE 'continue' END AS decision
FROM x
"""


def _events_sprt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald SPRT (group-sequential, hourly batches) on the event
    stream's purchase share — H0 p = 0.15 vs H1 p = 0.20 at
    alpha = beta = 0.05; pure int64 LLR fold, latched first-crossing
    decision, visible headroom guard. See _SPRT."""
    load(spark, sf_dir)
    return spark.sql(_SPRT)


def _streaming_sprt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of events_sprt (streaming.stream_sprt): single
    global state group of SEVEN bigints, integer-only automaton (the
    LLR constants are pre-quantized, so unlike the Page-Hinkley twin
    there is no float anywhere mid-fold), crossing latches persist
    only on real hour closes, presentation expressions in Spark after
    the sink — graded by the BATCH oracle (24th stream==batch twin)."""
    load(spark, sf_dir)
    from datafusion_gpu_spark import streaming

    return streaming.stream_sprt(spark, sf_dir)


QUERIES["events_sprt"] = _events_sprt
QUERIES["streaming_sprt"] = _streaming_sprt
ORACLES["events_sprt"] = _SPRT
ORACLES["streaming_sprt"] = _SPRT


# ---------------------------------------------------------------------------
# Round 12 (continued) — the two repeated-measures tests the k-group family
# lacked. Kruskal-Wallis (r9) compares INDEPENDENT samples; when every
# subject contributes one value per treatment, the blocked designs below
# are the correct (and far more powerful) spellings.
# ---------------------------------------------------------------------------

# Friedman test (Friedman 1937), tie-corrected, over complete blocks:
# does a user's spend level DIFFER by event type, judged within each
# user (blocking removes the per-user level that inflates KW's variance)?
# Blocks = users with all 5 event types, cell value = exact cents sum,
# within-block average ranks kept exact in DOUBLED-rank space
# (r2 = 2*RANK + ties - 1, an integer even for .5 average ranks), and the
# tie-corrected statistic Q = (k-1) * sum_j (R2_j - n(k+1))^2 /
# sum_ij (r2_ij - (k+1))^2 — the 4s from doubling cancel, so Q is a ratio
# of exact bigint folds with ONE terminal division (spelled 4e0 — the
# decimal literal 4.0 would put Spark in DECIMAL arithmetic against the
# bigint while DuckDB effectively runs double; scientific notation is a
# DOUBLE literal in BOTH engines, the established 1e9/1e12 convention). chi2 on k-1 = 4 df,
# 5% criterion 9.487729. VISIBLE guard: |R2_j - 6n| <= 4n so the
# numerator is <= 80n^2 — q/reject go NULL once n*n*80 nears int64.
# Scale: one groupBy(user, type), k-row windows per block, global fold.
_FRIEDMAN = """
WITH cell AS (
  SELECT user_id, event_type,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS v
  FROM events WHERE value IS NOT NULL
  GROUP BY user_id, event_type
),
blocks AS (
  SELECT user_id FROM cell GROUP BY user_id HAVING COUNT(*) = 5
),
rk AS (
  SELECT c.user_id, c.event_type,
         CAST(2 * RANK() OVER (PARTITION BY c.user_id ORDER BY c.v)
              + COUNT(*) OVER (PARTITION BY c.user_id, c.v) - 1
              AS BIGINT) AS r2
  FROM cell c JOIN blocks b ON c.user_id = b.user_id
),
tr AS (
  SELECT event_type, CAST(SUM(r2) AS BIGINT) AS r2j
  FROM rk GROUP BY event_type
),
nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM blocks),
num AS (
  SELECT CAST(SUM((r2j - n * 6) * (r2j - n * 6)) AS BIGINT) AS sn
  FROM tr, nb
),
den AS (
  SELECT CAST(SUM((r2 - 6) * (r2 - 6)) AS BIGINT) AS sd FROM rk
)
SELECT n, sn, sd,
       CASE WHEN CAST(n AS DOUBLE) * n * 80 < 9e18 AND sd > 0
            THEN ROUND(4e0 * sn / sd, 6) END AS q_stat,
       CASE WHEN CAST(n AS DOUBLE) * n * 80 < 9e18 AND sd > 0
            THEN 4e0 * sn / sd > 9.487729 END AS reject_05
FROM num, den, nb
"""


def _agg_friedman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman repeated-measures rank test across the five event types,
    blocked by user — exact doubled-rank bigint folds, tie-corrected,
    one terminal division. See _FRIEDMAN."""
    load(spark, sf_dir)
    return spark.sql(_FRIEDMAN)


QUERIES["agg_friedman"] = _agg_friedman
ORACLES["agg_friedman"] = _FRIEDMAN


# McNemar's test (McNemar 1947) on paired conversion: did each user's
# purchase behavior CHANGE between the day before and the day after a
# deploy boundary (the fixed 2024-01-15 / 2024-01-16 day pair)? A
# half-window split saturates on this data (every user purchases in both
# halves -> zero discordant pairs), so the gate pairs single days — the
# actual deploy-day question. Only the discordant pairs carry
# information: chi2 = (b - c)^2 / (b + c) on 1 df (no continuity
# correction — documented choice, both engines identical). Everything is
# exact integer until the single terminal division; VISIBLE guard once
# (b - c)^2 nears int64 (~3e9 discordant users).
_MCNEMAR = """
WITH half AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'purchase'
                   AND CAST(ts AS DATE) = DATE '2024-01-15'
                  THEN 1 ELSE 0 END) AS p1,
         MAX(CASE WHEN event_type = 'purchase'
                   AND CAST(ts AS DATE) = DATE '2024-01-16'
                  THEN 1 ELSE 0 END) AS p2
  FROM events GROUP BY user_id
),
ct AS (
  SELECT CAST(SUM(CASE WHEN p1 = 1 AND p2 = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS b,
         CAST(SUM(CASE WHEN p1 = 0 AND p2 = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS c,
         CAST(SUM(CASE WHEN p1 = 1 AND p2 = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS both_halves,
         CAST(SUM(CASE WHEN p1 = 0 AND p2 = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS neither
  FROM half
)
SELECT b, c, both_halves, neither,
       CASE WHEN b + c > 0 AND CAST(b - c AS DOUBLE) * (b - c) < 9e18
            THEN ROUND(CAST((b - c) * (b - c) AS DOUBLE) / (b + c), 6)
       END AS chi2_mcnemar,
       CASE WHEN b + c > 0 AND CAST(b - c AS DOUBLE) * (b - c) < 9e18
            THEN CAST((b - c) * (b - c) AS DOUBLE) / (b + c) > 3.841459
       END AS reject_05
FROM ct
"""


def _events_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar paired-conversion test across the fixed deploy-day pair
    (2024-01-15 vs 2024-01-16) — discordant-pair chi-square, exact
    integers to one terminal division. See _MCNEMAR."""
    load(spark, sf_dir)
    return spark.sql(_MCNEMAR)


QUERIES["events_mcnemar"] = _events_mcnemar
ORACLES["events_mcnemar"] = _MCNEMAR


# Cochran-Mantel-Haenszel test + Mantel-Haenszel common odds ratio over
# user_id % 3 strata: the 2x2 companion of the stratified log-rank — does
# cohort membership (user_id parity) associate with day-16 conversion,
# CONTROLLING for the stratum? Per-stratum hypergeometric E/V terms and
# the MH ratio terms a*d/n, b*c/n quantize ONCE to exact 1e-9 bigints
# before the cross-stratum sums (identical IEEE spelling both engines);
# chi2 = (sum a - sum E)^2 / sum V on 1 df (no continuity correction —
# documented choice), OR_MH = R/S terminal, with the Robins-Breslow-
# Greenland (1986) 95% CI: Var(ln OR_MH) = sum(P*R)/(2R^2)
# + sum(P*S + Q*R)/(2RS) + sum(Q*S)/(2S^2) with P = (a+d)/n,
# Q = (b+c)/n per stratum — the three cross-stratum sums fold as the
# same 1e-9-quantized bigints (the 1e9 scale factors cancel pairwise:
# each sum is quantized x 1e9, each denominator carries one srq/ssq
# taken raw and one divided by 1e9). VISIBLE guard: each E term
# is <= the stratum's exposed count, so sums are bounded by total users
# * 1e9 — outputs go NULL past ~9e9 users instead of wrapping.
_CMH = """
WITH u AS (
  SELECT user_id % 3 AS s,
         user_id % 2 AS x,
         MAX(CASE WHEN event_type = 'purchase'
                   AND CAST(ts AS DATE) = DATE '2024-01-16'
                  THEN 1 ELSE 0 END) AS y
  FROM events GROUP BY user_id
),
tab AS (
  SELECT s,
         CAST(SUM(CASE WHEN x = 1 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
         CAST(SUM(CASE WHEN x = 1 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
         CAST(SUM(CASE WHEN x = 0 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
         CAST(SUM(CASE WHEN x = 0 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d
  FROM u GROUP BY s
),
terms AS (
  SELECT s, a, a + b + c + d AS n,
         CAST(ROUND(1e9 * (CAST(a + b AS DOUBLE) * (a + c)
                           / CAST(a + b + c + d AS DOUBLE)), 0)
              AS BIGINT) AS eq,
         CASE WHEN a + b + c + d > 1 THEN
           CAST(ROUND(1e9 * (CAST(a + b AS DOUBLE) * (c + d) * (a + c)
                             * (b + d)
                             / (CAST(a + b + c + d AS DOUBLE)
                                * (a + b + c + d)
                                * (CAST(a + b + c + d AS DOUBLE) - 1.0))), 0)
                AS BIGINT)
         ELSE 0 END AS vq,
         CAST(ROUND(1e9 * (CAST(a AS DOUBLE) * d
                           / CAST(a + b + c + d AS DOUBLE)), 0)
              AS BIGINT) AS rq,
         CAST(ROUND(1e9 * (CAST(b AS DOUBLE) * c
                           / CAST(a + b + c + d AS DOUBLE)), 0)
              AS BIGINT) AS sq,
         CAST(ROUND(1e9 * ((CAST(a + d AS DOUBLE)
                            / CAST(a + b + c + d AS DOUBLE))
                           * (CAST(a AS DOUBLE) * d
                              / CAST(a + b + c + d AS DOUBLE))), 0)
              AS BIGINT) AS prq,
         CAST(ROUND(1e9 * ((CAST(a + d AS DOUBLE)
                            / CAST(a + b + c + d AS DOUBLE))
                           * (CAST(b AS DOUBLE) * c
                              / CAST(a + b + c + d AS DOUBLE))
                           + (CAST(b + c AS DOUBLE)
                              / CAST(a + b + c + d AS DOUBLE))
                           * (CAST(a AS DOUBLE) * d
                              / CAST(a + b + c + d AS DOUBLE))), 0)
              AS BIGINT) AS psqrq,
         CAST(ROUND(1e9 * ((CAST(b + c AS DOUBLE)
                            / CAST(a + b + c + d AS DOUBLE))
                           * (CAST(b AS DOUBLE) * c
                              / CAST(a + b + c + d AS DOUBLE))), 0)
              AS BIGINT) AS qsq
  FROM tab WHERE a + b + c + d > 0
),
folded AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
         CAST(SUM(n) AS BIGINT) AS n_users,
         CAST(SUM(a) AS BIGINT) AS sa,
         CAST(SUM(eq) AS BIGINT) AS seq,
         CAST(SUM(vq) AS BIGINT) AS svq,
         CAST(SUM(rq) AS BIGINT) AS srq,
         CAST(SUM(sq) AS BIGINT) AS ssq,
         CAST(SUM(prq) AS BIGINT) AS sprq,
         CAST(SUM(psqrq) AS BIGINT) AS spsqrq,
         CAST(SUM(qsq) AS BIGINT) AS sqsq
  FROM terms
)
SELECT n_strata, n_users, sa,
       CASE WHEN CAST(n_users AS DOUBLE) * 1e9 < 9e18
            THEN ROUND(seq / 1e9, 6) END AS e_sum,
       CASE WHEN CAST(n_users AS DOUBLE) * 1e9 < 9e18
            THEN ROUND(svq / 1e9, 6) END AS var_cmh,
       CASE WHEN CAST(n_users AS DOUBLE) * 1e9 < 9e18 AND svq > 0
            THEN ROUND((sa - seq / 1e9) * (sa - seq / 1e9)
                       / (svq / 1e9), 6) END AS chi2_cmh,
       CASE WHEN CAST(n_users AS DOUBLE) * 1e9 < 9e18 AND svq > 0
            THEN (sa - seq / 1e9) * (sa - seq / 1e9) / (svq / 1e9)
                 > 3.841459 END AS reject_05,
       CASE WHEN CAST(n_users AS DOUBLE) * 1e9 < 9e18 AND ssq > 0
            THEN ROUND(CAST(srq AS DOUBLE) / ssq, 6) END AS or_mh,
       CASE WHEN CAST(n_users AS DOUBLE) * 1e9 < 9e18 AND ssq > 0
             AND srq > 0
            THEN ROUND(EXP(LN(CAST(srq AS DOUBLE) / ssq)
                 - 1.959964 * SQRT(
                     CAST(sprq AS DOUBLE) / (2e0 * srq * (srq / 1e9))
                     + CAST(spsqrq AS DOUBLE)
                       / (2e0 * srq * (ssq / 1e9))
                     + CAST(sqsq AS DOUBLE)
                       / (2e0 * ssq * (ssq / 1e9)))), 6)
       END AS or_ci_lo,
       CASE WHEN CAST(n_users AS DOUBLE) * 1e9 < 9e18 AND ssq > 0
             AND srq > 0
            THEN ROUND(EXP(LN(CAST(srq AS DOUBLE) / ssq)
                 + 1.959964 * SQRT(
                     CAST(sprq AS DOUBLE) / (2e0 * srq * (srq / 1e9))
                     + CAST(spsqrq AS DOUBLE)
                       / (2e0 * srq * (ssq / 1e9))
                     + CAST(sqsq AS DOUBLE)
                       / (2e0 * ssq * (ssq / 1e9)))), 6)
       END AS or_ci_hi
FROM folded
"""


def _events_cmh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Mantel-Haenszel stratified association test + MH common
    odds ratio (cohort parity vs day-16 conversion, user_id % 3
    strata) — exact 1e-9 quantized per-stratum folds, terminal
    chi-square and ratio. See _CMH."""
    load(spark, sf_dir)
    return spark.sql(_CMH)


QUERIES["events_cmh"] = _events_cmh
ORACLES["events_cmh"] = _CMH


# Cochran's Q (Cochran 1950): the k-treatment generalization of McNemar
# over complete binary blocks — did conversion propensity DIFFER across
# the three probe days, judged within each user? Entirely EXACT integer
# arithmetic: Q = (k-1) * (k * sum_j C_j^2 - N^2) / (k * N - sum_i R_i^2)
# (column totals C_j, row totals R_i, grand total N) with ONE terminal
# division; chi2 on k-1 = 2 df, 5% criterion 5.991465. Rows with R_i = 0
# or k contribute nothing to the denominator (the standard form handles
# them). VISIBLE guard: k*sum C^2 <= k*N^2 wraps once N nears ~1.7e9
# conversions — q/reject go NULL there.
_COCHRAN_Q = """
WITH b AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'purchase'
                   AND CAST(ts AS DATE) = DATE '2024-01-10'
                  THEN 1 ELSE 0 END) AS y1,
         MAX(CASE WHEN event_type = 'purchase'
                   AND CAST(ts AS DATE) = DATE '2024-01-11'
                  THEN 1 ELSE 0 END) AS y2,
         MAX(CASE WHEN event_type = 'purchase'
                   AND CAST(ts AS DATE) = DATE '2024-01-12'
                  THEN 1 ELSE 0 END) AS y3
  FROM events GROUP BY user_id
),
t AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_blocks,
         CAST(SUM(y1) AS BIGINT) AS c1,
         CAST(SUM(y2) AS BIGINT) AS c2,
         CAST(SUM(y3) AS BIGINT) AS c3,
         CAST(SUM(y1 + y2 + y3) AS BIGINT) AS nt,
         CAST(SUM((y1 + y2 + y3) * (y1 + y2 + y3)) AS BIGINT) AS sr2
  FROM b
)
SELECT n_blocks, c1, c2, c3, nt,
       CASE WHEN CAST(nt AS DOUBLE) * nt * 3 < 9e18
             AND 3 * nt - sr2 > 0
            THEN ROUND(2e0 * (3 * (c1 * c1 + c2 * c2 + c3 * c3) - nt * nt)
                       / (3 * nt - sr2), 6) END AS q_stat,
       CASE WHEN CAST(nt AS DOUBLE) * nt * 3 < 9e18
             AND 3 * nt - sr2 > 0
            THEN 2e0 * (3 * (c1 * c1 + c2 * c2 + c3 * c3) - nt * nt)
                 / (3 * nt - sr2) > 5.991465 END AS reject_05
FROM t
"""


def _events_cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q across the three probe days, blocked by user — pure
    exact-integer statistic with one terminal division. See
    _COCHRAN_Q."""
    load(spark, sf_dir)
    return spark.sql(_COCHRAN_Q)


QUERIES["events_cochran_q"] = _events_cochran_q
ORACLES["events_cochran_q"] = _COCHRAN_Q


# Kendall's tau-b (Kendall 1945) between hour-of-day and purchase value —
# the concordance companion of agg_spearman (rho measures monotone
# association through ranks; tau-b through pair orientation, robust to
# the massive x-ties a 24-level hour naturally has). EXACT pair counting
# without touching pairs: on the (hour x distinct-cents) grid — bounded
# by the VALUE DOMAIN times 24, never by row count — two nested integer
# cumulatives give, per cell, the events strictly below-left (conc_lo)
# and above-left (disc_lo); nc = sum g*conc_lo and nd = sum g*disc_lo
# count every strictly concordant/discordant pair exactly once (at its
# higher-hour member). Hour/value tie-pair counts fold the same way, so
# tau_b = (nc - nd) / sqrt((n0 - n1)(n0 - n2)) is exact bigints into one
# terminal sqrt. The hour axis is a 24-row VALUES LITERAL (not a
# DISTINCT aggregate), so the grid cross join's build is plan-visibly
# bounded — it classifies into audit_plans' exempt literal class instead
# of needing a prose allowlist entry. Significance: the z statistic uses the NO-TIE variance
# n(n-1)(2n+5)/18 (documented choice: with ties it OVERSTATES the
# variance, so reject_05 is conservative — the tie-corrected variance
# needs per-group cubic folds that wrap int64 at ~4e7 rows, the wrong
# trade for a gate). VISIBLE guard: nc/nd are <= n^2/2, so outputs go
# NULL once CAST(n AS DOUBLE)*n reaches 9e18 (~3e9 events).
_KENDALL_TAU = """
WITH p AS (
  SELECT CAST(hour(ts) AS BIGINT) AS h,
         CAST(ROUND(value * 100) AS BIGINT) AS v
  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
),
cell AS (SELECT h, v, CAST(COUNT(*) AS BIGINT) AS g FROM p GROUP BY h, v),
hs AS (SELECT CAST(h AS BIGINT) AS h FROM (VALUES (0),(1),(2),(3),(4),(5),(6),(7),(8),(9),(10),(11),(12),(13),(14),(15),(16),(17),(18),(19),(20),(21),(22),(23)) AS t(h)),
vs AS (SELECT DISTINCT v FROM cell),
grid AS (
  SELECT hs.h AS h, vs.v AS v, COALESCE(c.g, 0) AS g
  FROM hs CROSS JOIN vs
  LEFT JOIN cell c ON c.h = hs.h AND c.v = vs.v
),
acc AS (
  SELECT h, v, g,
         COALESCE(CAST(SUM(g) OVER (PARTITION BY h ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              AS BIGINT), 0) AS lt_v,
         COALESCE(CAST(SUM(g) OVER (PARTITION BY h ORDER BY v DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              AS BIGINT), 0) AS gt_v
  FROM grid
),
oriented AS (
  SELECT h, v, g,
         COALESCE(CAST(SUM(lt_v) OVER (PARTITION BY v ORDER BY h
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              AS BIGINT), 0) AS conc_lo,
         COALESCE(CAST(SUM(gt_v) OVER (PARTITION BY v ORDER BY h
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              AS BIGINT), 0) AS disc_lo
  FROM acc
),
folds AS (
  SELECT CAST(SUM(g * conc_lo) AS BIGINT) AS nc,
         CAST(SUM(g * disc_lo) AS BIGINT) AS nd
  FROM oriented
),
nn AS (SELECT CAST(SUM(g) AS BIGINT) AS n FROM cell),
tx AS (
  SELECT CAST(SUM(th * (th - 1)) AS BIGINT) AS t2x
  FROM (SELECT CAST(SUM(g) AS BIGINT) AS th FROM cell GROUP BY h)
),
ty AS (
  SELECT CAST(SUM(tv * (tv - 1)) AS BIGINT) AS t2y
  FROM (SELECT CAST(SUM(g) AS BIGINT) AS tv FROM cell GROUP BY v)
)
SELECT n, nc, nd, t2x / 2 AS ties_x, t2y / 2 AS ties_y,
       CASE WHEN CAST(n AS DOUBLE) * n < 9e18 AND n > 1
             AND CAST(n AS DOUBLE) * (n - 1) / 2e0 - t2x / 2e0 > 0
             AND CAST(n AS DOUBLE) * (n - 1) / 2e0 - t2y / 2e0 > 0
            THEN ROUND(CAST(nc - nd AS DOUBLE)
                 / SQRT((CAST(n AS DOUBLE) * (n - 1) / 2e0 - t2x / 2e0)
                      * (CAST(n AS DOUBLE) * (n - 1) / 2e0 - t2y / 2e0)),
                 6) END AS tau_b,
       CASE WHEN CAST(n AS DOUBLE) * n < 9e18 AND n > 1
            THEN ROUND(3e0 * (nc - nd)
                 / SQRT(CAST(n AS DOUBLE) * (n - 1) * (2 * n + 5) / 2e0),
                 6) END AS z_notie,
       CASE WHEN CAST(n AS DOUBLE) * n < 9e18 AND n > 1
            THEN ABS(3e0 * (nc - nd)
                 / SQRT(CAST(n AS DOUBLE) * (n - 1) * (2 * n + 5) / 2e0))
                 > 1.959964 END AS reject_05
FROM folds, nn, tx, ty
"""


def _agg_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b between hour-of-day and purchase cents — exact
    pair counting via nested cumulatives on the bounded (hour x
    distinct-value) grid, tie-corrected denominator, conservative
    no-tie z. See _KENDALL_TAU."""
    load(spark, sf_dir)
    return spark.sql(_KENDALL_TAU)


QUERIES["agg_kendall_tau"] = _agg_kendall_tau
ORACLES["agg_kendall_tau"] = _KENDALL_TAU


# Breslow-Day homogeneity test (Breslow & Day 1980): the companion that
# decides whether events_cmh's common odds ratio is TRUSTWORTHY — CMH
# answers "is there an association, controlling for stratum?"; this
# answers "is the association the SAME in every stratum?" (heterogeneous
# ORs make OR_MH a meaningless average). Under psi = OR_MH, each
# stratum's expected exposed-converted count A solves the quadratic
# (1-psi)A^2 + ((r2-c1) + psi(r1+c1))A - psi*r1*c1 = 0 (closed form —
# root picked by the validity range [max(0, c1-r2), min(r1, c1)], the
# psi = 1 degenerate handled by its exact linear limit r1*c1/n); the
# variance is the harmonic term 1/(1/A + 1/(r1-A) + 1/(c1-A) +
# 1/(r2-c1+A)); chi2_bd = sum (a-A)^2/Var on (strata-1) df. Numeric
# contract: psi is the UNROUNDED ratio of the same 1e-9-quantized MH
# folds events_cmh uses, every per-stratum expression is spelled
# identically in both engines, and the per-stratum chi-square terms
# quantize ONCE to 1e-9 bigints before the cross-strata sum. Strata
# with a zero margin are excluded (standard); a boundary-degenerate
# root (Var <= 0) makes the output NULL — counted, not skipped.
# VISIBLE guard: the same n_users * 1e9 bound as events_cmh. reject_05
# reads the chi-square criterion off a df CASE (1..5); NULL beyond.
# chi2_tarone (Tarone 1985) subtracts the correction
# (sum_j (a_j - A_j))^2 / sum_j Var_j — exactly zero when psi is the
# true conditional MLE, small otherwise; both numerator and the
# variance sum fold as the same 1e-9-quantized bigints. reject_05
# stays on the plain BD statistic (documented; Tarone emitted beside
# it for the reader).
_BRESLOW_DAY = """
WITH u AS (
  SELECT user_id % 3 AS s,
         user_id % 2 AS x,
         MAX(CASE WHEN event_type = 'purchase'
                   AND CAST(ts AS DATE) = DATE '2024-01-16'
                  THEN 1 ELSE 0 END) AS y
  FROM events GROUP BY user_id
),
tab AS (
  SELECT s,
         CAST(SUM(CASE WHEN x = 1 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
         CAST(SUM(CASE WHEN x = 1 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
         CAST(SUM(CASE WHEN x = 0 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
         CAST(SUM(CASE WHEN x = 0 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d
  FROM u GROUP BY s
),
mh AS (
  SELECT CAST(SUM(CAST(ROUND(1e9 * (CAST(a AS DOUBLE) * d
                      / CAST(a + b + c + d AS DOUBLE)), 0) AS BIGINT))
              AS BIGINT) AS srq,
         CAST(SUM(CAST(ROUND(1e9 * (CAST(b AS DOUBLE) * c
                      / CAST(a + b + c + d AS DOUBLE)), 0) AS BIGINT))
              AS BIGINT) AS ssq,
         CAST(SUM(a + b + c + d) AS BIGINT) AS n_users
  FROM tab WHERE a + b + c + d > 0
),
geom AS (
  SELECT t.s, t.a, t.a + t.b AS r1, t.c + t.d AS r2, t.a + t.c AS c1,
         t.b + t.d AS c2, t.a + t.b + t.c + t.d AS n,
         CAST(m.srq AS DOUBLE) / m.ssq AS psi,
         m.n_users
  FROM tab t, mh m
  WHERE m.ssq > 0 AND t.a + t.b > 0 AND t.c + t.d > 0
    AND t.a + t.c > 0 AND t.b + t.d > 0
),
root AS (
  SELECT s, a, r1, r2, c1, n, psi, n_users,
         CASE WHEN ABS(1e0 - psi) < 1e-12
              THEN CAST(r1 AS DOUBLE) * c1 / n
              ELSE
                CASE WHEN
                  (-((r2 - c1) + psi * (r1 + c1))
                   + SQRT(((r2 - c1) + psi * (r1 + c1))
                          * ((r2 - c1) + psi * (r1 + c1))
                          + 4e0 * (1e0 - psi) * psi * r1 * c1))
                  / (2e0 * (1e0 - psi))
                  BETWEEN GREATEST(CAST(0 AS DOUBLE), CAST(c1 - r2 AS DOUBLE))
                      AND LEAST(CAST(r1 AS DOUBLE), CAST(c1 AS DOUBLE))
                THEN
                  (-((r2 - c1) + psi * (r1 + c1))
                   + SQRT(((r2 - c1) + psi * (r1 + c1))
                          * ((r2 - c1) + psi * (r1 + c1))
                          + 4e0 * (1e0 - psi) * psi * r1 * c1))
                  / (2e0 * (1e0 - psi))
                ELSE
                  (-((r2 - c1) + psi * (r1 + c1))
                   - SQRT(((r2 - c1) + psi * (r1 + c1))
                          * ((r2 - c1) + psi * (r1 + c1))
                          + 4e0 * (1e0 - psi) * psi * r1 * c1))
                  / (2e0 * (1e0 - psi))
                END
         END AS ea
  FROM geom
),
terms AS (
  SELECT s, n_users,
         CASE WHEN ea > 0 AND ea < r1 AND ea < c1 AND r2 - c1 + ea > 0
              THEN CAST(ROUND(1e9 * ((a - ea) * (a - ea)
                   * (1e0 / ea + 1e0 / (r1 - ea) + 1e0 / (c1 - ea)
                      + 1e0 / (r2 - c1 + ea))), 0) AS BIGINT)
         END AS tq,
         CASE WHEN ea > 0 AND ea < r1 AND ea < c1 AND r2 - c1 + ea > 0
              THEN CAST(ROUND(1e9 * (a - ea), 0) AS BIGINT)
         END AS dq,
         CASE WHEN ea > 0 AND ea < r1 AND ea < c1 AND r2 - c1 + ea > 0
              THEN CAST(ROUND(1e9 * (1e0
                   / (1e0 / ea + 1e0 / (r1 - ea) + 1e0 / (c1 - ea)
                      + 1e0 / (r2 - c1 + ea))), 0) AS BIGINT)
         END AS wq
  FROM root
),
fold AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k_used,
         CAST(SUM(CASE WHEN tq IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_bad,
         CAST(SUM(tq) AS BIGINT) AS schi2q,
         CAST(SUM(dq) AS BIGINT) AS sdq,
         CAST(SUM(wq) AS BIGINT) AS swq,
         CAST(MAX(n_users) AS BIGINT) AS n_users
  FROM terms
)
SELECT k_used, k_used - 1 AS df,
       CASE WHEN CAST(n_users AS DOUBLE) * 1e9 < 9e18 AND n_bad = 0
             AND k_used > 1
            THEN ROUND(schi2q / 1e9, 6) END AS chi2_bd,
       CASE WHEN CAST(n_users AS DOUBLE) * 1e9 < 9e18 AND n_bad = 0
             AND k_used > 1 AND swq > 0
            THEN ROUND(schi2q / 1e9
                 - (sdq / 1e9) * (sdq / 1e9) / (swq / 1e9), 6)
       END AS chi2_tarone,
       CASE WHEN CAST(n_users AS DOUBLE) * 1e9 >= 9e18 OR n_bad > 0
             OR k_used <= 1 THEN NULL
            WHEN k_used - 1 = 1 THEN schi2q / 1e9 > 3.841459
            WHEN k_used - 1 = 2 THEN schi2q / 1e9 > 5.991465
            WHEN k_used - 1 = 3 THEN schi2q / 1e9 > 7.814728
            WHEN k_used - 1 = 4 THEN schi2q / 1e9 > 9.487729
            WHEN k_used - 1 = 5 THEN schi2q / 1e9 > 11.070498
            ELSE NULL END AS reject_05
FROM fold
"""


def _events_breslow_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Breslow-Day odds-ratio homogeneity across the user_id % 3
    strata — the gate that decides whether events_cmh's OR_MH is a
    meaningful summary. Closed-form quadratic root per stratum, 1e-9
    quantized chi-square terms, df-CASE criterion. See _BRESLOW_DAY."""
    load(spark, sf_dir)
    return spark.sql(_BRESLOW_DAY)


QUERIES["events_breslow_day"] = _events_breslow_day
ORACLES["events_breslow_day"] = _BRESLOW_DAY


def _streaming_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of events_mcnemar (streaming.stream_mcnemar_pairs
    + materialized_mcnemar): per-user monotone two-bit flag state, the
    contingency tail applied to the final materialized state with the
    batch spelling — graded by the SAME oracle (25th stream==batch
    twin)."""
    load(spark, sf_dir)
    from datafusion_gpu_spark import streaming

    return streaming.materialized_mcnemar(spark, sf_dir)


QUERIES["streaming_mcnemar"] = _streaming_mcnemar
ORACLES["streaming_mcnemar"] = _MCNEMAR


# O'Brien-Fleming group-sequential test (O'Brien & Fleming 1979;
# boundary constant per Pocock 1977's tabulation) — the FIXED-HORIZON
# sibling of the SPRT: five interim looks at 20/40/60/80/100% of the
# total information, two-sided z test of conversion share vs p0 = 0.18,
# boundary z_k = 2.040407 * sqrt(K/k) (spends almost no alpha early,
# preserving ~0.05 overall — the deploy-gate convention). Exactness: at
# p0 = 18/100 the z numerator is the EXACT bigint 100*cd - 18*cn and
# the radicand the exact bigint cn * 1476 (= cn * 100^2 * p0 * q0), so
# z is ONE terminal division/sqrt of exact integers — no quantization
# needed anywhere. Look k fires at the first closed hour whose
# cumulative count reaches ceil(N*k/5) (integer comparison cn*5 >=
# N*k); the decision LATCHES at the first boundary crossing, and an
# uncrossed look 5 accepts H0 (the horizon is fixed — contrast the
# SPRT, which can run forever). The look relation is a 5-row VALUES
# literal joined against the bounded hour relation. VISIBLE guard keyed
# to cn (ADVICE r12 #1): 100*cn < 9e18 bounds BOTH int64 products in the
# z numerator — 100*cd (cd <= cn) and 18*cn — and it guards zk at its
# DEFINITION, so the latch window's unguarded ABS(zk) can never force
# the overflowing arithmetic; z/decision go NULL once N nears 9e16.
#: Shared five-look fold (hourly batches -> cumulative counts -> look
#: firing points): the data-sized work of BOTH group-sequential gates.
#: The OBF and Pocock tails below reuse it verbatim — "a second decision
#: column on the existing folds" (VERDICT r12 ask #4).
_GS_FOLD = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS bucket,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS d
  FROM events
  GROUP BY 1
),
c AS (
  SELECT bucket, n, d,
         CAST(SUM(n) OVER w AS BIGINT) AS cn,
         CAST(SUM(d) OVER w AS BIGINT) AS cd
  FROM hourly
  WINDOW w AS (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW)
),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nt FROM hourly),
looks AS (SELECT CAST(k AS BIGINT) AS k
          FROM (VALUES (1),(2),(3),(4),(5)) AS t(k)),
first_at AS (
  SELECT l.k, CAST(MIN(c.cn) AS BIGINT) AS cn_k
  FROM looks l, tot, c
  WHERE c.cn * 5 >= tot.nt * l.k
  GROUP BY l.k
),
at_look AS (
  SELECT f.k, f.cn_k AS cn, CAST(MAX(c.cd) AS BIGINT) AS cd, tot.nt
  FROM first_at f
  JOIN c ON c.cn = f.cn_k
  CROSS JOIN tot
  GROUP BY f.k, f.cn_k, tot.nt
),
"""

_GROUP_SEQ = _GS_FOLD + """z AS (
  SELECT k, cn, cd, nt,
         CASE WHEN CAST(cn AS DOUBLE) * 100 < 9e18 THEN
           CAST(100 * cd - 18 * cn AS DOUBLE)
             / SQRT(CAST(cn AS DOUBLE) * 1476) END AS zk,
         2.040407 * SQRT(5e0 / k) AS bound
  FROM at_look
),
lat AS (
  SELECT k, cn, cd, nt, zk, bound,
         CAST(MIN(CASE WHEN ABS(zk) >= bound THEN k END)
              OVER (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING
                    AND CURRENT ROW) AS BIGINT) AS k_cross
  FROM z
)
SELECT k AS look, cn AS n_at_look, cd AS d_at_look,
       ROUND(CAST(cn AS DOUBLE) / nt, 6) AS info_frac,
       CASE WHEN CAST(cn AS DOUBLE) * 100 < 9e18
            THEN ROUND(zk, 6) END AS z,
       ROUND(bound, 6) AS boundary,
       CASE WHEN CAST(cn AS DOUBLE) * 100 >= 9e18 THEN NULL
            WHEN k_cross IS NOT NULL THEN 'reject_h0'
            WHEN k = 5 THEN 'accept_h0'
            ELSE 'continue' END AS decision
FROM lat
"""


def _events_group_sequential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O'Brien-Fleming five-look group-sequential test of the purchase
    share vs p0 = 0.18 — exact-integer z numerator/radicand, latched
    first-crossing decision, fixed horizon (look 5 accepts). See
    _GROUP_SEQ."""
    load(spark, sf_dir)
    return spark.sql(_GROUP_SEQ)


QUERIES["events_group_sequential"] = _events_group_sequential
ORACLES["events_group_sequential"] = _GROUP_SEQ


# ---------------------------------------------------------------------------
# Round 13 — Pocock boundary beside O'Brien-Fleming (VERDICT r12 ask
# #4): the SAME five-look fold (_GS_FOLD, shared verbatim with
# events_group_sequential), two boundary/decision column pairs in one
# relation. Pocock (1977) spends alpha EVENLY — constant critical value
# 2.413 (K=5, two-sided 5%) at every look — so it rejects EARLIER on a
# large immediate effect (|z1| >= 2.413 vs OBF's 4.5625) but pays a
# stiffer final look (2.413 vs OBF's 2.0404): the early-vs-late
# alpha-spending trade-off made visible side by side. Each boundary
# latches its own first crossing; an uncrossed look 5 accepts. Same
# cn-keyed int64 guard as the OBF gate. The pytest plant puts |z1|
# between the two look-1 bounds: Pocock rejects at look 1 while OBF
# holds to a later look.
# ---------------------------------------------------------------------------
_GROUP_SEQ_POCOCK = _GS_FOLD + """z AS (
  SELECT k, cn, cd, nt,
         CASE WHEN CAST(cn AS DOUBLE) * 100 < 9e18 THEN
           CAST(100 * cd - 18 * cn AS DOUBLE)
             / SQRT(CAST(cn AS DOUBLE) * 1476) END AS zk,
         2.040407 * SQRT(5e0 / k) AS bound_obf,
         2.413e0 AS bound_poc
  FROM at_look
),
lat AS (
  SELECT k, cn, cd, nt, zk, bound_obf, bound_poc,
         CAST(MIN(CASE WHEN ABS(zk) >= bound_obf THEN k END)
              OVER w AS BIGINT) AS k_obf,
         CAST(MIN(CASE WHEN ABS(zk) >= bound_poc THEN k END)
              OVER w AS BIGINT) AS k_poc
  FROM z
  WINDOW w AS (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW)
)
SELECT k AS look, cn AS n_at_look, cd AS d_at_look,
       CASE WHEN CAST(cn AS DOUBLE) * 100 < 9e18
            THEN ROUND(zk, 6) END AS z,
       ROUND(bound_obf, 6) AS boundary_obf,
       ROUND(bound_poc, 6) AS boundary_pocock,
       CASE WHEN CAST(cn AS DOUBLE) * 100 >= 9e18 THEN NULL
            WHEN k_obf IS NOT NULL THEN 'reject_h0'
            WHEN k = 5 THEN 'accept_h0'
            ELSE 'continue' END AS decision_obf,
       CASE WHEN CAST(cn AS DOUBLE) * 100 >= 9e18 THEN NULL
            WHEN k_poc IS NOT NULL THEN 'reject_h0'
            WHEN k = 5 THEN 'accept_h0'
            ELSE 'continue' END AS decision_pocock
FROM lat
"""


def _events_group_sequential_pocock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pocock constant boundary (2.413, K=5 two-sided 5%) beside the
    O'Brien-Fleming boundary on the SAME five-look fold — the
    alpha-spending trade-off in one relation. See _GROUP_SEQ_POCOCK."""
    load(spark, sf_dir)
    return spark.sql(_GROUP_SEQ_POCOCK)


QUERIES["events_group_sequential_pocock"] = _events_group_sequential_pocock
ORACLES["events_group_sequential_pocock"] = _GROUP_SEQ_POCOCK


def _streaming_cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of events_cochran_q (streaming.stream_cochran_flags
    + materialized_cochran_q): per-user monotone three-bit flag state,
    the exact-integer statistic tail applied to the final materialized
    state with the batch spelling — graded by the SAME oracle (26th
    stream==batch twin)."""
    load(spark, sf_dir)
    from datafusion_gpu_spark import streaming

    return streaming.materialized_cochran_q(spark, sf_dir)


QUERIES["streaming_cochran_q"] = _streaming_cochran_q
ORACLES["streaming_cochran_q"] = _COCHRAN_Q


def _streaming_group_sequential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of events_group_sequential
    (streaming.materialized_group_sequential): watermarked hourly
    tumbling (n, d) state run to completion, then the batch _GS_FOLD
    decision tail verbatim over the materialized state — graded by the
    SAME _GROUP_SEQ oracle (27th stream==batch twin, 25th registry
    twin)."""
    load(spark, sf_dir)
    from datafusion_gpu_spark import streaming

    return streaming.materialized_group_sequential(spark, sf_dir)


QUERIES["streaming_group_sequential"] = _streaming_group_sequential
ORACLES["streaming_group_sequential"] = _GROUP_SEQ


# ---------------------------------------------------------------------------
# Round 13 — Benjamini-Hochberg FDR control (Benjamini & Hochberg
# 1995): the MULTIPLE-TESTING member the inference suite lacked. Every
# per-segment battery in this engine (proportion tests by type, chi2 by
# source, drift by shard) hands the analyst m simultaneous p-values;
# testing each at 5% inflates the family-wise false-positive rate,
# while Bonferroni over-corrects. BH's step-up rule — reject the k
# smallest p-values where k = max{i : p_(i) <= q*i/m} — controls the
# expected false-discovery proportion at q.
#
# The battery here: for each event_type, a two-sided test of "daytime
# share = 1/2" (events in hour-of-day 0-11 vs 12-23). The z numerator
# and radicand are EXACT bigints (z = (2x - n)/sqrt(n)); the two-sided
# p-value is the Zelen & Severo 26.2.17 rational approximation of the
# normal tail (|error| < 7.5e-8, four orders below the ROUND(...,6)
# output grid) spelled in Horner form IDENTICALLY in both engines —
# EXP is the only libm call, the established greenwood-fold precedent.
# The step-up itself is exact: ranks ordered by (p, event_type) (the
# deterministic tiebreak), k* = MAX(rank where p <= q*rank/m) over the
# m-row relation, reject = rank <= k* — BH's monotone-envelope
# semantics, which can reject a p-value ABOVE its own threshold when a
# later rank crosses (the planted pytest exercises exactly that).
# Scale: one groupBy(event_type) fold (domain-bounded output), windows
# over the m-row relation. VISIBLE guard: n*4 < 9e18 bounds 2x - n.
# ---------------------------------------------------------------------------
_BH_FDR = """
WITH seg AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN hour(ts) < 12 THEN 1 ELSE 0 END)
              AS BIGINT) AS x
  FROM events
  GROUP BY event_type
),
z AS (
  SELECT event_type, n, x,
         CASE WHEN CAST(n AS DOUBLE) * 4 < 9e18 THEN
           CAST(2 * x - n AS DOUBLE) / SQRT(CAST(n AS DOUBLE)) END AS zs
  FROM seg
),
p AS (
  SELECT event_type, n, x, zs,
         LEAST(1.0, 2.0 * ((EXP(-(ABS(zs) * ABS(zs)) / 2.0)
           / 2.5066282746310002)
           * ((((1.330274429 * (1.0 / (1.0 + 0.2316419 * ABS(zs)))
                 - 1.821255978) * (1.0 / (1.0 + 0.2316419 * ABS(zs)))
                + 1.781477937) * (1.0 / (1.0 + 0.2316419 * ABS(zs)))
               - 0.356563782) * (1.0 / (1.0 + 0.2316419 * ABS(zs)))
              + 0.319381530) * (1.0 / (1.0 + 0.2316419 * ABS(zs)))))
           AS pv
  FROM z
),
ranked AS (
  SELECT event_type, n, x, zs, pv,
         ROW_NUMBER() OVER (ORDER BY pv, event_type) AS rn,
         CAST(COUNT(*) OVER () AS BIGINT) AS m
  FROM p
),
kstar AS (
  SELECT event_type, n, x, zs, pv, rn, m,
         MAX(CASE WHEN pv <= CAST(0.05 AS DOUBLE) * rn / m THEN rn END)
           OVER () AS k_max
  FROM ranked
)
SELECT event_type, n, x,
       ROUND(zs, 6) AS z,
       ROUND(pv, 6) AS p_value,
       CAST(rn AS BIGINT) AS p_rank, m AS n_tests,
       ROUND(CAST(0.05 AS DOUBLE) * rn / m, 6) AS bh_threshold,
       CASE WHEN zs IS NULL THEN NULL
            WHEN k_max IS NOT NULL AND rn <= k_max THEN TRUE
            ELSE FALSE END AS rejected
FROM kstar ORDER BY p_rank
"""


def _agg_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg step-up at q = 0.05 over the per-event-type
    daytime-share z battery. See _BH_FDR."""
    load(spark, sf_dir)
    return spark.sql(_BH_FDR)


QUERIES["agg_bh_fdr"] = _agg_bh_fdr
ORACLES["agg_bh_fdr"] = _BH_FDR


# ---------------------------------------------------------------------------
# Round 13 — two-sample Poisson rate-ratio test (conditional binomial;
# Przyborowski & Wilenski 1940, normal-approximation form): the
# EXPOSURE-WEIGHTED member of the A/B family. events_proportion_ztest
# compares per-trial shares; event RATES need each cohort's observation
# time in the denominator — a cohort observed twice as long produces
# twice the purchases at the same underlying rate, and the proportion
# test would false-alarm. Conditional on the pooled count k, the
# cohort-1 count is Binomial(k, p0) with p0 = e1/(e1+e0) (the exposure
# share), so z = (k1 - k*p0) / sqrt(k*p0*(1-p0)). Counts and
# exposure-hours are EXACT bigints (one groupBy(user) then a
# one-row conditional fold); p0/z are terminal single-expression
# doubles. VISIBLE guard: the normal approximation needs k*p0 and
# k*(1-p0) material (>= 10, the textbook rule) — below that the test
# reports NULL rather than an untrustworthy z.
# ---------------------------------------------------------------------------
_RATE_RATIO = """
WITH life AS (
  SELECT user_id % 2 AS g,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS k,
         CAST((MAX(epoch_us(ts)) - MIN(epoch_us(ts))) // 3600000000
              + 1 AS BIGINT) AS exp_h
  FROM events GROUP BY user_id
),
coh AS (
  SELECT g, CAST(SUM(k) AS BIGINT) AS k, CAST(SUM(exp_h) AS BIGINT) AS e
  FROM life GROUP BY g
),
folded AS (
  SELECT CAST(MAX(CASE WHEN g = 1 THEN k END) AS BIGINT) AS k1,
         CAST(MAX(CASE WHEN g = 0 THEN k END) AS BIGINT) AS k0,
         CAST(MAX(CASE WHEN g = 1 THEN e END) AS BIGINT) AS e1,
         CAST(MAX(CASE WHEN g = 0 THEN e END) AS BIGINT) AS e0
  FROM coh
),
stat AS (
  SELECT k1, k0, e1, e0, k1 + k0 AS k,
         CAST(e1 AS DOUBLE) / (CAST(e1 AS DOUBLE) + CAST(e0 AS DOUBLE))
           AS p0
  FROM folded
)
SELECT k1, k0, e1 AS exposure_h_1, e0 AS exposure_h_0,
       ROUND((CAST(k1 AS DOUBLE) / e1) / (CAST(k0 AS DOUBLE) / e0), 6)
         AS rate_ratio,
       CASE WHEN CAST(k AS DOUBLE) * p0 >= 10
                 AND CAST(k AS DOUBLE) * (1.0 - p0) >= 10
            THEN ROUND((CAST(k1 AS DOUBLE) - CAST(k AS DOUBLE) * p0)
                       / SQRT(CAST(k AS DOUBLE) * p0 * (1.0 - p0)), 6)
       END AS z_rate,
       CASE WHEN CAST(k AS DOUBLE) * p0 >= 10
                 AND CAST(k AS DOUBLE) * (1.0 - p0) >= 10
            THEN ABS((CAST(k1 AS DOUBLE) - CAST(k AS DOUBLE) * p0)
                     / SQRT(CAST(k AS DOUBLE) * p0 * (1.0 - p0)))
                 > 1.959964 END AS reject_05
FROM stat
"""

#: Spark twin of _RATE_RATIO — identical except the epoch spelling
#: (unix_micros(CAST .. AS TIMESTAMP) vs DuckDB's epoch_us) and DIV.
_RATE_RATIO_SPARK = _RATE_RATIO.replace(
    "(MAX(epoch_us(ts)) - MIN(epoch_us(ts))) // 3600000000",
    "(MAX(unix_micros(CAST(ts AS TIMESTAMP)))"
    " - MIN(unix_micros(CAST(ts AS TIMESTAMP)))) DIV 3600000000",
)


def _events_rate_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exposure-weighted purchase-rate comparison between the user_id
    parity cohorts: conditional-binomial z on the pooled count with
    exposure-share null. See _RATE_RATIO."""
    load(spark, sf_dir)
    return spark.sql(_RATE_RATIO_SPARK)


QUERIES["events_rate_ratio"] = _events_rate_ratio
ORACLES["events_rate_ratio"] = _RATE_RATIO


# ---------------------------------------------------------------------------
# Round 13 — empirical-Bayes rate shrinkage (beta-binomial method of
# moments; Robbins 1956; the "add intelligent pseudocounts" estimator):
# the small-n scoring member the curation suite lacked. Ranking
# users/sources by raw conversion rate x/n crowns whoever has n = 2,
# x = 2; shrinking toward the population with a beta prior fitted by
# moments — alpha = p*M, beta = (1-p)*M, M = p(1-p)/s^2 - 1 — makes a
# 2/2 lose to a 180/400. Moment estimation runs on per-user rates
# QUANTIZED to an exact 1e-4 grid (hyperparameter estimation needs no
# more precision, and the rq^2 fold then stays inside int64 to ~9e10
# users — the VISIBLE guard); the final shrunk rate (x + alpha) /
# (n + alpha + beta) is computed from the exact per-user bigints.
# Degenerate dispersion (s^2 = 0 or M <= 0: rates identical, or
# overdispersed beyond the beta-binomial's reach at these n) surfaces
# NULL shrunk rates rather than a junk prior. Scale: one
# groupBy(user) fold, one one-row moment fold, broadcast back; top-20
# by (shrunk, user_id) via TakeOrdered.
# ---------------------------------------------------------------------------
_EB_SHRINK = """
WITH per_u AS (
  SELECT user_id,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS x
  FROM events GROUP BY user_id
),
rq AS (
  SELECT user_id, n, x,
         CAST(ROUND(1e4 * (CAST(x AS DOUBLE) / n), 0) AS BIGINT) AS r4
  FROM per_u
),
mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS m,
         CAST(SUM(r4) AS BIGINT) AS sr,
         CAST(SUM(r4 * r4) AS BIGINT) AS sr2
  FROM rq
),
prior AS (
  SELECT m, sr, sr2,
         CAST(sr AS DOUBLE) / (1e4 * m) AS pbar,
         CASE WHEN m > 1 AND CAST(m AS DOUBLE) * 1e8 < 9e18 THEN
           (CAST(sr2 AS DOUBLE) / 1e8
            - (CAST(sr AS DOUBLE) / 1e4) * (CAST(sr AS DOUBLE) / 1e4) / m)
           / (m - 1)
         END AS s2
  FROM mom
),
ab AS (
  SELECT m, pbar, s2,
         CASE WHEN s2 > 0 AND pbar * (1.0 - pbar) / s2 - 1.0 > 0
              THEN pbar * (pbar * (1.0 - pbar) / s2 - 1.0) END AS alpha,
         CASE WHEN s2 > 0 AND pbar * (1.0 - pbar) / s2 - 1.0 > 0
              THEN (1.0 - pbar) * (pbar * (1.0 - pbar) / s2 - 1.0)
         END AS beta
  FROM prior
)
SELECT user_id, n, x,
       ROUND(CAST(x AS DOUBLE) / n, 6) AS raw_rate,
       ROUND((CAST(x AS DOUBLE) + alpha)
             / (CAST(n AS DOUBLE) + alpha + beta), 6) AS shrunk_rate,
       ROUND(alpha, 6) AS alpha, ROUND(beta, 6) AS beta
FROM rq CROSS JOIN ab
ORDER BY (CAST(x AS DOUBLE) + alpha)
           / (CAST(n AS DOUBLE) + alpha + beta) DESC, user_id
LIMIT 20
"""


def _curation_eb_shrinkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 users by empirical-Bayes shrunk purchase rate
    (beta-binomial moment prior fitted on the 1e-4 rate grid). See
    _EB_SHRINK."""
    load(spark, sf_dir)
    return spark.sql(_EB_SHRINK)


QUERIES["curation_eb_shrinkage"] = _curation_eb_shrinkage
ORACLES["curation_eb_shrinkage"] = _EB_SHRINK


# ---------------------------------------------------------------------------
# Round 13 — CUPED variance reduction (Deng, Xu, Kohavi & Walker 2013):
# the modern experimentation workhorse the A/B family lacked. The
# two-sample tests (events_ab_test, events_rate_ratio) pay the full
# between-user variance; CUPED regresses each user's POST-period spend
# on their PRE-period spend (theta = cov(X,Y)/var(X), fitted pooled —
# the pre-period predates assignment, so adjustment cannot bias the
# effect) and tests the adjusted metric Y - theta*(X - Xbar), cutting
# variance by ~rho^2 and shrinking the detectable effect accordingly.
#
# Numeric contract: per-user pre/post cent totals are EXACT bigints
# (one groupBy(user) with the global time midpoint broadcast); the
# pooled moment folds (sx, sy, sxy, sxx, syy) are exact bigint sums
# with a VISIBLE m2-based headroom guard (n * max(x^2, |xy|, y^2) <
# 9e18 — per-row products stay inside int64 to ~$92M user totals);
# theta/xbar are terminal single-expression doubles; the ADJUSTED
# per-user value quantizes ONCE to the whole-cent grid (bias < 0.5
# cent per user, deterministic both engines), making the per-cohort
# adjusted folds exact bigints again. z tests are Welch-style on the
# cohort folds. Scale: one groupBy(user), one one-row moment fold
# broadcast back, one groupBy(cohort) — no pair spaces, no windows.
# ---------------------------------------------------------------------------
_CUPED = """
WITH rng AS (
  SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2 AS tmid
  FROM events
),
per_u AS (
  SELECT user_id % 2 AS g,
         CAST(SUM(CASE WHEN event_type = 'purchase'
                            AND epoch_us(ts) < tmid
                       THEN CAST(ROUND(value * 100, 0) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS x,
         CAST(SUM(CASE WHEN event_type = 'purchase'
                            AND epoch_us(ts) >= tmid
                       THEN CAST(ROUND(value * 100, 0) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS y
  FROM events CROSS JOIN rng
  GROUP BY user_id
),
mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(MAX(GREATEST(x * x, ABS(x * y), y * y)) AS BIGINT) AS m2
  FROM per_u
),
th AS (
  SELECT n, m2,
         CAST(sx AS DOUBLE) / n AS xbar,
         CASE WHEN CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n > 0
              THEN (CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n)
                   / (CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
              ELSE 0.0 END AS theta,
         CAST(n AS DOUBLE) * m2 < 9e18 AS ok
  FROM mom
),
adj AS (
  SELECT g, x, y, theta, ok,
         CAST(ROUND(CAST(y AS DOUBLE)
                    - theta * (CAST(x AS DOUBLE) - xbar), 0) AS BIGINT)
           AS a
  FROM per_u CROSS JOIN th
),
coh AS (
  SELECT g,
         CAST(COUNT(*) AS BIGINT) AS ng,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(y * y) AS BIGINT) AS syy,
         CAST(SUM(a) AS BIGINT) AS sa,
         CAST(SUM(a * a) AS BIGINT) AS saa,
         BOOL_AND(ok) AS ok
  FROM adj GROUP BY g
),
piv AS (
  SELECT MAX(CASE WHEN g = 1 THEN ng END) AS n1,
         MAX(CASE WHEN g = 0 THEN ng END) AS n0,
         MAX(CASE WHEN g = 1 THEN sy END) AS sy1,
         MAX(CASE WHEN g = 0 THEN sy END) AS sy0,
         MAX(CASE WHEN g = 1 THEN syy END) AS syy1,
         MAX(CASE WHEN g = 0 THEN syy END) AS syy0,
         MAX(CASE WHEN g = 1 THEN sa END) AS sa1,
         MAX(CASE WHEN g = 0 THEN sa END) AS sa0,
         MAX(CASE WHEN g = 1 THEN saa END) AS saa1,
         MAX(CASE WHEN g = 0 THEN saa END) AS saa0,
         BOOL_AND(ok) AS ok
  FROM coh
),
st AS (
  SELECT n1, n0, ok,
         CAST(sy1 AS DOUBLE) / n1 AS my1,
         CAST(sy0 AS DOUBLE) / n0 AS my0,
         (CAST(syy1 AS DOUBLE)
          - CAST(sy1 AS DOUBLE) * CAST(sy1 AS DOUBLE) / n1) / (n1 - 1)
           AS vy1,
         (CAST(syy0 AS DOUBLE)
          - CAST(sy0 AS DOUBLE) * CAST(sy0 AS DOUBLE) / n0) / (n0 - 1)
           AS vy0,
         CAST(sa1 AS DOUBLE) / n1 AS ma1,
         CAST(sa0 AS DOUBLE) / n0 AS ma0,
         (CAST(saa1 AS DOUBLE)
          - CAST(sa1 AS DOUBLE) * CAST(sa1 AS DOUBLE) / n1) / (n1 - 1)
           AS va1,
         (CAST(saa0 AS DOUBLE)
          - CAST(sa0 AS DOUBLE) * CAST(sa0 AS DOUBLE) / n0) / (n0 - 1)
           AS va0
  FROM piv
)
SELECT n1, n0,
       CASE WHEN ok THEN ROUND((SELECT theta FROM th), 6) END AS theta,
       CASE WHEN ok THEN ROUND((my1 - my0) / 100.0, 6) END AS diff_unadj,
       CASE WHEN ok AND vy1 / n1 + vy0 / n0 > 0
            THEN ROUND((my1 - my0) / SQRT(vy1 / n1 + vy0 / n0), 6)
       END AS z_unadj,
       CASE WHEN ok THEN ROUND((ma1 - ma0) / 100.0, 6) END AS diff_cuped,
       CASE WHEN ok AND va1 / n1 + va0 / n0 > 0
            THEN ROUND((ma1 - ma0) / SQRT(va1 / n1 + va0 / n0), 6)
       END AS z_cuped,
       CASE WHEN ok AND vy1 + vy0 > 0
            THEN ROUND(1.0 - (va1 + va0) / (vy1 + vy0), 6)
       END AS var_reduction
FROM st
"""

#: Spark twin — identical except the epoch spelling and DIV.
_CUPED_SPARK = _CUPED.replace(
    "epoch_us(ts)", "unix_micros(CAST(ts AS TIMESTAMP))"
).replace(
    "(MIN(unix_micros(CAST(ts AS TIMESTAMP)))"
    " + MAX(unix_micros(CAST(ts AS TIMESTAMP)))) // 2",
    "(MIN(unix_micros(CAST(ts AS TIMESTAMP)))"
    " + MAX(unix_micros(CAST(ts AS TIMESTAMP)))) DIV 2",
).replace("BOOL_AND", "EVERY")


def _events_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED-adjusted purchase-spend A/B between the user_id parity
    cohorts: pre-period covariate theta-fit pooled, Welch z on raw and
    adjusted metrics, realized variance reduction. See _CUPED."""
    load(spark, sf_dir)
    return spark.sql(_CUPED_SPARK)


QUERIES["events_cuped"] = _events_cuped
ORACLES["events_cuped"] = _CUPED


# ---------------------------------------------------------------------------
# Round 13 — leave-one-user-out jackknife SE for a RATIO metric (Quenouille
# 1956; Tukey 1958; the delta-method alternative every experimentation
# platform ships): revenue-per-event theta = SUM(Y_u)/SUM(N_u) is a
# ratio of sums, so the per-event CLT does not apply (events within a
# user are correlated) and a naive SE is anti-conservative. The
# jackknife resamples USERS: theta_(u) = (SY - Y_u)/(SN - N_u) is a
# CLOSED FORM per user given the broadcast totals — n leave-one-out
# estimates in ONE pass, no loop.
#
# Numeric contract: per-user Y (cents) and N are exact bigints; the
# totals are one exact one-row fold; each LOO RELATIVE deviation
# r_u = theta_(u)/theta - 1 quantizes once to a 1e-9 bigint (a single
# user can move the ratio by at most O(1), so |rq| stays ~1e9; the
# per-row square is VISIBLY guarded at |rq| < 3e9 — beyond it the row
# poisons the fold to NULL rather than wrapping), making the jackknife
# moment folds exact integer sums. SE = theta * sqrt((n-1)/n *
# sum((r - rbar)^2)). Scale: one groupBy(user), one one-row totals
# fold broadcast back, one one-row moment fold.
# ---------------------------------------------------------------------------
_JACKKNIFE = """
WITH per_u AS (
  SELECT CAST(SUM(CASE WHEN event_type = 'purchase'
                       THEN CAST(ROUND(value * 100, 0) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS y,
         CAST(COUNT(*) AS BIGINT) AS nn
  FROM events GROUP BY user_id
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(nn) AS BIGINT) AS sn
  FROM per_u
),
loo AS (
  SELECT n, sy, sn,
         CAST(sy AS DOUBLE) / sn AS theta,
         CASE WHEN sn - nn > 0 THEN
           CAST(ROUND(1e9 * ((CAST(sy - y AS DOUBLE) / (sn - nn))
                             / (CAST(sy AS DOUBLE) / sn) - 1.0), 0)
                AS BIGINT)
         END AS rq
  FROM per_u CROSS JOIN tot
),
mom AS (
  SELECT MAX(n) AS n, MAX(theta) AS theta,
         CAST(SUM(rq) AS BIGINT) AS srq,
         CAST(SUM(CASE WHEN ABS(rq) < 3000000000 THEN rq * rq END)
              AS BIGINT) AS srq2
  FROM loo
)
SELECT n AS n_users,
       ROUND(theta / 100.0, 6) AS revenue_per_event,
       CASE WHEN n > 1 AND srq2 IS NOT NULL THEN
         ROUND(theta / 100.0
               * SQRT((CAST(n AS DOUBLE) - 1.0) / n
                      * (CAST(srq2 AS DOUBLE) / 1e18
                         - (CAST(srq AS DOUBLE) / 1e9)
                           * (CAST(srq AS DOUBLE) / 1e9) / n)), 6)
       END AS se_jackknife,
       CASE WHEN n > 1 AND srq2 IS NOT NULL THEN
         ROUND(theta / 100.0
               - 1.959964 * (theta / 100.0
                 * SQRT((CAST(n AS DOUBLE) - 1.0) / n
                        * (CAST(srq2 AS DOUBLE) / 1e18
                           - (CAST(srq AS DOUBLE) / 1e9)
                             * (CAST(srq AS DOUBLE) / 1e9) / n))), 6)
       END AS ci_lo,
       CASE WHEN n > 1 AND srq2 IS NOT NULL THEN
         ROUND(theta / 100.0
               + 1.959964 * (theta / 100.0
                 * SQRT((CAST(n AS DOUBLE) - 1.0) / n
                        * (CAST(srq2 AS DOUBLE) / 1e18
                           - (CAST(srq AS DOUBLE) / 1e9)
                             * (CAST(srq AS DOUBLE) / 1e9) / n))), 6)
       END AS ci_hi
FROM mom
"""


def _events_jackknife_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-user-out jackknife SE + 95% CI for revenue-per-event
    (a ratio of sums — user-clustered, so per-event CLT SEs are
    wrong). See _JACKKNIFE."""
    load(spark, sf_dir)
    return spark.sql(_JACKKNIFE)


QUERIES["events_jackknife_ratio"] = _events_jackknife_ratio
ORACLES["events_jackknife_ratio"] = _JACKKNIFE
