"""Aggregate surface beyond plain sum/avg (SURVEY §2.4b).

Statistical aggregates are rounded on both sides: Spark and DuckDB use
different (but both numerically-stable) accumulation schemes, so raw
doubles differ in the last few ulps; rounding to a quantum far above the
cross-engine noise but far below the signal keeps the hash compare stable.
"""

from __future__ import annotations

from datafusion_gpu_spark.queries import sql_query

_STATS = """
SELECT l_returnflag AS flag,
       ROUND(STDDEV_SAMP(l_extendedprice), 2) AS sd_price,
       ROUND(STDDEV_POP(l_extendedprice), 2)  AS sdp_price,
       ROUND(CORR(l_quantity, l_extendedprice), 6) AS corr_qty_price,
       ROUND(COVAR_SAMP(l_quantity, l_discount), 6) AS covar_qty_disc
FROM lineitem
GROUP BY l_returnflag
"""

_DISTINCT = """
SELECT l_returnflag AS flag,
       COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(DISTINCT l_suppkey) AS n_suppliers,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
"""

# array_agg w/ ORDER BY -> emitted as a joined string so the compare is on
# a scalar; Spark spells it sort_array(collect_list(..)), DuckDB string_agg.
_COLLECT_SPARK = """
SELECT n.n_name AS nation,
       array_join(sort_array(collect_list(s.s_name)), ',') AS suppliers
FROM nation n JOIN supplier s ON n.n_nationkey = s.s_nationkey
GROUP BY n.n_name
"""

_COLLECT_DUCK = """
SELECT n.n_name AS nation,
       string_agg(s.s_name, ',' ORDER BY s.s_name) AS suppliers
FROM nation n JOIN supplier s ON n.n_nationkey = s.s_nationkey
GROUP BY n.n_name
"""

_ROLLUP = """
SELECT COALESCE(r.r_name, 'ALL') AS region,
       COALESCE(n.n_name, 'ALL') AS nation,
       COUNT(*) AS n
FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP(r.r_name, n.n_name)
"""

_GROUPING_SETS = """
SELECT COALESCE(c_mktsegment, 'ALL') AS segment,
       COALESCE(CAST(c_nationkey AS STRING), 'ALL') AS nationkey,
       COUNT(*) AS n,
       ROUND(SUM(c_acctbal), 2) AS bal
FROM customer
GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
"""

_GROUPING_SETS_DUCK = _GROUPING_SETS.replace("AS STRING", "AS VARCHAR")

# CUBE = all 2^k grouping sets; GROUPING() disambiguates a real NULL key
# from a subtotal row (both engines number the bitmask identically).
_CUBE = """
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
       CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
       COUNT(*) AS n
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
"""

_FILTER_CLAUSE = """
SELECT l_linestatus AS status,
       COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
       COUNT(*) FILTER (WHERE l_returnflag = 'R') AS n_returned,
       SUM(l_quantity) FILTER (WHERE l_quantity >= 25) AS qty_large
FROM lineitem
GROUP BY l_linestatus
"""

_BOOL_BIT = """
SELECT o_orderpriority AS priority,
       BOOL_AND(o_totalprice > 1000)    AS all_above_1k,
       BOOL_OR(o_orderstatus = 'P')     AS any_pending,
       BIT_AND(o_orderkey % 256)        AS band,
       BIT_OR(o_orderkey % 256)         AS bor,
       BIT_XOR(o_orderkey)              AS bxor
FROM orders
GROUP BY o_orderpriority
"""

_MEDIAN = """
SELECT l_returnflag AS flag,
       ROUND(MEDIAN(l_extendedprice), 4) AS med_price,
       MEDIAN(l_quantity) AS med_qty
FROM lineitem
GROUP BY l_returnflag
"""

# The ordering key embeds l_orderkey as a tiebreaker: l_extendedprice is
# not unique within a group, and on a price tie Spark and DuckDB would
# otherwise be free to pick different orderkeys. DuckDB's MAX_BY takes no
# struct keys, so the composite is numeric: prices have 2 decimals, so
# round(price*100) is an exact integer <= ~1.1e7 and the key
# price_cents * 10^9 + orderkey is collision-free for orderkey < 10^9.
_MINMAX_KEY = "CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) * 1000000000 + l_orderkey"
_MINMAX_BY = f"""
SELECT l_returnflag AS flag,
       MAX_BY(l_orderkey, {_MINMAX_KEY}) AS top_order,
       MIN_BY(l_orderkey, {_MINMAX_KEY}) AS bottom_order,
       ROUND(MAX(l_extendedprice), 2) AS top_price
FROM lineitem
GROUP BY l_returnflag
"""

# Approximate aggregates: algorithms differ across engines by design, so no
# value oracle — the driver records a rows-only check (SURVEY §2.4b).
_APPROX = """
SELECT l_returnflag AS flag,
       APPROX_COUNT_DISTINCT(l_partkey) AS approx_parts,
       ROUND(APPROX_PERCENTILE(l_extendedprice, 0.5), 2) AS approx_med
FROM lineitem
GROUP BY l_returnflag
"""

# …but the ERROR BOUND is checkable: Spark computes |approx - exact|
# relative error against its own exact aggregates and the oracle states
# the expected verdict — HLL++ (rsd default 5%) and approx_percentile
# must land within 5%.
_APPROX_BOUNDED = """
SELECT l_returnflag AS flag,
       (ABS(APPROX_COUNT_DISTINCT(l_partkey) - COUNT(DISTINCT l_partkey))
          / COUNT(DISTINCT l_partkey) < 0.05) AS hll_ok,
       (ABS(APPROX_PERCENTILE(l_extendedprice, 0.5)
            - PERCENTILE(l_extendedprice, 0.5))
          / PERCENTILE(l_extendedprice, 0.5) < 0.05) AS pct_ok
FROM lineitem
GROUP BY l_returnflag
"""

_APPROX_BOUNDED_DUCK = """
SELECT l_returnflag AS flag, TRUE AS hll_ok, TRUE AS pct_ok
FROM lineitem GROUP BY l_returnflag
"""

# DataSketches HLL (Spark 3.5+ hll_sketch_agg / hll_union_agg): the
# MERGEABLE-sketch discipline a 1000-executor rollup needs — partial
# sketches built per group, unioned across groups without rescanning.
# Like agg_approximate, the estimate itself is engine-specific; the
# GRADED invariants are the 5% error bound per lang and that the
# union-of-sketches estimate meets the same bound on the global count.
_HLL_SKETCH = """
WITH w AS (
  SELECT lang, explode(split(text, ' ')) AS word FROM documents
),
per AS (
  SELECT lang, hll_sketch_agg(word, 12) AS sk,
         COUNT(DISTINCT word) AS exact_d
  FROM w GROUP BY lang
)
SELECT lang,
       (ABS(hll_sketch_estimate(sk) - exact_d) / exact_d <= 0.05) AS hll_ok
FROM per
UNION ALL
SELECT 'ALL' AS lang,
       (ABS(hll_sketch_estimate(hll_union_agg(sk))
            - (SELECT COUNT(DISTINCT word) FROM w))
          / (SELECT COUNT(DISTINCT word) FROM w) <= 0.05) AS hll_ok
FROM per
"""

_HLL_SKETCH_DUCK = """
SELECT lang, TRUE AS hll_ok FROM documents GROUP BY lang
UNION ALL SELECT 'ALL' AS lang, TRUE AS hll_ok
"""


# -- DataSketches family (Spark 4.1 built-ins), beyond the HLL entry -------
# Exact distinct via mergeable BITMAPS: the two-level (bucket, or-agg)
# rollup is the scale spelling — partial bitmaps combine map-side, and
# the final count is a SUM of per-bucket popcounts instead of a distinct
# shuffle of raw values. Exact by construction, so the oracle is plain
# COUNT(DISTINCT).
_BITMAP_DISTINCT = """
WITH buckets AS (
  SELECT event_type, bitmap_bucket_number(user_id) AS b,
         bitmap_count(bitmap_construct_agg(bitmap_bit_position(user_id))) AS cnt
  FROM events GROUP BY event_type, bitmap_bucket_number(user_id)
)
SELECT event_type, SUM(cnt) AS n_users FROM buckets GROUP BY event_type
"""

_BITMAP_DISTINCT_DUCK = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type
"""

# THETA sketches: approximate distinct sets with SET OPERATIONS — the
# sketch family HLL cannot provide (no intersection). Graded like the
# HLL entry: exact anchors replayed by the oracle + error-bound booleans
# (5% bound vs theta's sub-1% at these cardinalities; below sketch
# saturation theta is exact, so the bound is loose on purpose).
_THETA_SETOPS = """
WITH sk AS (
  SELECT theta_sketch_agg(user_id) FILTER (WHERE event_type = 'view') AS sv,
         theta_sketch_agg(user_id) FILTER (WHERE event_type = 'purchase') AS sp
  FROM events
),
ex_u AS (
  SELECT COUNT(DISTINCT user_id) AS ex_union FROM events
  WHERE event_type IN ('view', 'purchase')
),
ex_i AS (
  SELECT COUNT(*) AS ex_inter FROM (
    SELECT user_id FROM events WHERE event_type = 'view' GROUP BY user_id
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'purchase' GROUP BY user_id
  )
)
SELECT ex_union, ex_inter,
       (ABS(theta_sketch_estimate(theta_union(sv, sp)) - ex_union)
          / ex_union <= 0.05) AS union_ok,
       (ABS(theta_sketch_estimate(theta_intersection(sv, sp)) - ex_inter)
          / GREATEST(ex_inter, 1) <= 0.05) AS inter_ok
FROM sk CROSS JOIN ex_u CROSS JOIN ex_i
"""

_THETA_SETOPS_DUCK = """
WITH ex_u AS (
  SELECT COUNT(DISTINCT user_id) AS ex_union FROM events
  WHERE event_type IN ('view', 'purchase')
),
ex_i AS (
  SELECT COUNT(*) AS ex_inter FROM (
    SELECT user_id FROM events WHERE event_type = 'view' GROUP BY user_id
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'purchase' GROUP BY user_id
  )
)
SELECT ex_union, ex_inter, TRUE AS union_ok, TRUE AS inter_ok
FROM ex_u CROSS JOIN ex_i
"""

# KLL quantile sketch: mergeable streaming quantiles. The sketch's
# q-quantile must land within +-5% RANK of q against the raw data
# (KLL's k=200 default guarantees ~1.65% — 3x headroom); the oracle
# replays the row count and the by-construction booleans.
_KLL_QUANTILES = """
WITH sk AS (
  SELECT kll_sketch_agg_double(value) AS s, COUNT(value) AS n FROM events
),
q AS (
  SELECT n, kll_sketch_get_quantile_double(s, 0.5) AS q50,
         kll_sketch_get_quantile_double(s, 0.9) AS q90
  FROM sk
)
SELECT q.n,
       (SUM(CASE WHEN e.value <= q.q50 THEN 1 ELSE 0 END) / CAST(q.n AS DOUBLE)
          BETWEEN 0.45 AND 0.55) AS q50_rank_ok,
       (SUM(CASE WHEN e.value <= q.q90 THEN 1 ELSE 0 END) / CAST(q.n AS DOUBLE)
          BETWEEN 0.85 AND 0.95) AS q90_rank_ok
FROM events e CROSS JOIN q
GROUP BY q.n
"""

_KLL_QUANTILES_DUCK = """
SELECT COUNT(value) AS n, TRUE AS q50_rank_ok, TRUE AS q90_rank_ok
FROM events
"""


# mode() with a deterministic tiebreak (count desc, value asc) — both
# engines ship a native mode() but neither defines tie order, so the
# portable spelling is the count + row_number rewrite, identical SQL.
_MODE = """
SELECT segment, priority AS mode_priority, n
FROM (
  SELECT c_mktsegment AS segment, o_orderpriority AS priority,
         COUNT(*) AS n,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY COUNT(*) DESC, o_orderpriority) AS rn
  FROM customer JOIN orders ON o_custkey = c_custkey
  GROUP BY c_mktsegment, o_orderpriority
) t
WHERE rn = 1
"""

# linear-regression aggregate family (regr_slope/intercept/r2) — the
# closed-form least-squares both engines implement natively; two-phase
# mergeable moments, so map-side partials work at any scale.
_REGRESSION = """
SELECT l_returnflag AS flag,
       ROUND(REGR_SLOPE(l_extendedprice, l_quantity), 4) AS slope,
       ROUND(REGR_INTERCEPT(l_extendedprice, l_quantity), 2) AS intercept,
       ROUND(REGR_R2(l_extendedprice, l_quantity), 6) AS r2,
       COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag
"""

# LISTAGG (SURVEY §2.4b collection aggs — the SQL:2016 spelling): Spark 4
# added native listagg(...) WITHIN GROUP (ORDER BY ...); DuckDB spells it
# string_agg(expr, sep ORDER BY ...). agg_collect_ordered covers the
# array-flavored emulation (sort_array(collect_list)); this entry checks
# the native ordered-string aggregate directly, per-nation over customer
# names so each group concatenates ~60 elements at sf0.01. The plan is a
# plain two-phase hash aggregate — order-sensitive finalization happens
# in the merge, no window or global sort.
_LISTAGG_SPARK = """
SELECT c_nationkey AS nationkey,
       listagg(c_name, ';') WITHIN GROUP (ORDER BY c_name) AS names,
       listagg(DISTINCT c_mktsegment, '|')
         WITHIN GROUP (ORDER BY c_mktsegment) AS segments
FROM customer
GROUP BY c_nationkey
"""

_LISTAGG_DUCK = """
SELECT c_nationkey AS nationkey,
       string_agg(c_name, ';' ORDER BY c_name) AS names,
       string_agg(DISTINCT c_mktsegment, '|' ORDER BY c_mktsegment) AS segments
FROM customer
GROUP BY c_nationkey
"""

# Weighted median: neither engine ships it as a builtin, but the exact
# definition — smallest value whose cumulative weight reaches half the
# total — is one ordered window cumsum over INTEGER cents/units, so one
# portable spelling runs on both engines with no float until the final
# presentation division. Lower weighted median; (orderkey, linenumber)
# tiebreaks make the cumsum order total.
_WEIGHTED_MEDIAN = """
WITH t AS (
  SELECT l_returnflag AS flag,
         CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS price_c,
         CAST(ROUND(l_quantity, 0) AS BIGINT) AS wgt,
         l_orderkey, l_linenumber
  FROM lineitem
),
c AS (
  SELECT flag, price_c, wgt,
         SUM(wgt) OVER (PARTITION BY flag
                        ORDER BY price_c, l_orderkey, l_linenumber
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
         SUM(wgt) OVER (PARTITION BY flag) AS tw
  FROM t
)
SELECT flag,
       ROUND(MIN(CASE WHEN 2 * cw >= tw THEN price_c END) / CAST(100.0 AS DOUBLE), 2)
         AS w_median_price,
       CAST(MIN(tw) AS BIGINT) AS total_weight
FROM c GROUP BY flag
"""

# Two-sided 10% trimmed mean — the robust-mean sibling of the weighted
# median: rank within group (total tiebreaks), drop floor(n/10) from
# each tail, average the surviving integer cents. CAST(FLOOR(n / 10) AS BIGINT)
# spells floor portably (both engines divide as double — exact for any
# group size below 2^52 — then truncate).
_TRIMMED_MEAN = """
WITH t AS (
  SELECT l_returnflag AS flag,
         CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS c,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag
                            ORDER BY l_extendedprice, l_orderkey, l_linenumber)
           AS rn,
         COUNT(*) OVER (PARTITION BY l_returnflag) AS n
  FROM lineitem
)
SELECT flag,
       COUNT(CASE WHEN rn > CAST(FLOOR(n / 10) AS BIGINT)
                   AND rn <= n - CAST(FLOOR(n / 10) AS BIGINT) THEN 1 END) AS n_kept,
       CAST(ROUND(
         SUM(CASE WHEN rn > CAST(FLOOR(n / 10) AS BIGINT)
                   AND rn <= n - CAST(FLOOR(n / 10) AS BIGINT) THEN c END)
         / COUNT(CASE WHEN rn > CAST(FLOOR(n / 10) AS BIGINT)
                       AND rn <= n - CAST(FLOOR(n / 10) AS BIGINT) THEN 1 END)
         / 100.0, 4) AS DOUBLE) AS trimmed_mean
FROM t GROUP BY flag
"""
# Gini coefficient — the inequality measure a curation pipeline runs
# over per-source/per-segment weight distributions (is one segment
# hoarding the budget?). Closed form over ascending-sorted integer
# cents: G = 2*sum(i*x_i)/(n*sum(x)) - (n+1)/n. BOTH the sum(i*x_i)
# numerator and the n*sum(x) denominator are computed in DOUBLE (not
# BIGINT): DuckDB promotes integer SUM/products to HUGEINT while Spark
# stays int64, so either term spelled as an integer sum would silently
# diverge/overflow cross-engine around sf1000 (~2e20 per segment;
# ADVICE r7 denominator, ADVICE r8 numerator). The DOUBLE spelling is
# exact while partial sums stay under 2^53 (every i*c product is an
# integer-valued double) and beyond that carries documented ~1e-16
# relative accumulation noise, absorbed by the 6-decimal ROUND.
_GINI = """
WITH t AS (
  SELECT c_mktsegment AS seg,
         CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS c,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY c_acctbal, c_custkey) AS i,
         COUNT(*) OVER (PARTITION BY c_mktsegment) AS n
  FROM customer WHERE c_acctbal > 0
)
SELECT seg,
       CAST(MAX(n) AS BIGINT) AS n_customers,
       CAST(ROUND(2.0 * SUM(CAST(i AS DOUBLE) * c) / (CAST(MAX(n) AS DOUBLE) * SUM(c))
                  - (MAX(n) + 1.0) / MAX(n), 6) AS DOUBLE) AS gini
FROM t GROUP BY seg
"""

QUERIES = {
    "agg_statistical": sql_query(_STATS),
    "agg_hll_sketch_union": sql_query(_HLL_SKETCH),
    "agg_count_distinct": sql_query(_DISTINCT),
    "agg_collect_ordered": sql_query(_COLLECT_SPARK),
    "agg_rollup": sql_query(_ROLLUP),
    "agg_grouping_sets": sql_query(_GROUPING_SETS),
    "agg_cube": sql_query(_CUBE),
    "agg_filter_clause": sql_query(_FILTER_CLAUSE),
    "agg_bool_bit": sql_query(_BOOL_BIT),
    "agg_median": sql_query(_MEDIAN),
    "agg_weighted_median": sql_query(_WEIGHTED_MEDIAN),
    "agg_trimmed_mean": sql_query(_TRIMMED_MEAN),
    "agg_gini": sql_query(_GINI),
    "agg_min_max_by": sql_query(_MINMAX_BY),
    "agg_approximate": sql_query(_APPROX),
    "agg_approx_error_bounded": sql_query(_APPROX_BOUNDED),
    "agg_bitmap_distinct": sql_query(_BITMAP_DISTINCT),
    "agg_theta_setops": sql_query(_THETA_SETOPS),
    "agg_kll_quantiles": sql_query(_KLL_QUANTILES),
    "agg_mode_deterministic": sql_query(_MODE),
    "agg_regression": sql_query(_REGRESSION),
    "agg_string_agg": sql_query(_LISTAGG_SPARK),
}

ORACLES = {
    "agg_statistical": _STATS,
    "agg_count_distinct": _DISTINCT,
    "agg_collect_ordered": _COLLECT_DUCK,
    "agg_rollup": _ROLLUP,
    "agg_grouping_sets": _GROUPING_SETS_DUCK,
    "agg_cube": _CUBE,
    "agg_filter_clause": _FILTER_CLAUSE,
    "agg_bool_bit": _BOOL_BIT,
    "agg_median": _MEDIAN,
    "agg_weighted_median": _WEIGHTED_MEDIAN,
    "agg_trimmed_mean": _TRIMMED_MEAN,
    "agg_gini": _GINI,
    "agg_min_max_by": _MINMAX_BY,
    # agg_approximate: deliberately no oracle (approximate by design);
    # its error BOUND is checked by agg_approx_error_bounded below
    "agg_approx_error_bounded": _APPROX_BOUNDED_DUCK,
    "agg_hll_sketch_union": _HLL_SKETCH_DUCK,
    "agg_bitmap_distinct": _BITMAP_DISTINCT_DUCK,
    "agg_theta_setops": _THETA_SETOPS_DUCK,
    "agg_kll_quantiles": _KLL_QUANTILES_DUCK,
    "agg_mode_deterministic": _MODE,
    "agg_regression": _REGRESSION,
    "agg_string_agg": _LISTAGG_DUCK,
}
