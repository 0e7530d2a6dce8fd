"""Window-function surface (SURVEY §2.5).

Every ORDER BY inside an OVER clause carries a unique tiebreaker
(orderkey / linenumber) so ranking and frame results are deterministic on
both engines. Running sums are rounded: same order => same additions, but
the rounding guards against segment-tree vs streaming accumulation
differences.
"""

from __future__ import annotations

from datafusion_gpu_spark.queries import sql_query

_RANKING = """
SELECT flag, orderkey, linenumber, rn, rk, drk, nt
FROM (
  SELECT l_returnflag AS flag, l_orderkey AS orderkey, l_linenumber AS linenumber,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag
                            ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn,
         RANK()       OVER (PARTITION BY l_returnflag
                            ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rk,
         DENSE_RANK() OVER (PARTITION BY l_returnflag
                            ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS drk,
         NTILE(4)     OVER (PARTITION BY l_returnflag
                            ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS nt
  FROM lineitem
) t
WHERE rn <= 5
"""

_ANALYTIC = """
SELECT o_custkey AS custkey, o_orderkey AS orderkey,
       LAG(o_orderkey)  OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate, o_orderkey) AS prev_order,
       LEAD(o_orderkey) OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate, o_orderkey) AS next_order
FROM orders
"""

_FRAME_ROWS = """
SELECT o_custkey AS custkey, o_orderkey AS orderkey,
       ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             2) AS running_spend
FROM orders
"""

_FRAME_RANGE = """
SELECT flag, orderkey, linenumber, qty_win
FROM (
  SELECT l_returnflag AS flag, l_orderkey AS orderkey, l_linenumber AS linenumber,
         SUM(l_quantity) OVER (PARTITION BY l_returnflag
                               ORDER BY l_orderkey
                               RANGE BETWEEN 100 PRECEDING AND CURRENT ROW) AS qty_win
  FROM lineitem
) t
WHERE orderkey < 1000
"""

_FIRST_LAST = """
SELECT o_custkey AS custkey, o_orderkey AS orderkey,
       FIRST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey) AS first_order,
       LAST_VALUE(o_orderkey)  OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND UNBOUNDED FOLLOWING) AS last_order,
       NTH_VALUE(o_orderkey, 2) OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate, o_orderkey
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND UNBOUNDED FOLLOWING) AS second_order
FROM orders
"""

_CUME = """
SELECT o_orderkey AS orderkey,
       ROUND(PERCENT_RANK() OVER (ORDER BY o_totalprice, o_orderkey), 8) AS pr,
       ROUND(CUME_DIST()    OVER (ORDER BY o_totalprice, o_orderkey), 8) AS cd
FROM orders
WHERE o_orderkey < 500
"""

# DuckDB's ranking fns return BIGINT where Spark returns INT — pin the
# oracle to INT so the schemas hash identically.
_RANKING_DUCK = (
    _RANKING.replace("rn, rk, drk, nt", "CAST(rn AS INT) AS rn, CAST(rk AS INT) AS rk, "
                     "CAST(drk AS INT) AS drk, CAST(nt AS INT) AS nt")
)

# GROUPS frame (SURVEY §2.5 gap): Spark has no GROUPS BETWEEN, but
# dense_rank numbers the peer groups and an integer RANGE frame over that
# rank is exactly "N peer groups preceding .. current" — so the gap is
# EMULATED (the rewrite dialect.py's error message prescribes). The
# bundled DuckDB lacks GROUPS mode too ("not implemented yet"), so the
# oracle replays the same rewrite, checking the emulation cross-engine.
_GROUPS_EMULATED_SPARK = """
WITH g AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
         DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS grp
  FROM orders
)
SELECT o_custkey AS custkey, o_orderkey AS orderkey,
       ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY grp
             RANGE BETWEEN 1 PRECEDING AND CURRENT ROW), 2) AS grp_sum
FROM g
"""

_GROUPS_NATIVE_DUCK = _GROUPS_EMULATED_SPARK

# EXCLUDE CURRENT ROW (SURVEY §2.5 frame-exclusion gap): Spark has no
# EXCLUDE clause, but over a ROWS frame that contains the current row the
# excluded aggregate is exact frame arithmetic — sum minus the current
# value over count minus one (NULL when the exclusion empties the frame,
# matching the standard). The oracle runs DuckDB's NATIVE EXCLUDE
# CURRENT ROW, so the emulation is graded against the real semantics.
# Money flows through exact integer cents (the q9 discipline): a float
# frame-sum minus a member lands half-cent averages 1 ulp apart across
# engines and flips ROUND at the .005 boundary (observed: 211/15000
# rows off by exactly 0.01) — identical integer sums divide to
# bit-identical doubles instead, so no rounding is needed at all.
_EXCLUDE_EMULATED_SPARK = """
SELECT custkey, orderkey,
       CASE WHEN cnt > 1
            THEN (s - cents) / (cnt - 1) / 100.0 END AS peer_avg
FROM (
  SELECT o_custkey AS custkey, o_orderkey AS orderkey, cents,
         SUM(cents) OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS s,
         COUNT(*) OVER (PARTITION BY o_custkey
                        ORDER BY o_orderdate, o_orderkey
                        ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS cnt
  FROM (SELECT *, CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
        FROM orders) c
) t
"""

_EXCLUDE_NATIVE_DUCK = """
SELECT o_custkey AS custkey, o_orderkey AS orderkey,
       SUM(cents) OVER w / COUNT(*) OVER w / 100.0 AS peer_avg
FROM (SELECT *, CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
      FROM orders) c
WINDOW w AS (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 5 PRECEDING AND CURRENT ROW
             EXCLUDE CURRENT ROW)
"""

# IGNORE NULLS (SURVEY §2.5 — the null-treatment clause of the window
# value functions): a sparse observation (here: only every 7th order
# carries a price sample) is carried forward per customer, the canonical
# last-observation-carried-forward shape every gap-filling pipeline uses
# (events.gap_fill is the DataFrame-API spelling of the same idiom).
# Spark puts IGNORE NULLS after the call, DuckDB inside the parens —
# same standard semantics, two concrete syntaxes, one hash compare.
_IGNORE_NULLS_SPARK = """
SELECT o_custkey AS custkey, o_orderkey AS orderkey,
       ROUND(LAST_VALUE(CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice END)
             IGNORE NULLS OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey), 2) AS carried,
       ROUND(LAG(CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice END)
             IGNORE NULLS OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey), 2) AS prev_sample
FROM orders
"""

_IGNORE_NULLS_DUCK = """
SELECT o_custkey AS custkey, o_orderkey AS orderkey,
       ROUND(LAST_VALUE(CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice END
             IGNORE NULLS) OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey), 2) AS carried,
       ROUND(LAG(CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice END
             IGNORE NULLS) OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey), 2) AS prev_sample
FROM orders
"""

# QUALIFY (SURVEY §2.2 dialect extension): Spark has no QUALIFY clause;
# dialect.rewrite_qualify turns it into the windowed-subquery spelling.
# The oracle hands DuckDB the ORIGINAL statement — its native QUALIFY
# grades the rewrite. Predicate references output aliases only (the
# rewrite's documented contract).
_QUALIFY_TOP3 = """
SELECT o_custkey AS custkey, o_orderkey AS orderkey, o_totalprice AS price
FROM orders
QUALIFY ROW_NUMBER() OVER (PARTITION BY custkey
                           ORDER BY price DESC, orderkey) <= 3
"""


def _qualify_query(spark, sf_dir):
    from datafusion_gpu_spark.dialect import rewrite_qualify
    from datafusion_gpu_spark.queries import load

    load(spark, sf_dir)
    return spark.sql(rewrite_qualify(_QUALIFY_TOP3)).drop("__qualify__")


# Running count-distinct per key: the exact streaming-style "how many
# distinct event types has this user produced so far" — not a native
# window aggregate in either engine (COUNT(DISTINCT ...) OVER is
# unsupported), but the first-occurrence-flag + cumulative-sum rewrite
# is exact and portable: one rank window on (key, value), one cumsum
# window on the key.
_RUNNING_DISTINCT = """
WITH t AS (
  SELECT user_id, event_id, ts, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS occ
  FROM events
)
SELECT user_id, event_id,
       CAST(SUM(CASE WHEN occ = 1 THEN 1 ELSE 0 END)
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS distinct_types_so_far
FROM t
"""

# Rolling median — the robust sibling of the EWMA smoother. Spark
# forbids frames on median(), so the Spark spelling materializes the
# frame with collect_list + array_sort and picks/interpolates the
# middle; the oracle uses DuckDB's NATIVE framed MEDIAN — two
# independent implementations, which is the strongest oracle form.
# Cents-integer inputs make every middle exact; c/100 has two decimals
# so no 6-decimal rounding tie is reachable.
_ROLLING_MEDIAN_SPARK = """
WITH t AS (
  SELECT user_id, event_id, ts,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS c
  FROM events WHERE value IS NOT NULL
),
f AS (
  SELECT user_id, event_id,
         array_sort(collect_list(c) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS arr
  FROM t
)
SELECT user_id, event_id,
       CAST(ROUND(CASE WHEN size(arr) % 2 = 1
              THEN CAST(element_at(arr, CAST((size(arr) + 1) DIV 2 AS INT)) AS DOUBLE)
              ELSE (element_at(arr, CAST(size(arr) DIV 2 AS INT))
                    + element_at(arr, CAST(size(arr) DIV 2 + 1 AS INT))) / 2.0
            END / 100.0, 6) AS DOUBLE) AS rolling_med
FROM f
"""

_ROLLING_MEDIAN_DUCK = """
WITH t AS (
  SELECT user_id, event_id, ts,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS c
  FROM events WHERE value IS NOT NULL
)
SELECT user_id, event_id,
       CAST(ROUND(MEDIAN(c) OVER (
              PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) / 100.0, 6)
            AS DOUBLE) AS rolling_med
FROM t
"""

QUERIES = {
    "window_ranking": sql_query(_RANKING),
    "window_lag_lead": sql_query(_ANALYTIC),
    "window_rows_frame": sql_query(_FRAME_ROWS),
    "window_range_frame": sql_query(_FRAME_RANGE),
    "window_first_last_nth": sql_query(_FIRST_LAST),
    "window_percent_rank": sql_query(_CUME),
    "window_groups_frame_emulated": sql_query(_GROUPS_EMULATED_SPARK),
    "window_exclude_current_emulated": sql_query(_EXCLUDE_EMULATED_SPARK),
    "window_qualify_rewrite": _qualify_query,
    "window_ignore_nulls": sql_query(_IGNORE_NULLS_SPARK),
    "window_running_distinct": sql_query(_RUNNING_DISTINCT),
    "window_rolling_median": sql_query(_ROLLING_MEDIAN_SPARK),
}

ORACLES = {
    "window_ranking": _RANKING_DUCK,
    "window_lag_lead": _ANALYTIC,
    "window_rows_frame": _FRAME_ROWS,
    "window_range_frame": _FRAME_RANGE,
    "window_first_last_nth": _FIRST_LAST,
    "window_percent_rank": _CUME,
    "window_groups_frame_emulated": _GROUPS_NATIVE_DUCK,
    "window_exclude_current_emulated": _EXCLUDE_NATIVE_DUCK,
    "window_qualify_rewrite": _QUALIFY_TOP3,
    "window_ignore_nulls": _IGNORE_NULLS_DUCK,
    "window_running_distinct": _RUNNING_DISTINCT,
    "window_rolling_median": _ROLLING_MEDIAN_DUCK,
}
