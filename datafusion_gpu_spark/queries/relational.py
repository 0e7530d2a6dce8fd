"""Join variants, set ops, subqueries, CTE/VALUES, pivot, DISTINCT ON
(SURVEY §2.3, §2.6, §2.8, §2.2).

Scale notes: the outer/semi/anti joins key on the natural join columns so
they shuffle-hash partition cleanly (or broadcast when one side is a dim);
the deliberately non-equi band join uses two bounded tables so it plans as
a broadcast nested-loop — the only join shape where that is acceptable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_gpu_spark.queries import load, sql_query

# -- shared-dialect strings ------------------------------------------------

_LEFT_OUTER = """
SELECT c.c_custkey AS custkey,
       COUNT(o.o_orderkey) AS n_orders,
       ROUND(COALESCE(SUM(o.o_totalprice), 0.0), 2) AS total_spend
FROM customer c
LEFT JOIN orders o ON c.c_custkey = o.o_custkey
GROUP BY c.c_custkey
"""

_FULL_OUTER = """
SELECT COALESCE(s.nk, c.nk) AS nationkey,
       COALESCE(s.n_suppliers, 0) AS n_suppliers,
       COALESCE(c.n_customers, 0) AS n_customers
FROM (SELECT s_nationkey AS nk, COUNT(*) AS n_suppliers FROM supplier GROUP BY s_nationkey) s
FULL JOIN (SELECT c_nationkey AS nk, COUNT(*) AS n_customers FROM customer GROUP BY c_nationkey) c
  ON s.nk = c.nk
"""

_SEMI = """
SELECT c.c_custkey AS custkey, c.c_mktsegment AS segment
FROM customer c
WHERE EXISTS (SELECT 1 FROM events e
              WHERE e.user_id = c.c_custkey AND e.event_type = 'purchase')
"""

_ANTI = """
SELECT c.c_custkey AS custkey, c.c_mktsegment AS segment
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM events e
                  WHERE e.user_id = c.c_custkey AND e.event_type = 'error')
"""

_CROSS = """
SELECT r1.r_name AS region_a, r2.r_name AS region_b
FROM region r1
CROSS JOIN region r2
WHERE r1.r_name < r2.r_name
"""

_NON_EQUI = """
SELECT s.s_suppkey AS suppkey, COUNT(*) AS n_close
FROM supplier s
JOIN customer c ON c.c_acctbal BETWEEN s.s_acctbal - 10 AND s.s_acctbal + 10
GROUP BY s.s_suppkey
"""

_SET_UNION = """
SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
UNION
SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'
"""

_SET_INTERSECT = """
SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
INTERSECT
SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'
"""

_SET_EXCEPT = """
SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
EXCEPT
SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'
"""

# Correlated LATERAL derived table (top-2 orders per customer) — the
# per-row-subquery spelling of DISTINCT ON/top-k-per-group; Catalyst
# decorrelates it into a ranked window join rather than a per-row probe.
_LATERAL = """
SELECT c.c_custkey AS custkey, t.orderkey, t.totalprice
FROM customer c, LATERAL (
  SELECT o_orderkey AS orderkey, ROUND(o_totalprice, 2) AS totalprice
  FROM orders o WHERE o.o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
WHERE c.c_custkey < 100
"""

# GROUP BY ALL: group on every non-aggregate select item.
_GROUP_BY_ALL = """
SELECT o_orderstatus AS status, o_orderpriority AS priority,
       COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total
FROM orders GROUP BY ALL
"""

# Table-valued function in FROM: the distributed row generator (DuckDB
# names the produced column after the function; alias both to id).
_RANGE_TVF_SPARK = """
SELECT id, id * id AS sq FROM range(0, 1000, 7)
"""

_RANGE_TVF_DUCK = """
SELECT range AS id, range * range AS sq FROM range(0, 1000, 7)
"""

# ALL variants keep multiplicities (bag semantics): an order key URGENT
# n times and BUILDING m times appears max(m-n, 0) / min(m, n) times.
_SET_EXCEPT_ALL = """
SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'
EXCEPT ALL
SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
"""

_SET_INTERSECT_ALL = """
SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'
INTERSECT ALL
SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
"""

# UNPIVOT: wide metrics -> (key, metric, val) long form. Spark's UNPIVOT
# clause; the oracle spells the same relation as a UNION ALL (DuckDB's
# UNPIVOT syntax differs, and the rewrite IS the semantics).
_UNPIVOT_SPARK = """
SELECT custkey, metric, val FROM (
  SELECT c_custkey AS custkey, c_acctbal AS acctbal,
         CAST(c_nationkey AS DOUBLE) AS nkey
  FROM customer
) UNPIVOT (val FOR metric IN (acctbal, nkey))
"""

_UNPIVOT_DUCK = """
SELECT c_custkey AS custkey, 'acctbal' AS metric, c_acctbal AS val FROM customer
UNION ALL
SELECT c_custkey AS custkey, 'nkey' AS metric, CAST(c_nationkey AS DOUBLE) AS val
FROM customer
"""

# DISTINCT ON (latest order per customer) via the row_number()==1 rewrite —
# SURVEY §2.6's mapping for DataFusion's DISTINCT ON extension.
_DISTINCT_ON = """
SELECT custkey, orderkey, ROUND(totalprice, 2) AS totalprice
FROM (
  SELECT o_custkey AS custkey, o_orderkey AS orderkey, o_totalprice AS totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders
) ranked
WHERE rn = 1
"""

_SUBQ_SCALAR = """
SELECT o_orderpriority AS priority, COUNT(*) AS n
FROM orders
WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
GROUP BY o_orderpriority
"""

_SUBQ_CORRELATED = """
SELECT o.o_orderstatus AS status, COUNT(*) AS n
FROM orders o
WHERE o.o_totalprice > (SELECT AVG(o2.o_totalprice)
                        FROM orders o2
                        WHERE o2.o_custkey = o.o_custkey)
GROUP BY o.o_orderstatus
"""

_SUBQ_IN = """
SELECT o_orderpriority AS priority, COUNT(*) AS n
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
GROUP BY o_orderpriority
"""

# -- dialect-split queries -------------------------------------------------

_CTE_VALUES_SPARK = """
WITH seg AS (
  SELECT * FROM VALUES ('BUILDING', 1), ('AUTOMOBILE', 2), ('MACHINERY', 3)
  AS t(seg_name, seg_code)
)
SELECT s.seg_code AS seg_code, COUNT(*) AS n_customers
FROM customer c JOIN seg s ON c.c_mktsegment = s.seg_name
GROUP BY s.seg_code
"""

_CTE_VALUES_DUCK = """
WITH seg(seg_name, seg_code) AS (
  VALUES ('BUILDING', 1), ('AUTOMOBILE', 2), ('MACHINERY', 3)
)
SELECT s.seg_code AS seg_code, COUNT(*) AS n_customers
FROM customer c JOIN seg s ON c.c_mktsegment = s.seg_name
GROUP BY s.seg_code
"""


def _pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders per (priority, status) — DataFrame .pivot() API surface."""
    load(spark, sf_dir)
    orders = spark.table("orders")
    df = (
        orders.groupBy(F.col("o_orderpriority").alias("priority"))
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
    )
    # pivot leaves empty cells NULL; the oracle's CASE-counts produce 0
    return df.select(
        "priority",
        F.coalesce(F.col("O"), F.lit(0)).alias("n_open"),
        F.coalesce(F.col("F"), F.lit(0)).alias("n_filled"),
        F.coalesce(F.col("P"), F.lit(0)).alias("n_pending"),
    )


_PIVOT_DUCK = """
SELECT o_orderpriority AS priority,
       COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_open,
       COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_filled,
       COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_pending
FROM orders
GROUP BY o_orderpriority
"""


def _join_semi_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same semantics as _SEMI, via the DataFrame left_semi join type."""
    load(spark, sf_dir)
    customer = spark.table("customer")
    purchases = spark.table("events").where(F.col("event_type") == "purchase")
    return customer.join(
        purchases, customer.c_custkey == purchases.user_id, "left_semi"
    ).select(
        F.col("c_custkey").alias("custkey"), F.col("c_mktsegment").alias("segment")
    )


_LIMIT_OFFSET = """
SELECT o_orderkey AS orderkey, ROUND(o_totalprice, 2) AS totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20 OFFSET 10
"""

# FETCH FIRST n ROWS WITH TIES (SURVEY §2.6 gap): neither Spark nor the
# bundled DuckDB 1.0 parses WITH TIES, so both sides run the standard
# rewrite — the n-th row's sort key becomes a scalar threshold and the
# result is every row at-or-under it. The threshold subquery is a global
# sort-LIMIT (TakeOrderedAndProject: per-partition top-n, single small
# merge), NOT an all-rows window rank — a rank() over an unpartitioned
# ORDER BY would serialize the whole table through one task at scale,
# while this shape broadcasts one scalar and keeps the outer pass a
# pushed-down filter scan. When the table has <= n rows the OFFSET
# subquery is empty (NULL threshold) — true WITH TIES returns ALL rows
# there, so the COALESCE falls back to MAX(o_orderdate) to match that
# semantic instead of WHERE NULL's empty result.
_WITH_TIES = """
SELECT o_orderkey AS orderkey, o_orderdate AS orderdate
FROM orders
WHERE o_orderdate <= COALESCE((SELECT o_orderdate
                               FROM orders
                               ORDER BY o_orderdate
                               LIMIT 1 OFFSET 24),
                              (SELECT MAX(o_orderdate) FROM orders))
"""

# RIGHT OUTER join exercised on its own (not as the left-outer mirror):
# unmatched right rows must survive with NULL left columns.
_RIGHT_OUTER_SPARK = """
SELECT c.c_custkey AS custkey, COUNT(o.o_orderkey) AS n_orders
FROM (SELECT * FROM orders WHERE o_totalprice > 200000) o
RIGHT OUTER JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey
"""

# Sort-merge strategy pinned via hint (SURVEY §2.3 row): Spark honors
# /*+ MERGE */ and plans SortMergeJoin even under the broadcast threshold;
# DuckDB reads the hint as a plain comment, so the same text is the oracle.
_SMJ_HINT = """
SELECT /*+ MERGE(o) */ c.c_mktsegment AS segment,
       COUNT(o.o_orderkey) AS n_orders,
       ROUND(SUM(o.o_totalprice), 2) AS total
FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
GROUP BY c.c_mktsegment
"""


def _join_band_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The band join |c_acctbal - s_acctbal| <= 10 rewritten as an
    EQUALITY join: customers land in one width-10 bucket, suppliers
    probe their up-to-3 overlapping buckets (explode(sequence)), the
    bucket key hash-joins, and the exact band predicate filters the
    residue. Each qualifying pair matches in exactly one bucket (the
    customer's), so no dedup step is needed.

    This is the 100 TB spelling of a range join: the plain non-equi
    version (join_non_equi_band) can only plan as a broadcast
    nested-loop — O(|S| x |C|) compare work and a full broadcast — while
    this one is a keyed hash join whose compare work is bounded by the
    band selectivity. Same oracle as join_non_equi_band: the rewrite
    must be result-identical.
    """
    load(spark, sf_dir)
    w = 10
    c = spark.table("customer").select(
        "c_acctbal", F.floor(F.col("c_acctbal") / w).cast("long").alias("bkt")
    )
    s = spark.table("supplier").select(
        "s_suppkey",
        "s_acctbal",
        F.explode(
            F.sequence(
                F.floor((F.col("s_acctbal") - w) / w).cast("long"),
                F.floor((F.col("s_acctbal") + w) / w).cast("long"),
            )
        ).alias("bkt"),
    )
    return (
        s.join(c, "bkt")
        .where(
            (F.col("c_acctbal") >= F.col("s_acctbal") - w)
            & (F.col("c_acctbal") <= F.col("s_acctbal") + w)
        )
        .groupBy(F.col("s_suppkey").alias("suppkey"))
        .agg(F.count(F.lit(1)).alias("n_close"))
    )


def _ddl_create_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DDL surface (SURVEY §2.1 row 10): CREATE OR REPLACE TEMPORARY VIEW
    through SQL, then query it — the reference reaches DDL through the
    same ctx.sql() passthrough (src/main.rs:54)."""
    load(spark, sf_dir)
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY VIEW big_spenders AS
        SELECT o_custkey, SUM(o_totalprice) AS spent
        FROM orders GROUP BY o_custkey HAVING SUM(o_totalprice) > 400000
        """
    )
    return spark.sql(
        """
        SELECT c.c_mktsegment AS segment, COUNT(*) AS n,
               ROUND(SUM(b.spent), 2) AS total_spent
        FROM big_spenders b JOIN customer c ON b.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment
        """
    )


_DDL_VIEW_DUCK = """
WITH big_spenders AS (
  SELECT o_custkey, SUM(o_totalprice) AS spent
  FROM orders GROUP BY o_custkey HAVING SUM(o_totalprice) > 400000
)
SELECT c.c_mktsegment AS segment, COUNT(*) AS n,
       ROUND(SUM(b.spent), 2) AS total_spent
FROM big_spenders b JOIN customer c ON b.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
"""

# Recursive CTE — SURVEY §2.2 assumed this was a Spark gap; Spark >= 4.0
# supports WITH RECURSIVE natively, so it is a checked query, not a gap.
# Identical text runs on DuckDB.
_CTE_RECURSIVE = """
WITH RECURSIVE ladder(n) AS (
  SELECT 1
  UNION ALL
  SELECT n + 1 FROM ladder WHERE n < 25
)
SELECT l.n AS nation_slot, COUNT(c.c_custkey) AS n_customers
FROM ladder l LEFT JOIN customer c ON c.c_nationkey = l.n - 1
GROUP BY l.n
"""

# EXPLAIN surface demo (SURVEY §2.2 row 18): output is engine-specific
# plan text, so this is a rows-only entry — the driver checks it runs and
# yields a stable one-row result.
_EXPLAIN = """
EXPLAIN FORMATTED
SELECT n.n_name, COUNT(*) AS n
FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY n.n_name
"""

QUERIES = {
    "join_left_outer": sql_query(_LEFT_OUTER),
    "join_full_outer": sql_query(_FULL_OUTER),
    "join_semi_exists": sql_query(_SEMI),
    "join_semi_api": _join_semi_api,
    "join_anti_not_exists": sql_query(_ANTI),
    "join_cross": sql_query(_CROSS),
    "join_non_equi_band": sql_query(_NON_EQUI),
    "join_band_bucketed": _join_band_bucketed,
    "set_union": sql_query(_SET_UNION),
    "set_intersect": sql_query(_SET_INTERSECT),
    "set_except": sql_query(_SET_EXCEPT),
    "set_except_all": sql_query(_SET_EXCEPT_ALL),
    "set_intersect_all": sql_query(_SET_INTERSECT_ALL),
    "unpivot_customer_metrics": sql_query(_UNPIVOT_SPARK),
    "table_function_range": sql_query(_RANGE_TVF_SPARK),
    "join_lateral_topk": sql_query(_LATERAL),
    "agg_group_by_all": sql_query(_GROUP_BY_ALL),
    "distinct_on_latest_order": sql_query(_DISTINCT_ON),
    "subquery_scalar": sql_query(_SUBQ_SCALAR),
    "subquery_correlated": sql_query(_SUBQ_CORRELATED),
    "subquery_in": sql_query(_SUBQ_IN),
    "join_right_outer": sql_query(_RIGHT_OUTER_SPARK),
    "join_sort_merge_hint": sql_query(_SMJ_HINT),
    "ddl_create_view": _ddl_create_view,
    "cte_values_join": sql_query(_CTE_VALUES_SPARK),
    "cte_recursive": sql_query(_CTE_RECURSIVE),
    "explain_plan": sql_query(_EXPLAIN),
    "pivot_orders": _pivot,
    "sort_limit_offset": sql_query(_LIMIT_OFFSET),
    "sort_limit_with_ties": sql_query(_WITH_TIES),
}

ORACLES = {
    "join_left_outer": _LEFT_OUTER,
    "join_full_outer": _FULL_OUTER,
    "join_semi_exists": _SEMI,
    "join_semi_api": _SEMI,
    "join_anti_not_exists": _ANTI,
    "join_cross": _CROSS,
    "join_non_equi_band": _NON_EQUI,
    "join_band_bucketed": _NON_EQUI,
    "set_union": _SET_UNION,
    "set_intersect": _SET_INTERSECT,
    "set_except": _SET_EXCEPT,
    "set_except_all": _SET_EXCEPT_ALL,
    "set_intersect_all": _SET_INTERSECT_ALL,
    "unpivot_customer_metrics": _UNPIVOT_DUCK,
    "table_function_range": _RANGE_TVF_DUCK,
    "join_lateral_topk": _LATERAL,
    "agg_group_by_all": _GROUP_BY_ALL,
    "distinct_on_latest_order": _DISTINCT_ON,
    "subquery_scalar": _SUBQ_SCALAR,
    "subquery_correlated": _SUBQ_CORRELATED,
    "subquery_in": _SUBQ_IN,
    "join_right_outer": _RIGHT_OUTER_SPARK,
    "join_sort_merge_hint": _SMJ_HINT,
    "ddl_create_view": _DDL_VIEW_DUCK,
    "cte_values_join": _CTE_VALUES_DUCK,
    "cte_recursive": _CTE_RECURSIVE,
    # explain_plan: deliberately no oracle (plan text is engine-specific)
    "pivot_orders": _PIVOT_DUCK,
    "sort_limit_offset": _LIMIT_OFFSET,
    "sort_limit_with_ties": _WITH_TIES,
}
