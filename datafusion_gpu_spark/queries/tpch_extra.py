"""Extended TPC-H-shaped coverage (SURVEY §2.2-2.8 combinations at
higher complexity): EXISTS priority check (Q4), two-sided nation volume
(Q7), market share (Q8), profit rollup (Q9), promo share (Q14), top
supplier via view + scalar subquery (Q15), supplier count (Q16), large
volume IN-HAVING (Q18), OR-of-ANDs predicate pushdown (Q19), anti-join
with AVG subquery (Q22).

Adapted to the driver's schema: there is no partsupp table, no
l_commitdate/l_receiptdate, no c_phone — each adaptation keeps the
query's *shape* (the planner features it exercises) and swaps the
missing column for an available one. SQL strings are shared-dialect and
run unchanged on DuckDB, so each oracle is the same text (Q15 differs
only in spelling the temp view as a CTE).

Float discipline: money aggregates round(2), ratios round(4-6);
quantities are integral-valued doubles so their sums compare exactly
(HAVING thresholds carry no boundary risk).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from datafusion_gpu_spark.queries import load, sql_query

_Q4A = """
SELECT o_orderpriority AS priority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
"""

_Q7A = """
SELECT supp_nation, cust_nation, l_year, ROUND(SUM(volume), 2) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(EXTRACT(YEAR FROM l.l_shipdate) AS INT) AS l_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume
  FROM supplier s
  JOIN lineitem l ON s.s_suppkey = l.l_suppkey
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
  JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""

_Q8A = """
SELECT o_year,
       ROUND(SUM(CASE WHEN nation = 'NATION_1' THEN volume ELSE 0 END)
             / SUM(volume), 6) AS mkt_share
FROM (
  SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INT) AS o_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume,
         n2.n_name AS nation
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
  JOIN region r   ON n1.n_regionkey = r.r_regionkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
  WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
) allnations
GROUP BY o_year
"""

# Q9's profit formula (0.5 * 1-decimal price * qty) produces exact
# half-cent amounts, so rounding a double group SUM is a cross-engine
# coin flip — and Spark (BigDecimal HALF_UP) and DuckDB even disagree on
# per-row half-cent rounding. Robust pattern: rebuild each factor as an
# exact INTEGER (cents / tenths — the ROUND-to-integer sits ~1e-9 from
# the true integer, never near a boundary), do the whole profit in
# integer units of 10^-4 currency, sum exactly, divide once at the end.
_Q9A = """
SELECT nation, o_year,
       ROUND(CAST(SUM(amount_e4) AS BIGINT) / CAST(10000 AS DOUBLE), 2)
         AS sum_profit
FROM (
  SELECT n.n_name AS nation,
         CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INT) AS o_year,
         CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT)
           * (100 - CAST(ROUND(l.l_discount * 100, 0) AS BIGINT))
           - CAST(ROUND(p.p_retailprice * 10, 0) AS BIGINT)
             * CAST(l.l_quantity AS BIGINT) * 500 AS amount_e4
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN nation n   ON s.s_nationkey = n.n_nationkey
  WHERE p.p_name LIKE '%a%'
) profit
GROUP BY nation, o_year
"""

_Q14A = """
SELECT ROUND(100.00 *
         SUM(CASE WHEN p.p_type = 'PROMO'
                  THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END)
         / SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_share
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
"""

_REVENUE_VIEW = """
CREATE OR REPLACE TEMPORARY VIEW revenue0 AS
SELECT l_suppkey AS supplier_no,
       SUM(l_extendedprice * (1 - l_discount)) AS total_revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
GROUP BY l_suppkey
"""

_Q15_SELECT = """
SELECT s.s_suppkey AS suppkey, s.s_name AS name,
       ROUND(r.total_revenue, 2) AS total_revenue
FROM supplier s JOIN revenue0 r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue0)
"""


def _q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15's defining feature: a VIEW consumed twice (join + scalar
    subquery max) — the view is created through SQL DDL, as the
    reference's engine would via ctx.sql()."""
    load(spark, sf_dir)
    spark.sql(_REVENUE_VIEW)
    return spark.sql(_Q15_SELECT)


_Q15_DUCK = f"""
WITH revenue0 AS (
  SELECT l_suppkey AS supplier_no,
         SUM(l_extendedprice * (1 - l_discount)) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
{_Q15_SELECT}
"""

_Q16A = """
SELECT p.p_brand AS brand, p.p_type AS type, p.p_size AS size,
       COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#1' AND p.p_size IN (1, 5, 10, 15, 20, 25)
GROUP BY p.p_brand, p.p_type, p.p_size
"""

_Q18A = """
SELECT c.c_name AS name, c.c_custkey AS custkey, o.o_orderkey AS orderkey,
       o.o_orderdate AS orderdate, ROUND(o.o_totalprice, 2) AS totalprice,
       SUM(l.l_quantity) AS sum_qty
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING SUM(l_quantity) > 200)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
ORDER BY totalprice DESC, orderkey
LIMIT 20
"""

_Q19A = """
SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity >= 1 AND l.l_quantity <= 20)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
       AND l.l_quantity >= 10 AND l.l_quantity <= 30)
   OR (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 20 AND 50
       AND l.l_quantity >= 20 AND l.l_quantity <= 40)
"""

_Q22A = """
SELECT c.c_nationkey AS nationkey, COUNT(*) AS numcust,
       ROUND(SUM(c.c_acctbal), 2) AS totacctbal
FROM customer c
WHERE c.c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
                     WHERE c2.c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY c.c_nationkey
"""

QUERIES = {
    "tpch_q4_priority_exists": sql_query(_Q4A),
    "tpch_q7_volume_shipping": sql_query(_Q7A),
    "tpch_q8_market_share": sql_query(_Q8A),
    "tpch_q9_profit_rollup": sql_query(_Q9A),
    "tpch_q14_promo_share": sql_query(_Q14A),
    "tpch_q15_top_supplier_view": _q15,
    "tpch_q16_supplier_cnt": sql_query(_Q16A),
    "tpch_q18_large_volume": sql_query(_Q18A),
    "tpch_q19_disjunctive_pred": sql_query(_Q19A),
    "tpch_q22_inactive_customers": sql_query(_Q22A),
}

ORACLES = {
    "tpch_q4_priority_exists": _Q4A,
    "tpch_q7_volume_shipping": _Q7A,
    "tpch_q8_market_share": _Q8A,
    "tpch_q9_profit_rollup": _Q9A,
    "tpch_q14_promo_share": _Q14A,
    "tpch_q15_top_supplier_view": _Q15_DUCK,
    "tpch_q16_supplier_cnt": _Q16A,
    "tpch_q18_large_volume": _Q18A,
    "tpch_q19_disjunctive_pred": _Q19A,
    "tpch_q22_inactive_customers": _Q22A,
}
