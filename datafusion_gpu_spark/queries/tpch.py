"""TPC-H-shaped headline queries (SURVEY §2.1-2.4, §2.6).

These exercise the scan -> filter -> multi-way join -> hash aggregate ->
top-k pipeline end to end. Scale design notes per query:

- filters are literal predicates on scan columns -> parquet pushdown +
  row-group pruning for free;
- fixed-cardinality dims (region/nation) carry an explicit broadcast
  hint from register_tables; sf-scaled tables (customer/supplier/part/
  orders) are left to AQE + autoBroadcastJoinThreshold, which sees their
  true size at runtime — so the plan stays correct at any scale factor;
- aggregates are built-in JVM sums -> two-phase partial/final, map-side
  combine, no Python boundary;
- top-k (ORDER BY + LIMIT) plans as TakeOrderedAndProject (bounded heap),
  never a global sort.

Money sums are ROUNDed to 2 decimals on both Spark and oracle sides: the
double error of a 10^5-term sum at 10^8 magnitude is ~1e-8, far below the
rounding quantum, so the hash compare is stable while the physical
accumulation order stays free.
"""

from __future__ import annotations

from datafusion_gpu_spark.queries import sql_query

# Shared-dialect SQL: strings below run unchanged on Spark AND DuckDB.

_Q1 = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2)                                        AS sum_qty,
       ROUND(SUM(l_extendedprice), 2)                                   AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
       ROUND(AVG(l_quantity), 6)                                        AS avg_qty,
       ROUND(AVG(l_extendedprice), 6)                                   AS avg_price,
       ROUND(AVG(l_discount), 6)                                        AS avg_disc,
       COUNT(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

_Q3 = """
SELECT l.l_orderkey                                        AS orderkey,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       o.o_orderdate                                       AS orderdate
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l.l_shipdate  > TIMESTAMP '1996-03-15 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, orderkey
LIMIT 10
"""

_Q5 = """
SELECT n.n_name                                            AS nation,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
GROUP BY n.n_name
ORDER BY revenue DESC, nation
"""

_Q6 = """
SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""

_Q10 = """
SELECT c.c_custkey                                         AS custkey,
       c.c_name                                            AS name,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       n.n_name                                            AS nation
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, custkey
LIMIT 20
"""

QUERIES = {
    "tpch_q1_pricing_summary": sql_query(_Q1),
    "tpch_q3_shipping_priority": sql_query(_Q3),
    "tpch_q5_local_supplier": sql_query(_Q5),
    "tpch_q6_forecast_revenue": sql_query(_Q6),
    "tpch_q10_returned_items": sql_query(_Q10),
}

ORACLES = {
    "tpch_q1_pricing_summary": _Q1,
    "tpch_q3_shipping_priority": _Q3,
    "tpch_q5_local_supplier": _Q5,
    "tpch_q6_forecast_revenue": _Q6,
    "tpch_q10_returned_items": _Q10,
}
