"""The reference's first-party surface: custom vectorized f32 sums
(SURVEY §2.4a, /root/reference/src/cudarc_sum_udaf.rs + cubecl_sum_udaf.rs).

Oracle construction: the UDF coerces input to float32 (cudarc rs:66-72),
accumulates in float64, and returns float32 (rs:45-47). DuckDB's
``CAST(SUM(CAST(x AS REAL)) AS REAL)`` does the identical thing (DuckDB
sums REAL in double), and the final f32 rounding quashes the sub-1e-15
accumulation-order noise — so the compare is hash-exact despite floats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_gpu_spark.aggregates import (
    sum_arrow_cpu,
    sum_f32_col,
    sum_f32_partial_final,
)
from datafusion_gpu_spark.queries import load, sql_query


def _grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference-named custom sum, production spelling: the NumPy kernel
    computes per-partition partials (map-side combine) and the JVM merges
    them — the shuffle carries one row per (flag, partition), not every
    lineitem row. Same result semantics as the grouped-agg pandas UDF
    (see ``custom_sum_f32_unfused`` for that single-shot spelling)."""
    load(spark, sf_dir)
    return sum_f32_partial_final(
        spark.table("lineitem").select(F.col("l_returnflag").alias("flag"), "l_quantity"),
        "l_quantity",
        "flag",
        alias="sum_qty_f32",
    )


_GROUPED_DUCK = """
SELECT l_returnflag AS flag,
       CAST(SUM(CAST(l_quantity AS REAL)) AS REAL) AS sum_qty_f32
FROM lineitem
GROUP BY l_returnflag
"""

# the single-shot grouped-agg pandas UDF: whole groups ship to one
# Python worker — the reference's own limitation (no GroupsAccumulator,
# cubecl rs:81-83), kept as an explicitly named demo
_UNFUSED = """
SELECT l_returnflag AS flag, sum_arrow_unfused(l_quantity) AS sum_qty_f32
FROM lineitem
GROUP BY l_returnflag
"""

_GLOBAL = """
SELECT sum_arrow_cpu(l_discount) AS sum_disc_f32 FROM lineitem
"""

_GLOBAL_DUCK = """
SELECT CAST(SUM(CAST(l_discount AS REAL)) AS REAL) AS sum_disc_f32 FROM lineitem
"""


def _scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB spelling: JVM two-phase partial/final f32 sum — what the
    reference could not do (no GroupsAccumulator, cubecl rs:81-83)."""
    load(spark, sf_dir)
    return (
        spark.table("lineitem")
        .groupBy(F.col("l_linestatus").alias("status"))
        .agg(sum_f32_col("l_quantity").alias("sum_qty_f32"))
    )


_SCALABLE_DUCK = """
SELECT l_linestatus AS status,
       CAST(SUM(CAST(l_quantity AS REAL)) AS REAL) AS sum_qty_f32
FROM lineitem
GROUP BY l_linestatus
"""


def _udaf_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame-API invocation of the pandas UDAF (vs SQL-name path)."""
    load(spark, sf_dir)
    return (
        spark.table("lineitem")
        .groupBy(F.col("l_returnflag").alias("flag"))
        .agg(sum_arrow_cpu(F.col("l_tax")).alias("sum_tax_f32"))
    )


_UDAF_API_DUCK = """
SELECT l_returnflag AS flag,
       CAST(SUM(CAST(l_tax AS REAL)) AS REAL) AS sum_tax_f32
FROM lineitem
GROUP BY l_returnflag
"""

# the reference's README spelling (README.md:71-75), as typed at the SQL
# front door: run_sql rewrites the reference-named call into the JVM
# two-phase CAST(SUM(CAST .. AS FLOAT)) spelling (dialect.py
# rewrite_reference_sums) — identical f32 result semantics, no Python
# boundary, map-side combine. Plan-asserted in tests/test_plans.py.
_SQL_REF_NAMED = """
SELECT l_returnflag AS flag, sum_cudarc(l_quantity) AS sum_qty_f32
FROM lineitem
GROUP BY l_returnflag
"""


def _sql_rewritten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What the REPL executes for a reference-named sum: the scalable
    rewrite, not the single-shot UDAF."""
    load(spark, sf_dir)
    from datafusion_gpu_spark.dialect import rewrite_reference_sums

    rewritten = rewrite_reference_sums(_SQL_REF_NAMED)
    assert rewritten is not None  # the statement names sum_cudarc
    return spark.sql(rewritten)


QUERIES = {
    "custom_sum_f32_grouped": _grouped,
    "custom_sum_f32_sql_rewritten": _sql_rewritten,
    "custom_sum_f32_unfused": sql_query(_UNFUSED),
    "custom_sum_f32_global": sql_query(_GLOBAL),
    "custom_sum_f32_scalable": _scalable,
    "custom_sum_f32_dataframe_api": _udaf_api,
}

ORACLES = {
    "custom_sum_f32_grouped": _GROUPED_DUCK,
    "custom_sum_f32_sql_rewritten": _GROUPED_DUCK,
    "custom_sum_f32_unfused": _GROUPED_DUCK,
    "custom_sum_f32_global": _GLOBAL_DUCK,
    "custom_sum_f32_scalable": _SCALABLE_DUCK,
    "custom_sum_f32_dataframe_api": _UDAF_API_DUCK,
}
