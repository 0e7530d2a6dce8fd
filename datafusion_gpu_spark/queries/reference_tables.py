"""Queries over the reference's own first-party tables: the synthetic
``types`` MemTable and the CSV-inferred ``test`` table
(/root/reference/src/lib.rs:36-58).

``types`` cannot have a value oracle (its generator is Spark-side
xxhash64), so the README parity check — the reference's own manual
correctness procedure of comparing ``sum(float)`` against the custom f32
sums on the same table (README.md:71-75, SURVEY §5.1) — is expressed as a
self-validating query: Spark computes the tolerance predicate, the oracle
states the expected verdict, and the driver's hash compare enforces it.

The CSV fixture is the repo's own deterministic 100x13 file
(tests/fixtures/test.csv, column pattern per SURVEY §5.1: letter group
key, signed/unsigned ints of increasing width, f32/f64, strings); DuckDB
reads the identical file through read_csv, so the inference path gets a
true value oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from datafusion_gpu_spark.aggregates import register_aggregates
from datafusion_gpu_spark.context import make_types_df, register_test_csv

#: Absolute so the DuckDB oracle (whose cwd is the driver's) finds it too.
TEST_CSV = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "tests",
    "fixtures",
    "test.csv",
)

_TYPES_LEN = 100_000


def _types_sum_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """README.md:71-75 run as one query: built-in sum vs both custom f32
    aggregates on the same deterministic 100k-row ``types`` table, with
    the f32-tolerance verdict (SURVEY §4.1: rel eps 1e-4) as the result."""
    register_aggregates(spark)
    make_types_df(spark, _TYPES_LEN).createOrReplaceTempView("types")
    # Spark disallows grouped-agg pandas UDFs next to built-in aggregates
    # in one aggregation (INVALID_PANDAS_UDF_PLACEMENT), so the built-in
    # side and the custom side each aggregate alone and meet in a join —
    # incidentally the same shape as the reference's manual REPL check
    # (three separate queries over one table).
    return spark.sql(
        """
        SELECT b.n_rows,
               (ABS(b.s - c.s_cpu) / ABS(b.s) < 1e-4
                AND ABS(b.s - c.s_alias) / ABS(b.s) < 1e-4) AS parity_ok
        FROM (SELECT COUNT(*) AS n_rows, SUM(float) AS s FROM types) b
        CROSS JOIN (SELECT sum_arrow_cpu(float) AS s_cpu,
                           sum_cubecl(float) AS s_alias
                    FROM types) c
        """
    )


_TYPES_PARITY_DUCK = f"""
SELECT {_TYPES_LEN}::BIGINT AS n_rows, TRUE AS parity_ok
"""


def _csv_scan_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV scan with header + schema inference (src/lib.rs:57-58), then
    one aggregate per inferred column family: group key, int sum, float
    stats, string min — proving the inferred types are usable."""
    register_test_csv(spark, TEST_CSV)
    return spark.sql(
        """
        SELECT c1,
               COUNT(*) AS n,
               SUM(c2) AS sum_c2,
               SUM(c7) AS sum_c7,
               ROUND(SUM(c11), 6) AS sum_c11,
               ROUND(AVG(c12), 6) AS avg_c12,
               MIN(c13) AS min_c13
        FROM test
        GROUP BY c1
        """
    )


_CSV_SCAN_DUCK = f"""
SELECT c1,
       COUNT(*) AS n,
       SUM(c2)::BIGINT AS sum_c2,
       SUM(c7)::BIGINT AS sum_c7,
       ROUND(SUM(c11), 6) AS sum_c11,
       ROUND(AVG(c12), 6) AS avg_c12,
       MIN(c13) AS min_c13
FROM read_csv('{TEST_CSV}', header = true)
GROUP BY c1
"""

QUERIES = {
    "types_sum_parity": _types_sum_parity,
    "csv_scan_agg": _csv_scan_agg,
}

ORACLES = {
    "types_sum_parity": _TYPES_PARITY_DUCK,
    "csv_scan_agg": _CSV_SCAN_DUCK,
}
