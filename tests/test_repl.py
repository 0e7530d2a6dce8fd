"""REPL behavior tests (main.rs parity): one-shot execution, timing
print, error-and-continue, dialect gap messages."""

from __future__ import annotations

import io

import pytest

from datafusion_gpu_spark.dialect import UnsupportedSqlError, check_dialect
from datafusion_gpu_spark.repl import run_sql


def test_one_shot_prints_table_and_timing(spark):
    out = io.StringIO()
    assert run_sql(spark, "SELECT 1 AS one, 'x' AS s", out=out)
    text = out.getvalue()
    assert "| one | s" in text.replace("  ", " ")
    assert "Total execution time:" in text


def test_error_prints_and_returns_false(spark):
    out = io.StringIO()
    assert not run_sql(spark, "SELECT definitely bogus syntax here", out=out)
    assert "Error:" in out.getvalue()


def test_null_rendered(spark):
    out = io.StringIO()
    assert run_sql(spark, "SELECT CAST(NULL AS INT) AS v", out=out)
    assert "NULL" in out.getvalue()


def test_groups_frame_gap_is_documented(spark):
    with pytest.raises(UnsupportedSqlError, match="GROUPS window frames"):
        check_dialect(
            "SELECT sum(x) OVER (ORDER BY x GROUPS BETWEEN 1 PRECEDING "
            "AND CURRENT ROW) FROM t"
        )
    out = io.StringIO()
    assert not run_sql(
        spark,
        "SELECT sum(x) OVER (ORDER BY x GROUPS BETWEEN 1 PRECEDING AND "
        "CURRENT ROW) FROM t",
        out=out,
    )
    assert "GROUPS window frames" in out.getvalue()


def test_recursive_cte_is_supported(spark):
    out = io.StringIO()
    assert run_sql(
        spark,
        "WITH RECURSIVE t(n) AS (SELECT 1 UNION ALL SELECT n+1 FROM t "
        "WHERE n < 3) SELECT * FROM t",
        out=out,
    )
