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


# -- QUALIFY rewrite ----------------------------------------------------------


def test_rewrite_qualify_basic_shapes():
    from datafusion_gpu_spark.dialect import rewrite_qualify

    assert rewrite_qualify("SELECT a FROM t") is None
    out = rewrite_qualify("SELECT a, b FROM t QUALIFY rn <= 2")
    assert out == (
        "SELECT * FROM (SELECT __q.*, (rn <= 2) AS __qualify__ "
        "FROM (SELECT a, b FROM t) AS __q) WHERE __qualify__ "
    )
    # trailing ORDER BY / LIMIT stay outside the rewrite
    out = rewrite_qualify("SELECT a FROM t QUALIFY rn = 1 ORDER BY a LIMIT 3")
    assert out.endswith("WHERE __qualify__ ORDER BY a LIMIT 3")
    # QUALIFY inside a subquery or a string literal is not top-level
    assert rewrite_qualify(
        "SELECT * FROM (SELECT 'QUALIFY' AS s FROM t) u"
    ) is None


def test_rewrite_qualify_skips_comments_and_quoted_identifiers():
    from datafusion_gpu_spark.dialect import rewrite_qualify

    # the word QUALIFY inside -- and /* */ comments is prose, not syntax
    assert rewrite_qualify("-- QUALIFY note\nSELECT a FROM t") is None
    assert rewrite_qualify("SELECT a FROM t /* QUALIFY here */") is None
    assert rewrite_qualify('SELECT `QUALIFY` FROM t') is None
    # a real QUALIFY after a comment still rewrites, and comments are
    # STRIPPED from the generated statement — a '--' spliced into the
    # single-line rewrite would comment out the closing parenthesis
    out = rewrite_qualify(
        "-- top-k per group\nSELECT a FROM t QUALIFY rn = 1 -- keep first\n"
    )
    assert out is not None and "__qualify__" in out
    assert "keep first" not in out and "top-k" not in out
    # ...but a '--' inside a string literal is data, not a comment
    out = rewrite_qualify("SELECT a FROM t WHERE s != '--x' QUALIFY rn = 1")
    assert out is not None and "'--x'" in out


def test_rewrite_qualify_rejects_set_operations():
    import pytest

    from datafusion_gpu_spark.dialect import UnsupportedSqlError, rewrite_qualify

    with pytest.raises(UnsupportedSqlError, match="set operation"):
        rewrite_qualify(
            "SELECT a FROM t QUALIFY rn = 1 UNION ALL SELECT a FROM u"
        )
    # a set operation inside a subquery is fine
    assert rewrite_qualify(
        "SELECT * FROM (SELECT a FROM t UNION SELECT a FROM u) s QUALIFY rn = 1"
    ) is not None


def test_repl_executes_qualify_statement(spark, capsys=None):
    import io

    from datafusion_gpu_spark.repl import run_sql

    spark.createDataFrame(
        [(1, 10.0), (1, 20.0), (2, 5.0), (2, 30.0)], "g int, v double"
    ).createOrReplaceTempView("qt")
    buf = io.StringIO()
    ok = run_sql(
        spark,
        "SELECT g, v FROM qt "
        "QUALIFY ROW_NUMBER() OVER (PARTITION BY g ORDER BY v DESC) = 1 "
        "ORDER BY g",
        out=buf,
    )
    assert ok, buf.getvalue()
    text = buf.getvalue()
    assert "20.0" in text and "30.0" in text
    assert "10.0" not in text and "__qualify__" not in text


def test_rewrite_reference_sums_shapes():
    from datafusion_gpu_spark.dialect import rewrite_reference_sums as r

    assert r("SELECT sum(x) FROM t") is None
    out = r("SELECT sum_cudarc(float) FROM types")
    assert out == "SELECT CAST(SUM(CAST((float) AS FLOAT)) AS FLOAT) FROM types"
    # nested expression argument, alias preserved
    out = r("SELECT g, sum_cubecl(v + (1)) AS s FROM t GROUP BY g")
    assert "CAST(SUM(CAST((v + (1)) AS FLOAT)) AS FLOAT) AS s" in out
    # subquery depth + comment stripped
    out = r("SELECT (SELECT sum_cudarc(b) FROM u) FROM t -- sum_cubecl(z)")
    assert out.count("CAST(SUM") == 1
    # NOT rewritten: explicit kernel-demo names, strings, DISTINCT, 2 args
    assert r("SELECT sum_arrow_cpu(x) FROM t") is None
    assert r("SELECT sum_arrow_unfused(x) FROM t") is None
    assert r("SELECT 'sum_cudarc(x)' FROM t") is None
    assert r("SELECT sum_cudarc(DISTINCT x) FROM t") is None
    assert r("SELECT sum_cudarc(x, y) FROM t") is None


def test_repl_reference_sum_plans_as_jvm_two_phase(spark):
    # the REPL front door must execute a reference-named sum as built-in
    # two-phase aggregation: same f32 result, no Python worker in the plan
    import io

    from datafusion_gpu_spark.aggregates import register_aggregates
    from datafusion_gpu_spark.dialect import rewrite_reference_sums
    from datafusion_gpu_spark.repl import run_sql

    register_aggregates(spark)
    spark.createDataFrame(
        [(1, 1.5), (1, 2.5), (2, None), (2, 4.0)], "g int, v float"
    ).createOrReplaceTempView("rs")
    sql = "SELECT g, sum_cudarc(v) AS s FROM rs GROUP BY g ORDER BY g"
    buf = io.StringIO()
    assert run_sql(spark, sql, out=buf), buf.getvalue()
    assert "4.0" in buf.getvalue()
    plan = spark.sql(
        rewrite_reference_sums(sql)
    )._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan
    assert "InPandas" not in plan and "ArrowEval" not in plan
    # the UDAF spelling (direct spark.sql, no REPL rewrite) still works
    # and agrees with the rewritten result
    udaf = {r.g: r.s for r in spark.sql(
        "SELECT g, sum_arrow_cpu(v) AS s FROM rs GROUP BY g").collect()}
    jvm = {r.g: r.s for r in spark.sql(
        rewrite_reference_sums(sql)).collect()}
    assert udaf == jvm


def test_scanners_honor_escaped_quotes():
    from datafusion_gpu_spark.dialect import (
        _strip_comments,
        rewrite_qualify,
        rewrite_reference_sums,
    )

    # Spark's default escapedStringLiterals=false: \' stays inside the
    # literal — the scanner must not close the string early and eat the
    # rest of the statement as a comment
    sql = r"SELECT sum_cudarc(x) AS s, 'it\'s -- note' AS t FROM types"
    out = rewrite_reference_sums(sql)
    assert out.endswith(r"'it\'s -- note' AS t FROM types")
    assert _strip_comments(r"SELECT 'a\'b -- x' FROM t") == (
        r"SELECT 'a\'b -- x' FROM t"
    )
    assert rewrite_qualify(r"SELECT 'no \' QUALIFY here' AS s FROM t") is None


def test_rewrite_reference_sums_leaves_window_and_filter_calls():
    from datafusion_gpu_spark.dialect import rewrite_reference_sums as r

    # a grouped-agg pandas UDAF is legal as a window function; the
    # CAST(SUM(..)) spelling is not — windowed/filtered calls stay on
    # the registered-UDAF path
    assert r("SELECT g, sum_cudarc(v) OVER (PARTITION BY g) FROM t") is None
    assert r("SELECT sum_cudarc(v) FILTER (WHERE v > 0) FROM t") is None
    # but a plain call NEXT TO a windowed one still rewrites the plain one
    out = r("SELECT sum_cubecl(v) AS a, sum_cudarc(v) OVER (PARTITION BY g) AS b FROM t")
    assert out is not None and out.count("CAST(SUM") == 1
