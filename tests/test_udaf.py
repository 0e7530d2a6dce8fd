"""UDAF lifecycle + coercion matrix (SURVEY §5.2 item 3, mirroring the
reference's coerce_types rules at cubecl_sum_udaf.rs:64-75 and the
documented strictly-better divergences in aggregates.py)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import FloatType

from datafusion_gpu_spark.aggregates import (
    register_aggregates,
    sum_arrow_cpu,
    sum_f32_distributed,
)


@pytest.fixture(scope="module")
def typed_df(spark):
    return spark.createDataFrame(
        [("a", 1.5, 1, "x"), ("a", 2.25, 2, "y"), ("b", None, 3, "z")],
        "g string, f double, i long, s string",
    )


def test_string_input_rejected(typed_df):
    # the reference plans an error for non-numeric input (cubecl rs:71-74)
    with pytest.raises(Exception, match="unsupported input dtype|sum_arrow"):
        typed_df.agg(sum_arrow_cpu(F.col("s"))).collect()


def test_int_input_coerced(typed_df):
    [row] = typed_df.agg(sum_arrow_cpu(F.col("i")).alias("s")).collect()
    assert row.s == pytest.approx(6.0)


def test_null_skipped(typed_df):
    [row] = typed_df.agg(sum_arrow_cpu(F.col("f")).alias("s")).collect()
    assert row.s == pytest.approx(3.75)


def test_empty_global_agg_yields_no_row(typed_df):
    # Spark never invokes a grouped-agg pandas UDF on an empty relation:
    # a global agg over zero rows returns zero rows (pin the contract;
    # the reference would have produced one 0.0 row, cubecl rs:215-220)
    rows = (
        typed_df.where(F.lit(False)).agg(sum_arrow_cpu(F.col("f")).alias("s")).collect()
    )
    assert rows == []


def test_all_null_group_is_null(typed_df):
    [row] = (
        typed_df.where(F.col("g") == "b")
        .agg(sum_arrow_cpu(F.col("f")).alias("s"))
        .collect()
    )
    assert row.s is None


def test_result_type_is_float32(typed_df):
    df = typed_df.agg(sum_arrow_cpu(F.col("f")).alias("s"))
    assert df.schema["s"].dataType == FloatType()


def test_grouped_matches_numpy(spark):
    pdf = spark.range(0, 1000).select(
        (F.col("id") % 7).alias("g"), (F.col("id") / 3.0).cast("float").alias("v")
    )
    rows = pdf.groupBy("g").agg(sum_arrow_cpu(F.col("v")).alias("s")).collect()
    vals = pdf.toPandas()
    for row in rows:
        expected = np.float32(
            vals[vals.g == row.g]["v"].to_numpy().astype(np.float32).sum(dtype=np.float64)
        )
        assert row.s == pytest.approx(float(expected), rel=1e-6)


def test_distributed_variant_matches_udaf(spark):
    df = spark.range(0, 10_000).select(
        (F.col("id") % 3).alias("g"), (F.col("id") * 0.5).cast("float").alias("v")
    )
    a = {r.g: r["sum_v"] for r in sum_f32_distributed(df, "v", "g").collect()}
    b = {
        r.g: r.s
        for r in df.groupBy("g").agg(sum_arrow_cpu(F.col("v")).alias("s")).collect()
    }
    for g in a:
        assert a[g] == pytest.approx(b[g], rel=1e-5)


def test_gpu_probe_graceful_without_cuda(spark):
    # SURVEY §2.10: the backend probe must degrade to CPU without error
    # when CuPy/CUDA are absent (this container has neither)
    from datafusion_gpu_spark.aggregates import gpu_available, sum_arrow

    assert gpu_available() is False
    df = spark.range(0, 100).select((F.col("id") * 1.0).cast("float").alias("v"))
    [row] = df.agg(sum_arrow(F.col("v")).alias("s")).collect()
    assert row.s == pytest.approx(4950.0)


def test_sql_registration_names(spark):
    register_aggregates(spark)
    df = spark.range(0, 100).select((F.col("id") * 1.0).cast("float").alias("v"))
    df.createOrReplaceTempView("udaf_probe")
    for name in (
        "sum_arrow",
        "sum_arrow_cpu",
        "sum_cudarc",
        "sum_cubecl",
        "sum_arrow_unfused",
    ):
        [row] = spark.sql(f"SELECT {name}(v) AS s FROM udaf_probe").collect()
        assert row.s == pytest.approx(4950.0)


def test_partial_final_matches_udaf(spark):
    from datafusion_gpu_spark.aggregates import sum_f32_partial_final

    df = spark.range(0, 10_000).select(
        (F.col("id") % 7).alias("g"), (F.col("id") / 3.0).cast("float").alias("v")
    ).repartition(16)
    a = {r.g: r.s for r in sum_f32_partial_final(df, "v", "g", alias="s").collect()}
    b = {
        r.g: r.s
        for r in df.groupBy("g").agg(sum_arrow_cpu(F.col("v")).alias("s")).collect()
    }
    assert set(a) == set(b)
    for g in a:
        assert a[g] == pytest.approx(b[g], rel=1e-6)


def test_partial_final_all_null_group_keeps_key(spark, typed_df):
    from datafusion_gpu_spark.aggregates import sum_f32_partial_final

    out = {r.g: r.s for r in sum_f32_partial_final(typed_df, "f", "g", alias="s").collect()}
    assert out["a"] == pytest.approx(3.75)
    assert "b" in out and out["b"] is None  # all-null group survives as NULL


def test_partial_final_global_and_empty(spark, typed_df):
    from datafusion_gpu_spark.aggregates import sum_f32_partial_final

    [row] = sum_f32_partial_final(typed_df, "f", alias="s").collect()
    assert row.s == pytest.approx(3.75)
    [row] = sum_f32_partial_final(
        typed_df.where(F.lit(False)), "f", alias="s"
    ).collect()
    assert row.s is None  # SQL SUM over empty input -> one NULL row


def test_partial_final_rejects_strings(typed_df):
    from datafusion_gpu_spark.aggregates import sum_f32_partial_final

    with pytest.raises(Exception, match="unsupported input dtype"):
        sum_f32_partial_final(typed_df, "s", "g").collect()


def test_partial_final_plan_shuffles_partials_only(spark):
    # the scale contract: the Python boundary is BEFORE the exchange
    # (map-side combine), and no whole-group AggregateInPandas exists
    from datafusion_gpu_spark.aggregates import sum_f32_partial_final

    df = spark.range(0, 1000).select(
        (F.col("id") % 3).alias("g"), (F.col("id") * 1.0).cast("float").alias("v")
    )
    plan = (
        sum_f32_partial_final(df, "v", "g")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "AggregateInPandas" not in plan
    assert "MapInPandas" in plan
    assert "partial_sum" in plan


def test_gpu_branch_with_cupy_shim(monkeypatch):
    """Executes _sum_f32_gpu through a NumPy-backed fake of the CuPy
    surface it touches (asarray / .sum(dtype) / .get) — the only way to
    cover the GPU branch in a CUDA-less container without faking
    hardware results: the shim reuses numpy's reduction, so the
    assertion is that the BRANCH's null-handling/coercion/empty
    semantics match the CPU path exactly (reference analogue: the
    `cuda` feature gate, Cargo.toml:7)."""
    import numpy as np
    import pandas as pd

    import datafusion_gpu_spark.aggregates as agg

    class _Scalar:
        def __init__(self, v):
            self._v = v

        def get(self):
            return self._v

    class _Dev:
        def __init__(self, arr):
            self._a = np.asarray(arr)

        def sum(self, dtype=None):
            return _Scalar(self._a.sum(dtype=dtype))

    class _FakeCupy:
        float64 = np.float64

        @staticmethod
        def asarray(a):
            return _Dev(a)

    monkeypatch.setattr(agg, "_cp", _FakeCupy)

    nullable = pd.Series([1.5, None, 2.25, 3.0], dtype="float64")
    assert agg._sum_f32_gpu(nullable) == agg._sum_f32_numpy(nullable)
    assert isinstance(agg._sum_f32_gpu(nullable), np.float32)

    typed = pd.Series([1, 2, 3], dtype="int64")
    assert agg._sum_f32_gpu(typed) == agg._sum_f32_numpy(typed) == np.float32(6)

    empty = pd.Series([None, None], dtype="float64")
    assert agg._sum_f32_gpu(empty) is None
    assert agg._sum_f32_numpy(empty) is None

    # f32 coercion happens BEFORE the device copy (cudarc rs:66-72):
    # a value beyond f32 precision collapses identically on both paths
    wide = pd.Series([16_777_217.0], dtype="float64")  # 2^24 + 1
    assert agg._sum_f32_gpu(wide) == agg._sum_f32_numpy(wide) == np.float32(2**24)
