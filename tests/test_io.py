"""IO unit tests: Arrow IPC round-trip (incl. empty partitions), NDJSON
round-trip, schema preservation. The value-level oracle checks live in
queries/io_q.py; these cover edge shapes the oracle queries don't."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from datafusion_gpu_spark import io
from datafusion_gpu_spark.queries.io_q import SCRATCH


@pytest.fixture()
def small_df(spark):
    return spark.range(0, 37).select(
        F.col("id").alias("k"),
        (F.col("id") * 1.5).alias("v"),
        F.concat(F.lit("row-"), F.col("id")).alias("s"),
    )


def test_arrow_ipc_roundtrip(spark, small_df):
    out = os.path.join(SCRATCH, "unit_arrow")
    manifest = io.write_arrow_ipc(small_df.repartition(8), out).collect()
    assert sum(m.rows for m in manifest) == 37
    back = io.read_arrow_ipc(spark, out)
    # nullability legitimately widens through the Arrow/pandas boundary;
    # names and types must survive exactly
    assert [(f.name, f.dataType) for f in back.schema.fields] == [
        (f.name, f.dataType) for f in small_df.schema.fields
    ]
    assert sorted(r.k for r in back.collect()) == list(range(37))


def test_arrow_ipc_skips_empty_partitions(spark, small_df):
    out = os.path.join(SCRATCH, "unit_arrow_sparse")
    # 64 partitions for 37 rows -> many empty partitions must not produce files
    manifest = io.write_arrow_ipc(small_df.repartition(64), out).collect()
    assert all(m.rows > 0 for m in manifest)
    back = io.read_arrow_ipc(spark, out)
    assert back.count() == 37


def test_json_roundtrip_preserves_values(spark, small_df):
    out = os.path.join(SCRATCH, "unit_json")
    io.write_json(small_df, out)
    back = io.read_json(spark, out)
    a = {(r.k, r.v, r.s) for r in small_df.collect()}
    b = {(r.k, r.v, r.s) for r in back.collect()}
    assert a == b


def test_csv_roundtrip_with_inference(spark, small_df):
    out = os.path.join(SCRATCH, "unit_csv")
    io.write_csv(small_df, out)
    back = io.read_csv(spark, out)
    assert back.count() == 37
    assert dict(back.dtypes)["v"] == "double"


# -- Python Data Source API ---------------------------------------------------


def test_python_datasource_partitioned_and_deterministic(spark):
    import hashlib

    from datafusion_gpu_spark.sources import register_python_sources

    register_python_sources(spark)
    df = spark.read.format("dgs_synth").option("n", 1000).option("parts", 4).load()
    assert df.rdd.getNumPartitions() == 4  # declared InputPartitions
    rows = {r.id: (r.bucket, r.val) for r in df.collect()}
    assert len(rows) == 1000  # every id exactly once across partitions
    for i in (0, 1, 999):
        b = int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) % 100
        assert rows[i] == (b, b / 100.0)
    again = {r.id: (r.bucket, r.val) for r in df.collect()}
    assert rows == again


def test_python_datasource_ragged_tail_partition(spark):
    from datafusion_gpu_spark.sources import register_python_sources

    register_python_sources(spark)
    df = spark.read.format("dgs_synth").option("n", 10).option("parts", 3).load()
    assert df.count() == 10  # ceil-split covers the ragged tail exactly
