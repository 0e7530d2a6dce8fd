"""Structured Streaming twin must produce exactly the batch result when
replaying the bounded events table (deterministic via availableNow +
processAllAvailable)."""

from __future__ import annotations

from datafusion_gpu_spark.context import register_tables
from datafusion_gpu_spark.streaming import (
    run_stream_to_memory,
    stream_tumbling_counts,
    stream_user_event_counts,
)
from datafusion_gpu_spark.operators.events import tumbling_window_agg
from tests.conftest import SF_DIR


def test_stateful_user_counts_equal_batch(spark):
    tables = register_tables(spark, SF_DIR)
    batch = {
        r.user_id: r.n
        for r in tables["events"].groupBy("user_id").count().withColumnRenamed("count", "n").collect()
    }
    out = run_stream_to_memory(
        stream_user_event_counts(spark, SF_DIR), "test_user_counts", mode="update"
    ).toPandas()
    # update mode re-emits per micro-batch; the LAST emission per user is
    # the running total — with availableNow replay it must equal batch
    final = out.groupby("user_id")["n_events"].max().to_dict()
    assert final == batch


def test_stream_tumbling_equals_batch(spark):
    tables = register_tables(spark, SF_DIR)
    batch = tumbling_window_agg(tables["events"]).toPandas()
    stream = run_stream_to_memory(
        stream_tumbling_counts(spark, SF_DIR), "test_evt_stream"
    ).toPandas()
    key = lambda d: d.sort_values(["window_start", "event_type"]).reset_index(  # noqa: E731
        drop=True
    )
    assert key(batch).equals(key(stream))


def test_stream_dedup_keeps_one_row_per_key(spark):
    from datafusion_gpu_spark.streaming import stream_dedup_events

    tables = register_tables(spark, SF_DIR)
    expected_keys = {
        (r.user_id, r.event_type)
        for r in tables["events"].select("user_id", "event_type").distinct().collect()
    }
    out = run_stream_to_memory(
        stream_dedup_events(spark, SF_DIR), "test_dedup_stream", mode="append"
    ).toPandas()
    # which row survives per key is engine-chosen; the contract is the
    # key set and exactly-one-row-per-key
    got_keys = set(zip(out["user_id"], out["event_type"]))
    assert got_keys == expected_keys
    assert len(out) == len(expected_keys)


def test_stream_static_join_equals_batch(spark):
    from datafusion_gpu_spark.streaming import stream_enriched_purchases

    tables = register_tables(spark, SF_DIR)
    batch = (
        tables["events"].where("event_type = 'purchase'")
        .join(tables["customer"],
              tables["events"]["user_id"] == tables["customer"]["c_custkey"])
        .select("event_id", "c_mktsegment")
        .toPandas()
    )
    stream = run_stream_to_memory(
        stream_enriched_purchases(spark, SF_DIR), "test_enrich_stream",
        mode="append",
    ).toPandas()
    assert len(stream) == len(batch)
    key = lambda d: d.sort_values("event_id").reset_index(drop=True)  # noqa: E731
    assert key(batch)["c_mktsegment"].equals(
        key(stream[["event_id", "c_mktsegment"]])["c_mktsegment"]
    )


def test_foreach_batch_parquet_sink_roundtrip(spark, tmp_path):
    from datafusion_gpu_spark.streaming import stream_events, stream_to_parquet

    out = str(tmp_path / "events_sink")
    ckpt = str(tmp_path / "ckpt")
    ev = stream_events(spark, SF_DIR).select("event_id", "user_id", "value")
    q = stream_to_parquet(ev, out, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    tables = register_tables(spark, SF_DIR)
    written = spark.read.parquet(out)
    assert written.count() == tables["events"].count()
    # every source event id arrives exactly once
    assert written.select("event_id").distinct().count() == written.count()
