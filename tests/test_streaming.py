"""Structured Streaming twin must produce exactly the batch result when
replaying the bounded events table (deterministic via availableNow +
processAllAvailable)."""

from __future__ import annotations

from datafusion_gpu_spark.context import register_tables
from datafusion_gpu_spark.operators.events import tumbling_window_agg
from datafusion_gpu_spark.streaming import run_stream_to_memory, stream_tumbling_counts
from tests.conftest import SF_DIR


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
