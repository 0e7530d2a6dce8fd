"""Heavy hitters: exactness of the sketch-then-verify scheme."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafusion_gpu_spark.operators.sketches import heavy_hitters


def _exact_hitters(spark_df, frac):
    total = spark_df.where(F.col("item").isNotNull()).count()
    exact = (
        spark_df.where(F.col("item").isNotNull())
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > total * frac)
    )
    return {(r.item, r.n) for r in exact.collect()}


def test_heavy_hitters_matches_exact_on_zipf(spark):
    # zipf-ish: item j appears ~N/j times — a long tail with a few
    # giants; the result must equal the brute-force exact answer
    rows = [(f"w{j}",) for j in range(1, 200) for _ in range(2000 // j)]
    df = spark.createDataFrame(rows, "item string").repartition(16)
    got = {(r.item, r.n) for r in heavy_hitters(df, "item", k=20).collect()}
    want = _exact_hitters(df, 1 / 20)
    assert got == want and len(want) > 0


def test_heavy_hitters_no_hitters_and_nulls(spark):
    # uniform data below threshold -> empty result; NULLs are ignored
    rows = [(f"u{j % 50}",) for j in range(500)] + [(None,)] * 40
    df = spark.createDataFrame(rows, "item string").repartition(8)
    out = heavy_hitters(df, "item", k=10).collect()
    assert out == []  # every item is exactly 1/50 of non-null rows


def test_heavy_hitters_custom_threshold_and_partitioning_invariance(spark):
    rows = [("big",)] * 300 + [(f"t{j}",) for j in range(300)]
    df = spark.createDataFrame(rows, "item string")
    for parts in (2, 13):
        got = {
            (r.item, r.n)
            for r in heavy_hitters(
                df.repartition(parts), "item", k=5, threshold_fraction=0.25
            ).collect()
        }
        assert got == {("big", 300)}  # 300/600 = 0.5 > 0.25; tails are not


def test_bloom_no_false_negatives_and_low_fpr(spark):
    import numpy as np

    from datafusion_gpu_spark.operators.sketches import (
        bloom_build,
        bloom_might_contain,
    )

    members = spark.createDataFrame(
        [(f"key-{i}",) for i in range(5000)], "item string"
    ).repartition(8)
    bits = bloom_build(members, "item", n_bits=1 << 20, k=7)
    assert isinstance(bits, np.ndarray) and bits.any()
    # every member probes True — Bloom filters never false-negative
    probed = bloom_might_contain(members, "item", bits, k=7)
    assert probed.where("NOT might_contain").count() == 0
    # disjoint probes: FPR well under 2% at this sizing (m/n=210, k=7)
    others = spark.createDataFrame(
        [(f"other-{i}",) for i in range(5000)], "item string"
    )
    fp = bloom_might_contain(others, "item", bits, k=7).where("might_contain").count()
    assert fp / 5000 < 0.02, fp


def test_incremental_dedup_bloom_equals_exact(spark):
    from datafusion_gpu_spark.operators.dedup import (
        incremental_dedup,
        incremental_dedup_bloom,
    )

    history = spark.createDataFrame(
        [(i, f"seen doc {i}") for i in range(200)], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        # 50 dups of history, 100 novel, plus an in-batch dup pair
        [(1000 + i, f"seen doc {i}") for i in range(50)]
        + [(2000 + i, f"new doc {i}") for i in range(100)]
        + [(3000, "twin text"), (3001, "twin text")],
        "doc_id long, text string",
    )
    exact = {(r.content_key, r.doc_id) for r in incremental_dedup(history, batch).collect()}
    bloom = {(r.content_key, r.doc_id)
             for r in incremental_dedup_bloom(history, batch).collect()}
    assert bloom == exact
    assert len(exact) == 101  # 100 novel + one twin keeper


def test_heavy_hitters_rejects_threshold_below_guarantee(spark):
    df = spark.createDataFrame([("a",)], "item string")
    with pytest.raises(ValueError, match="guarantee"):
        heavy_hitters(df, "item", k=10, threshold_fraction=0.01)


def test_bloom_non_string_columns_probe_consistently(spark):
    # build and probe must hash the same (Spark-cast) representation:
    # booleans and doubles used to false-negative under pandas str()
    from datafusion_gpu_spark.operators.sketches import (
        bloom_build,
        bloom_might_contain,
    )

    vals = spark.createDataFrame(
        [(True, 0.0001), (False, 1.5)], "b boolean, d double"
    )
    for col in ("b", "d"):
        bits = bloom_build(vals, col, n_bits=1 << 16, k=5)
        probed = bloom_might_contain(vals, col, bits, k=5)
        assert probed.where("NOT might_contain").count() == 0, col
    # NULLs probe False (never inserted)
    withnull = spark.createDataFrame([(None,), ("x",)], "s string")
    bits = bloom_build(withnull, "s", n_bits=1 << 16, k=5)
    got = {r.s: r.might_contain
           for r in bloom_might_contain(withnull, "s", bits, k=5).collect()}
    assert got["x"] is True and got[None] is False


def test_count_min_never_underestimates_and_is_exact_when_wide(spark):
    from datafusion_gpu_spark.operators.sketches import (
        count_min_build,
        count_min_estimate,
    )

    data = [(k,) for k in ["a"] * 50 + ["b"] * 20 + ["c"] * 5 + ["d"] * 1]
    df = spark.createDataFrame(data, "k string")
    keys = spark.createDataFrame([("a",), ("b",), ("c",), ("d",), ("zzz",)], "k string")
    exact = {"a": 50, "b": 20, "c": 5, "d": 1, "zzz": 0}
    # narrow sketch: collisions allowed, but never an underestimate
    narrow = count_min_build(df, "k", depth=4, width=2)
    est = {
        r.key: r.est
        for r in count_min_estimate(narrow, keys, "k", depth=4, width=2).collect()
    }
    for k, n in exact.items():
        assert est[k] >= n
    # wide sketch: 4 keys on 4096 columns -> estimates are exact
    wide = count_min_build(df, "k", depth=4, width=4096)
    est = {
        r.key: r.est
        for r in count_min_estimate(wide, keys, "k", depth=4, width=4096).collect()
    }
    assert est == exact


def test_count_min_nulls_skipped_and_cells_bounded(spark):
    from datafusion_gpu_spark.operators.sketches import count_min_build

    df = spark.createDataFrame([("a",), (None,), ("b",)], "k string")
    sk = count_min_build(df, "k", depth=3, width=8)
    rows = sk.collect()
    # 2 keys x 3 rows = at most 6 cells, total mass = 2 non-null rows x 3
    assert len(rows) <= 6
    assert sum(r.cnt for r in rows) == 6
    assert all(0 <= r.r < 3 and 0 <= r.c < 8 for r in rows)


def test_hll_sliding_distinct_small_exact_and_window_semantics(spark):
    from pyspark.sql import functions as F

    from datafusion_gpu_spark.operators.sketches import hll_sliding_distinct

    # hours 0,1,2 with overlapping user sets; window=2: bucket h counts
    # distinct users of hours (h-1, h). Sparse-mode HLL is exact here.
    rows = [
        ("2024-01-01 00:10:00", 1), ("2024-01-01 00:20:00", 2),
        ("2024-01-01 01:10:00", 2), ("2024-01-01 01:30:00", 3),
        ("2024-01-01 02:05:00", 9), ("2024-01-01 02:06:00", None),
    ]
    ev = spark.createDataFrame(rows, "ts_s string, user_id long").select(
        F.col("ts_s").cast("timestamp").alias("ts"), "user_id"
    )
    got = {
        str(r.bucket): int(r.est)
        for r in hll_sliding_distinct(ev, "ts", "user_id", window_hours=2).collect()
    }
    assert got == {
        "2024-01-01 00:00:00": 2,        # {1,2}
        "2024-01-01 01:00:00": 3,        # {1,2} ∪ {2,3}
        "2024-01-01 02:00:00": 3,        # {2,3} ∪ {9}, NULL skipped
    }
