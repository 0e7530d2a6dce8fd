"""Mergeable summary sketches for heavy-hitter mining at corpus scale.

``heavy_hitters`` is the two-pass exact scheme a 100 TB pipeline
actually runs (vocabulary pruning, hot-key detection, boilerplate
n-grams): pass 1 builds per-partition Misra-Gries summaries (bounded
memory, one scan, nothing shuffled but the summary rows) and merges
them into a candidate set that PROVABLY contains every item with
frequency > n/k (MG merge theorem, Agarwal et al., "Mergeable
Summaries", PODS 2012); pass 2 counts the candidates exactly with one
broadcast semi-join + hash aggregation and applies the true threshold.
Exact heavy hitters, two scans, shuffle bounded by the summaries and
candidate matches — the full vocabulary is never shuffled.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)
from pyspark.sql.window import Window

_SUMMARY_SCHEMA = StructType(
    [
        StructField("item", StringType()),
        StructField("weight", LongType()),
    ]
)


def heavy_hitters(
    df: DataFrame, item_col: str, k: int = 100, threshold_fraction: float | None = None
) -> DataFrame:
    """(item, n) for every item whose EXACT count exceeds
    ``threshold_fraction * total`` (default 1/k):

    1. per-partition Misra-Gries (mapInPandas, k counters, one scan);
       each partition also emits a NULL-item sentinel row carrying its
       row count, so the grand total rides the same scan and shuffle as
       the summaries — no separate count() pass;
    2. merge: sum summary weights per item, subtract the (k+1)-st
       largest merged weight (the mergeable-summaries decrement), keep
       positive — a superset of the true heavy hitters, at most k items;
    3. verify: count the candidates exactly (broadcast semi-join, one
       scan) and keep those above ``frac * total``.

    The merge window sorts at most k rows per input partition — a
    driver-sized relation; the verified output is deterministic and
    exact (the sketch only shapes the candidate superset, and the merge
    theorem guarantees no true heavy hitter is lost).
    """
    frac = threshold_fraction if threshold_fraction is not None else 1.0 / k
    if frac < 1.0 / (k + 1):
        # the MG merge guarantee only covers items with frequency
        # > n/(k+1); a lower threshold would silently drop true hitters
        raise ValueError(
            f"threshold_fraction={frac} is below the k={k} sketch's "
            f"guarantee 1/(k+1)={1.0 / (k + 1):.4f}; raise k to at least "
            f"{int(1.0 / frac)} for this threshold"
        )
    items = df.select(F.col(item_col).cast("string").alias("item"))

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        n_local = 0
        for pdf in batches:
            for v in pdf["item"]:
                if v is None:
                    continue
                n_local += 1
                if v in counters:
                    counters[v] += 1
                elif len(counters) < k:
                    counters[v] = 1
                else:
                    # decrement-all; dict comp keeps it O(k) amortized
                    counters = {i: c - 1 for i, c in counters.items() if c > 1}
        out = pd.DataFrame(
            {
                "item": [*counters, None],  # None = total-count sentinel
                "weight": [*counters.values(), n_local],
            }
        )
        yield out

    summaries = items.mapInPandas(partials, _SUMMARY_SCHEMA)
    merged = summaries.groupBy("item").agg(F.sum("weight").alias("weight"))
    total_row = F.broadcast(
        merged.where(F.col("item").isNull()).select(
            F.col("weight").alias("total")
        )
    )
    real = merged.where(F.col("item").isNotNull())
    # mergeable-summaries decrement: subtract the (k+1)-st largest weight
    # (0 when fewer than k+1 merged items survive)
    w = Window.orderBy(F.col("weight").desc(), F.col("item"))
    ranked = real.withColumn("rk", F.row_number().over(w))
    decrement = F.broadcast(
        ranked.select(
            F.max(F.when(F.col("rk") == k + 1, F.col("weight"))).alias("dec")
        ).select(F.coalesce(F.col("dec"), F.lit(0)).alias("dec"))
    )
    candidates = (
        ranked.crossJoin(decrement)
        .where(F.col("weight") > F.col("dec"))
        .select("item")
    )
    exact = (
        items.join(F.broadcast(candidates), "item", "left_semi")
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return exact.crossJoin(total_row).where(
        F.col("n") > F.col("total") * F.lit(frac)
    ).select("item", "n")


def _cms_bucket(key, row: int, width: int):
    """Portable CMS hash: row-salted 60-bit md5 prefix mod width — the
    same cross-engine hash family as hash_split/minhash (Spark conv()
    here, '0x'||substring cast in the DuckDB replay), so the sketch is
    bit-identical on both engines."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(row), key)), 1, 15), 16, 10
    ).cast("long")
    return (h % width).cast("int")


def count_min_build(
    df: DataFrame, col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Count-min sketch of a key stream as a (r, c, cnt) relation —
    depth*width counter cells, the streaming-frequency workhorse
    (Cormode & Muthukrishnan '05) beside the exact Misra-Gries pass
    above: mergeable by cell-wise sum, bounded memory, estimate =
    min over rows, always >= the true count.

    Spark-first build: ONE scan, posexplode of the ``depth`` bucket
    columns, then a hash aggregation on (r, c) with map-side partial
    sums — the shuffle carries at most depth*width rows per partition
    regardless of input size, the mergeable-partials shape every
    sketch in this module uses. NULL keys are skipped (nothing to
    count)."""
    key = F.col(col).cast("string")
    return (
        df.where(key.isNotNull())
        .select(
            F.posexplode(
                F.array(*[_cms_bucket(key, r, width) for r in range(depth)])
            ).alias("r", "c")
        )
        .groupBy("r", "c")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def count_min_estimate(
    sketch: DataFrame, keys: DataFrame, col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """(key, est) point queries against a count_min_build sketch built
    with the SAME depth/width: each key probes its ``depth`` cells
    (left join — an absent cell is a 0 count) and takes the row-wise
    minimum. The sketch side is at most depth*width rows, so the probe
    join broadcasts it; estimates are exact-or-over, never under.
    NULL probe keys are skipped, mirroring count_min_build's NULL-skip
    (without the filter, concat_ws would hash NULL as the bare salt
    and return an arbitrary collision estimate for key=NULL)."""
    key = F.col(col).cast("string").alias("key")
    probes = keys.where(F.col(col).isNotNull()).select(key).distinct().select(
        "key",
        F.posexplode(
            F.array(*[_cms_bucket(F.col("key"), r, width) for r in range(depth)])
        ).alias("r", "c"),
    )
    return (
        probes.join(F.broadcast(sketch), ["r", "c"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long"))).alias("est"))
    )


def bloom_build(df: DataFrame, col: str, n_bits: int = 1 << 23, k: int = 7):
    """Bloom filter over a column, built distributively: each partition
    sets bits in a local packed uint8 array (vectorized double hashing
    via pandas' deterministic hash_pandas_object), partials OR together
    on the driver (n_partitions x n_bits/8 bytes — megabytes, not
    data). Returns the packed numpy array; broadcast it and probe with
    ``bloom_might_contain``. No false negatives ever; false-positive
    rate ~ (1 - e^(-kn/m))^k.
    """
    import numpy as np

    n_bytes = n_bits // 8

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bits = np.zeros(n_bytes, dtype=np.uint8)
        seen = False
        for pdf in batches:
            s = pdf[col].dropna().astype(str)
            if s.empty:
                continue
            seen = True
            h1 = pd.util.hash_pandas_object(s, index=False).to_numpy()
            h2 = pd.util.hash_pandas_object(
                s, index=False, hash_key="1234567890123457"
            ).to_numpy() | 1  # odd -> full period
            for i in range(k):
                pos = (h1 + i * h2) % n_bits
                np.bitwise_or.at(bits, pos // 8, np.uint8(1) << (pos % 8).astype(np.uint8))
        if seen:
            yield pd.DataFrame({"bits": [bits.tobytes()]})

    parts = df.select(F.col(col).cast("string").alias(col)).mapInPandas(
        partials, StructType([StructField("bits", BinaryType())])
    ).collect()
    out = np.zeros(n_bytes, dtype=np.uint8)
    for row in parts:
        out |= np.frombuffer(row.bits, dtype=np.uint8)
    return out


def bloom_might_contain(df: DataFrame, col: str, bits, k: int = 7) -> DataFrame:
    """Adds a boolean ``might_contain`` column — vectorized probe of the
    packed Bloom array, shipped to executors via a Spark broadcast (one
    copy per executor, not per task). The probed value is the SPARK
    string cast of the column — the same derivation ``bloom_build``
    hashes — so non-string columns (booleans, doubles) probe the
    identical representation on both sides; a pandas-side str() here
    would silently false-negative on them. NULLs probe False (the build
    side never inserts them)."""
    import numpy as np

    n_bits = int(bits.size) * 8
    bc = df.sparkSession.sparkContext.broadcast(bits.tobytes())
    with_str = df.withColumn("__probe_str__", F.col(col).cast("string"))
    out_schema = StructType(
        list(df.schema.fields)
        + [StructField("might_contain", BooleanType())]
    )

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        arr = np.frombuffer(bc.value, dtype=np.uint8)
        for pdf in batches:
            raw = pdf["__probe_str__"]
            nonnull = raw.notna().to_numpy()
            s = raw.fillna("").astype(str)
            h1 = pd.util.hash_pandas_object(s, index=False).to_numpy()
            h2 = pd.util.hash_pandas_object(
                s, index=False, hash_key="1234567890123457"
            ).to_numpy() | 1
            hit = nonnull.copy()
            for i in range(k):
                pos = (h1 + i * h2) % n_bits
                hit &= (arr[pos // 8] >> (pos % 8).astype(np.uint8)) & 1 == 1
            out = pdf.drop(columns=["__probe_str__"])
            out["might_contain"] = hit
            yield out

    return with_str.mapInPandas(probe, out_schema)


def hll_sliding_distinct(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    window_hours: int = 24,
    lg_k: int = 12,
) -> DataFrame:
    """(bucket, est) trailing-``window_hours`` distinct ``key_col`` per
    hourly bucket — the daily-active-users-by-hour metric — via
    MERGEABLE HLL partials: the event stream is scanned ONCE into
    |hours| hour-sketches, and each trailing window is then a union of
    at most ``window_hours`` SKETCH rows (4 KiB each at lg_k=12). The
    exact spelling rescans ``window_hours`` x the events (every event
    belongs to that many windows); the sketch spelling's cover join
    explodes only the tiny sketch relation — the sliding-window twin
    of every other mergeable sketch in this module, and the reason
    warehouses precompute HLL partials per partition.

    Buckets with no events of their own are not emitted (semi-join
    with the real hour set), matching the exact twin's semantics.
    """
    hours = df.select(
        F.date_trunc("hour", F.col(ts_col)).alias("h"),
        F.col(key_col).alias("k"),
    ).where(F.col("k").isNotNull())
    per_hour = hours.groupBy("h").agg(
        F.hll_sketch_agg(F.col("k"), F.lit(lg_k)).alias("sk")
    )
    covered = per_hour.select(
        "h",
        "sk",
        F.explode(F.sequence(F.lit(0), F.lit(window_hours - 1))).alias("i"),
    ).select(
        (F.col("h") + F.expr("make_interval(0, 0, 0, 0, i)")).alias("bucket"),
        "sk",
    )
    real = per_hour.select(F.col("h").alias("bucket"))
    return (
        covered.join(real, "bucket", "left_semi")
        .groupBy("bucket")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg(F.col("sk")))
            .cast("double")
            .alias("est")
        )
    )
