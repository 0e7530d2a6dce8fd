"""Session and catalog bootstrap.

Parity target: the reference's context builder ``build_ctx``
(/root/reference/src/lib.rs:21-60) — it builds a session with default
features (lib.rs:27-31), registers the synthetic ``types`` in-memory table
(lib.rs:36-56), registers a CSV table ``test`` with header + schema
inference (lib.rs:57-58), and registers the custom sum UDAFs
(lib.rs:53-55).

Spark-first mapping:
- session w/ default features -> ``SparkSession`` with AQE + Arrow enabled
- MemTable                    -> cached DataFrame + temp view
- CSV registration            -> ``spark.read.csv(header=True, inferSchema=True)``
- ``register_udaf``           -> ``spark.udf.register`` of pandas-UDF aggregates

Scale notes: the synthetic ``types`` generator is fully distributed
(``spark.range`` + hash-derived columns, no driver-side materialization),
so a 10^9-row table is as cheap to declare as the reference's 10^6.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Tables the driver materializes at /root/testdata/sf*/ (TESTDATA.md).
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Dimension tables with FIXED cardinality (5 / 25 rows at every scale
#: factor) — safe to broadcast-hint unconditionally. customer/supplier/
#: part grow with sf, so they are left to AQE + autoBroadcastJoinThreshold
#: which sees their actual size at runtime.
BROADCAST_TABLES = {"region", "nation"}


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition UP when the input has fewer partitions than cores.

    A small table read from one parquet file arrives as one partition and
    would serialize every downstream operator onto a single task; at real
    scale inputs already carry hundreds of splits and this is a no-op
    (the partition count check costs only plan analysis, no job).
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def get_spark(
    app_name: str = "datafusion-gpu-spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned like the reference's session.

    Mirrors ``SessionStateBuilder::new().with_default_features()``
    (src/lib.rs:27-31): everything the engine offers is on by default —
    AQE (runtime re-planning), Arrow-vectorized Python boundary with the
    reference's 8192 batch size (DataFusion's default batch size), UTC
    session time zone for deterministic timestamp semantics.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # local mode = ONE JVM for driver + all executor threads. Left unset,
    # spark.driver.memory defaults to 1g — 32 threads starving in a 1 GiB
    # heap (measured: GCLocker allocation stalls and lost spill files on
    # 50k-doc dedup). But BIGGER IS NOT BETTER: at 48g, G1's adaptive
    # young gen grows to tens of GB and every query pays long evacuation
    # pauses (measured: the same 200k-doc dedup probe ran 5.8x SLOWER at
    # 48g than at 8g — 243.7s vs 42.1s). 8g clears the stall regime while
    # keeping young-gen pauses short.
    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.driver.memory", mem)
        .config("spark.driver.maxResultSize", "4g")
        .master(master or f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "8192")
        .config("spark.sql.session.timeZone", "UTC")
        # Session-wide, set once at build (not as a read side effect):
        # TESTDATA parquet carries TIMESTAMP(NANOS), which Spark otherwise
        # rejects; read_parquet rebuilds proper timestamps from the longs.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def make_types_df(spark: SparkSession, length: int = 1024, seed: int = 42) -> DataFrame:
    """Distributed, deterministic clone of the reference's ``types`` table.

    Schema per src/lib.rs:36-40 (``string`` Utf8, ``float`` Float32,
    ``int`` Int32, all non-null); generators per src/lib.rs:62-75
    (one random lowercase letter; uniform f32 in [0,1); full-range i32).

    Uses ``spark.range`` + xxhash64-derived columns instead of driver-side
    RNG: deterministic for a given (length, seed), identical across
    partitionings, and never materializes on the driver — a 10^9-row table
    stays a lazy plan.
    """
    two31 = 2**31
    df = spark.range(0, length)
    h = lambda salt: F.xxhash64(F.col("id"), F.lit(seed), F.lit(salt))  # noqa: E731
    return df.select(
        F.char(F.pmod(h(1), F.lit(26)) + 97).alias("string"),
        (F.pmod(h(2), F.lit(1 << 24)) / F.lit(float(1 << 24)))
        .cast("float")
        .alias("float"),
        (F.pmod(h(3), F.lit(2**32)) - two31).cast("int").alias("int"),
    )


def _ns_timestamp_columns(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS) — read from the footer
    only (no data IO), so this stays O(1) regardless of table size."""
    import pyarrow.parquet as pq
    import pyarrow as pa

    schema = pq.read_schema(path)
    return [
        f.name
        for f in schema
        if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
    ]


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Parquet scan that tolerates nanosecond timestamps.

    Spark rejects TIMESTAMP(NANOS) columns outright; we read them as raw
    int64 nanos (``spark.sql.legacy.parquet.nanosAsLong``) and rebuild the
    timestamp with integer ``div`` arithmetic (a double division would lose
    precision above 2^53 ns). The cast is a cheap projected expression —
    pushdown/pruning on other columns is unaffected.
    """
    ns_cols = _ns_timestamp_columns(path)
    if not ns_cols:
        return spark.read.parquet(path)
    # normally already set at session build (get_spark); repeated here so
    # externally-built sessions (e.g. the driver's) read ns files too
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in ns_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


#: Per-session cache of constructed parquet-scan DataFrames, keyed by
#: id(session) -> (session ref, {path: DataFrame}). A DataFrame
#: is an immutable lazy plan, so reusing one across register_tables
#: calls is semantically identical to rebuilding it — but rebuilding
#: costs ~65 ms per table (spark.read.parquet re-lists files and
#: re-reads footers every call), which at 10 tables made every load()
#: pay ~0.65 s of pure re-registration overhead per QUERY invocation
#: (measured round 10: it dominated several ~1 s bench medians). The
#: session ref keeps id() stable while the entry lives; STOPPED
#: sessions are swept on every cache touch, so a long-lived process
#: cycling many sessions cannot accrete dead JVM-backed plans (a weak
#: dict would not help — the cached DataFrames strongly reference
#: their session, so liveness has to be probed, not inferred from
#: refcounts). The cached plan captures the file listing at
#: construction, so the testdata files must be static for the
#: session's lifetime; callers that rewrite parquet at a cached path
#: mid-session must call :func:`clear_scan_cache` first. View
#: registration itself is NOT cached — every load() still re-issues
#: createOrReplaceTempView, so tests that shadow a table see it
#: restored exactly as before.
_SCAN_CACHE: dict[int, tuple[SparkSession, dict[str, DataFrame]]] = {}


def clear_scan_cache(spark: SparkSession | None = None, path: str | None = None) -> None:
    """Drop cached scan plans: everything (no args), one session, or one
    (session, path). Required before re-reading a parquet path whose
    files were REWRITTEN mid-session — the cached plan holds the old
    file listing."""
    if spark is None:
        _SCAN_CACHE.clear()
        return
    entry = _SCAN_CACHE.get(id(spark))
    if entry is None or entry[0] is not spark:
        return
    if path is None:
        del _SCAN_CACHE[id(spark)]
    else:
        entry[1].pop(path, None)


def _session_stopped(session: SparkSession) -> bool:
    # SparkContext.stop() nulls _jsc; any probe error means unusable too
    try:
        return session._sc._jsc is None  # type: ignore[attr-defined]
    except Exception:
        return True


def _cached_scan(spark: SparkSession, path: str) -> DataFrame:
    for key in [
        k for k, (s, _) in _SCAN_CACHE.items() if s is not spark and _session_stopped(s)
    ]:
        del _SCAN_CACHE[key]
    entry = _SCAN_CACHE.get(id(spark))
    if entry is None or entry[0] is not spark:
        entry = (spark, {})
        _SCAN_CACHE[id(spark)] = entry
    dfs = entry[1]
    if path not in dfs:
        dfs[path] = read_parquet(spark, path)
    return dfs[path]


def register_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register the driver's parquet star schema as temp views.

    Equivalent of the reference's ``ctx.register_table``/``register_csv``
    calls (src/lib.rs:56-58), pointed at TESTDATA.md's parquet files.
    Session time zone is pinned to UTC first so timestamp values have one
    deterministic meaning end-to-end (the files carry naive timestamps).
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    out: dict[str, DataFrame] = {}
    for name in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = _cached_scan(spark, path)
        if name in BROADCAST_TABLES:
            # hint survives into every SQL/DataFrame use of the view, so
            # fixed-size dims broadcast regardless of threshold config
            df = F.broadcast(df)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def register_test_csv(spark: SparkSession, path: str) -> DataFrame:
    """Register a CSV file as table ``test`` with header + inference.

    Parity with ``ctx.register_csv("test", …, CsvReadOptions::default())``
    (src/lib.rs:57-58): header row, inferred schema.
    """
    df = spark.read.csv(path, header=True, inferSchema=True)
    df.createOrReplaceTempView("test")
    return df


def build_ctx(
    spark: SparkSession | None = None,
    types_table_length: int = 1024,
    seed: int = 42,
    test_csv: str | None = None,
    sf_dir: str | None = None,
) -> SparkSession:
    """Full engine bootstrap — the Spark spelling of src/lib.rs:21-60.

    Registers: the synthetic ``types`` view, the ``test`` CSV view (when a
    path is given), the custom sum aggregates (``sum_arrow``,
    ``sum_arrow_cpu``, reference-name aliases ``sum_cudarc``/``sum_cubecl``),
    and optionally the TESTDATA star schema.
    """
    from datafusion_gpu_spark.aggregates import register_aggregates

    spark = spark or get_spark()
    make_types_df(spark, types_table_length, seed).createOrReplaceTempView("types")
    if test_csv:
        register_test_csv(spark, test_csv)
    if sf_dir:
        register_tables(spark, sf_dir)
    register_aggregates(spark)
    return spark
