"""Custom source extension point — the Spark 4 Python Data Source API.

The reference registers custom in-memory table providers with its engine
(SURVEY §2.1: the synthetic `types` MemTable, /root/reference/src/main.rs
table registration); this module is the Spark spelling of that extension
point: a pure-Python DataSource whose reader declares InputPartitions, so
the scan executes IN PARALLEL on executors — a real distributed source,
not a driver-side createDataFrame.

The generator is deterministic from (row id, portable md5 hash), so a
SQL oracle replays every row without the source being SQL at all.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


def _bucket(i: int) -> int:
    """Portable md5-prefix bucket — identical to curation._hash_bucket's
    family: DuckDB replays it as
    CAST('0x' || substring(md5(CAST(i AS VARCHAR)), 1, 15) AS BIGINT) % 100."""
    return int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) % 100


class SynthReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.parts = int(options.get("parts", 8))

    def partitions(self):
        step = -(-self.n // self.parts)  # ceil
        return [
            _Range(lo, min(self.n, lo + step)) for lo in range(0, self.n, step)
        ]

    def read(self, partition: _Range):
        for i in range(partition.start, partition.end):
            b = _bucket(i)
            yield (i, b, b / 100.0)


class SynthDataSource(DataSource):
    """``spark.read.format("dgs_synth").option("n", N).load()`` —
    deterministic (id, bucket, val) rows, generated executor-side."""

    @classmethod
    def name(cls) -> str:
        return "dgs_synth"

    def schema(self) -> str:
        return "id bigint, bucket int, val double"

    def reader(self, schema) -> SynthReader:
        return SynthReader(self.options)

    def streamReader(self, schema) -> "SynthStreamReader":
        return SynthStreamReader(self.options)


def register_python_sources(spark) -> None:
    """Idempotent registration of the package's Python data sources."""
    spark.dataSource.register(SynthDataSource)


class SynthStreamReader(DataSourceStreamReader):
    """Streaming half of the same source (Spark 4
    ``DataSourceStreamReader``): offsets are row positions, each trigger
    advances by ``batch_rows``, and every micro-batch's offset range
    splits into InputPartitions — so even the STREAM scan is
    executor-parallel, not a driver loop. Rows are the same
    deterministic (id, bucket, val) triples as the batch reader, so one
    SQL oracle grades both spellings."""

    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.parts = int(options.get("parts", 8))
        self.batch_rows = int(options.get("batch_rows", 250))
        self._latest = 0

    def initialOffset(self):
        return {"pos": 0}

    def latestOffset(self):
        self._latest = min(self.n, self._latest + self.batch_rows)
        return {"pos": self._latest}

    def partitions(self, start, end):
        lo, hi = start["pos"], end["pos"]
        # restart resilience: a fresh reader instance starts its counter
        # at 0, but a checkpointed query may hand us ranges beyond it —
        # fast-forward so latestOffset never re-plans committed rows
        self._latest = max(self._latest, hi)
        step = max(1, -(-(hi - lo) // self.parts))
        return [_Range(a, min(hi, a + step)) for a in range(lo, hi, step)]

    def read(self, partition: _Range):
        for i in range(partition.start, partition.end):
            b = _bucket(i)
            yield (i, b, b / 100.0)

    def commit(self, end):
        self._latest = max(self._latest, end["pos"])

    def stop(self):
        pass
