"""Name-gap shims for DataFusion scalar functions missing a Spark namesake.

Each helper returns a Column built purely from built-in functions, so it
stays inside whole-stage codegen (no Python in the hot path). SURVEY §2.7
lists the full pack mapping; everything else is a direct Spark built-in.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_EPOCH = "1970-01-01 00:00:00"


def _col(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


def date_bin(width_seconds: int, ts: str | Column, origin: str = _EPOCH) -> Column:
    """DataFusion ``date_bin(interval, ts, origin)`` — floor ``ts`` into
    fixed-width bins anchored at ``origin`` (DuckDB: ``time_bucket``).

    Implemented with integer micros arithmetic on built-ins, so it is
    exact, codegen-friendly, and partition-pruning-compatible when used
    against a literal.
    """
    width_us = int(width_seconds) * 1_000_000
    # NTZ-safe: unix_micros only accepts TIMESTAMP, so round-trip through it
    # (session tz is pinned UTC by register_tables, so the casts are no-ops
    # on the wall-clock value) and emit TIMESTAMP_NTZ to match the source.
    ts_us = F.unix_micros(_col(ts).cast("timestamp"))
    origin_us = F.unix_micros(F.lit(origin).cast("timestamp"))
    binned = origin_us + F.floor((ts_us - origin_us) / width_us) * width_us
    return F.timestamp_micros(binned.cast("long")).cast("timestamp_ntz")


def strpos(s: str | Column, substr: str) -> Column:
    """DataFusion/Postgres ``strpos(string, substring)`` — 1-based index,
    0 when absent. Spark spells it ``instr``/``locate``."""
    return F.instr(_col(s), substr)


def arrow_typeof(c: str | Column) -> Column:
    """DataFusion ``arrow_typeof`` — the engine-level type name of an
    expression. Spark spelling: ``typeof``."""
    return F.typeof(_col(c))
