"""Golden/oracle end-to-end tests (SURVEY §5.2 item 1): every registry
query runs on Spark and, when it has a DuckDB oracle, must match it
exactly after normalization. This is the local twin of the driver's
CORRECTNESS gate, at sf0.001."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry
from tests.conftest import SF_DIR

QUERIES = entry.queries()
ORACLES = entry.oracle_sql()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck):
    from pyspark.sql.types import DecimalType

    from tools.check_oracle import compare

    df = QUERIES[name](spark, SF_DIR)
    # VERDICT r13 #3: the driver hash is string-level, so a Spark
    # DecimalType output (`Decimal('0.010000')`) is one data change away
    # from hash-red even when it currently prints like the double. No
    # registry query may emit a top-level Decimal column.
    decimal_cols = [
        f.name for f in df.schema.fields if isinstance(f.dataType, DecimalType)
    ]
    assert not decimal_cols, (
        f"{name}: DecimalType output columns {decimal_cols} — cast to "
        f"DOUBLE/BIGINT in the query spelling"
    )
    sdf = df.toPandas()
    if name not in ORACLES:
        # rows-only entries (approximate aggs, EXPLAIN text): must run
        assert len(sdf) >= 0
        return
    ddf = duck.execute(ORACLES[name]).df()
    problems = compare(sdf, ddf)
    # same soft class as check_oracle.main: integer-width dtype notes only
    hard = [p for p in problems if ": dtype spark=" not in p]
    assert not hard, f"{name}: {hard}"
