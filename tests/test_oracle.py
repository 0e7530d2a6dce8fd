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
    from tools.check_oracle import compare

    sdf = QUERIES[name](spark, SF_DIR).toPandas()
    if name not in ORACLES:
        # rows-only entries (approximate aggs, EXPLAIN text): must run
        assert len(sdf) >= 0
        return
    ddf = duck.execute(ORACLES[name]).df()
    problems = compare(sdf, ddf)
    hard = [p for p in problems if "dtype" not in p]
    assert not hard, f"{name}: {hard}"
