"""Dialect gap surface — documented errors instead of silences.

The reference's embedded engine accepts a few constructs Spark SQL does
not; a request for one should fail with a *product decision*, not a raw
parser error (VERDICT r1 "What's missing" #8). Only genuinely
unsupported constructs belong here — recursive CTEs, assumed a gap in
SURVEY §2.2, actually work on Spark >= 4.0 and are a supported query
(queries/relational.py cte_recursive), so they are NOT listed.
"""

from __future__ import annotations

import re


class UnsupportedSqlError(Exception):
    """A construct the engine deliberately does not support."""


#: (pattern, documented message) — checked before handing SQL to Spark.
_GAPS: list[tuple[re.Pattern[str], str]] = [
    (
        re.compile(r"\bGROUPS\s+BETWEEN\b|\bGROUPS\s+\d+\s+PRECEDING\b", re.I),
        "GROUPS window frames are not supported: Spark SQL implements ROWS "
        "and RANGE frames only (SURVEY §2.5). Rewrite over peer groups: "
        "dense_rank() to number peer groups, then a RANGE frame on that "
        "rank reproduces GROUPS BETWEEN n PRECEDING AND CURRENT ROW.",
    ),
]


def check_dialect(sql: str) -> None:
    """Raise UnsupportedSqlError with a documented message when the
    statement uses a known engine gap; no-op otherwise."""
    for pattern, message in _GAPS:
        if pattern.search(sql):
            raise UnsupportedSqlError(message)
