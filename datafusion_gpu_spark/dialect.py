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


# -- QUALIFY rewrite ---------------------------------------------------------
#
# DuckDB/Snowflake-style QUALIFY (filter on window results without a
# subquery) is not Spark SQL syntax; rather than a documented error, it
# admits an exact REWRITE: evaluate the predicate as a generated column
# over the query's result set — which is precisely the relation QUALIFY's
# window functions are defined over — then filter and drop it. Contract:
# the predicate may reference the query's OUTPUT columns (aliases
# included) and window expressions over them; a trailing ORDER BY / LIMIT
# stays outside the rewrite, preserving its post-QUALIFY placement.

_QUALIFY_KEYWORD = re.compile(r"\bQUALIFY\b", re.I)
_TRAILING = re.compile(r"\b(ORDER\s+BY|LIMIT)\b", re.I)


def _top_level_spans(sql: str, pattern: re.Pattern[str]) -> list[re.Match[str]]:
    """Matches of ``pattern`` at parenthesis depth 0 (outside strings)."""
    out = []
    depth = 0
    in_str: str | None = None
    i = 0
    while i < len(sql):
        ch = sql[i]
        if in_str:
            if ch == in_str:
                in_str = None
        elif ch in "'\"":
            in_str = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0:
            m = pattern.match(sql, i)
            if m:
                out.append(m)
                i = m.end()
                continue
        i += 1
    return out


def rewrite_qualify(sql: str) -> str | None:
    """Rewrite a top-level QUALIFY clause into the windowed-subquery
    spelling Spark executes; return None when the statement has no
    top-level QUALIFY. The caller drops the ``__qualify__`` column."""
    matches = _top_level_spans(sql, _QUALIFY_KEYWORD)
    if not matches:
        return None
    m = matches[0]
    inner = sql[: m.start()].rstrip().rstrip(";")
    rest = sql[m.end() :]
    trailing = ""
    t = _top_level_spans(rest, _TRAILING)
    if t:
        trailing = rest[t[0].start() :].rstrip().rstrip(";")
        rest = rest[: t[0].start()]
    predicate = rest.strip().rstrip(";")
    return (
        f"SELECT * FROM (SELECT __q.*, ({predicate}) AS __qualify__ "
        f"FROM ({inner}) AS __q) WHERE __qualify__ {trailing}"
    )
