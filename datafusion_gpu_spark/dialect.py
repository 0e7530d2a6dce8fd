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


def _strip_comments(sql: str) -> str:
    """Replace ``-- ...\\n`` and ``/* ... */`` comment spans with a
    space, skipping string literals and quoted identifiers (a '--'
    inside a string is data, not a comment). Run BEFORE any rewrite:
    splicing a commented segment into a generated single-line statement
    would let the '--' comment out the closing parenthesis."""
    out = []
    i, n = 0, len(sql)
    while i < n:
        ch = sql[i]
        if ch in "'\"`":
            j = i + 1
            while j < n and sql[j] != ch:
                j += 1
            out.append(sql[i : j + 1])
            i = j + 1
            continue
        if sql.startswith("--", i):
            j = sql.find("\n", i)
            i = n if j == -1 else j  # keep the newline itself
            out.append(" ")
            continue
        if sql.startswith("/*", i):
            j = sql.find("*/", i + 2)
            i = n if j == -1 else j + 2
            out.append(" ")
            continue
        out.append(ch)
        i += 1
    return "".join(out)


def check_dialect(sql: str) -> None:
    """Raise UnsupportedSqlError with a documented message when the
    statement uses a known engine gap; no-op otherwise. Comments are
    stripped first so prose mentioning a gap doesn't trigger it."""
    stripped = _strip_comments(sql)
    for pattern, message in _GAPS:
        if pattern.search(stripped):
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
_SET_OP = re.compile(r"\b(UNION|INTERSECT|EXCEPT)\b", re.I)


def _top_level_spans(sql: str, pattern: re.Pattern[str]) -> list[re.Match[str]]:
    """Matches of ``pattern`` at parenthesis depth 0, outside string
    literals, quoted identifiers (backtick/double-quote), and SQL
    comments (``-- ...\\n`` and ``/* ... */``) — a QUALIFY inside a
    comment is prose, not syntax. Doubled quotes inside a literal
    (``'it''s'``) scan as close-then-reopen, which is equivalent."""
    out = []
    depth = 0
    i = 0
    n = len(sql)
    while i < n:
        ch = sql[i]
        if ch in "'\"`":
            i += 1
            while i < n and sql[i] != ch:
                i += 1
            i += 1
            continue
        if ch == "-" and sql.startswith("--", i):
            j = sql.find("\n", i)
            i = n if j == -1 else j + 1
            continue
        if ch == "/" and sql.startswith("/*", i):
            j = sql.find("*/", i + 2)
            i = n if j == -1 else j + 2
            continue
        if ch == "(":
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
    sql = _strip_comments(sql)  # a comment spliced into the generated
    # single-line statement would comment out the closing parenthesis
    matches = _top_level_spans(sql, _QUALIFY_KEYWORD)
    if not matches:
        return None
    if _top_level_spans(sql, _SET_OP):
        # QUALIFY binds to one branch of a set operation; wrapping the whole
        # statement would filter the combined result instead. A documented
        # error beats silently-wrong semantics or a confusing parse failure.
        raise UnsupportedSqlError(
            "QUALIFY combined with a top-level set operation (UNION/"
            "INTERSECT/EXCEPT) is not supported: wrap the QUALIFY branch "
            "in a parenthesized subquery and apply the set operation over it."
        )
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
