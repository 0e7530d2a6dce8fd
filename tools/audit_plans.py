"""Physical-plan audit over the whole query catalog.

For every ``queries()`` entry, builds the executed plan at the given sf
and counts the operators that determine 100 TB behavior: shuffle
Exchanges, broadcast exchanges/joins, sort-merge joins, nested-loop
joins, whole-stage-codegen spans, parquet pushed filters, and Python
boundaries (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas).

Usage: python tools/audit_plans.py [sf_dir] [query ...]
Output: one TSV line per query + a summary; exit 0 always (it's a
reporting tool — the hard assertions live in tests/test_plans.py).
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

COUNTERS = {
    "shuffles": r"Exchange (?:hash|range|Single)",
    "bcast": r"BroadcastExchange",
    "bhj": r"BroadcastHashJoin",
    "smj": r"SortMergeJoin",
    "bnlj": r"BroadcastNestedLoopJoin",
    "cartesian": r"CartesianProduct",
    # executedPlan().toString() marks codegen stages with "*(n) " prefixes
    "codegen": r"\*\(\d+\)",
    "python": r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas|BatchEvalPython",
}


def audit(plan: str) -> dict[str, int]:
    counts = {k: len(re.findall(pat, plan)) for k, pat in COUNTERS.items()}
    counts["pushed"] = 1 if re.search(r"PushedFilters: \[[^\]]", plan) else 0
    return counts


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from datafusion_gpu_spark.context import get_spark

    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")

    cols = ["query", *COUNTERS.keys(), "pushed"]
    print("\t".join(cols))
    totals = {k: 0 for k in cols[1:]}
    n = 0
    for name, fn in sorted(entry.queries().items()):
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001 — report and continue
            print(f"{name}\tERROR: {type(exc).__name__}")
            continue
        counts = audit(plan)
        n += 1
        for k, v in counts.items():
            totals[k] += v
        print(name + "\t" + "\t".join(str(counts[k]) for k in cols[1:]))
    print(
        f"# {n} queries | " + " ".join(f"{k}={v}" for k, v in totals.items())
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
