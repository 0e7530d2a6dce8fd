"""Local mirror of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB at the same scale factor, normalizes both
results (columns sorted by name, rows sorted by all values), and compares
exactly. Exit code != 0 on any mismatch.

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import sys
import time
import traceback

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


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
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


def compare(spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    a, b = normalize(spark_df), normalize(duck_df)
    if list(a.columns) != list(b.columns):
        return [f"columns differ: spark={list(a.columns)} duck={list(b.columns)}"]
    if len(a) != len(b):
        return [f"row count differs: spark={len(a)} duck={len(b)}"]
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
            av64 = av.astype(np.float64)
            bv64 = bv.astype(np.float64)
            both_nan = pd.isna(av64) & pd.isna(bv64)
            eq = (av64 == bv64) | both_nan
            if not eq.all():
                idx = int(np.argmin(eq))
                diff = np.nanmax(np.abs(av64 - bv64))
                problems.append(
                    f"col {c}: {int((~eq).sum())} float mismatches, "
                    f"max|diff|={diff:.3e}, first at row {idx}: "
                    f"spark={av[idx]!r} duck={bv[idx]!r}"
                )
        else:
            eq = (pd.Series(av) == pd.Series(bv)) | (pd.isna(av) & pd.isna(bv))
            if not eq.all():
                idx = int(np.argmin(eq.to_numpy()))
                problems.append(
                    f"col {c}: {int((~eq).sum())} mismatches, first at row {idx}: "
                    f"spark={av[idx]!r} duck={bv[idx]!r}"
                )
    # dtype visibility (not a hard failure, but the driver may hash schemas)
    for c in a.columns:
        if str(a[c].dtype) != str(b[c].dtype):
            problems.append(f"col {c}: dtype spark={a[c].dtype} duck={b[c].dtype}")
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
        hard = [p for p in problems if not p.startswith("col ") or "dtype" not in p]
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
