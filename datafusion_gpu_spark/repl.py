"""CLI + interactive SQL REPL — the engine's human entry point.

Mirrors the reference's ``src/main.rs``:

- positional SQL argument -> one-shot mode (main.rs:13-14, 36-43);
- ``--len/-l`` sizes the synthetic ``types`` table (main.rs:16-17,
  default 1024);
- no argument -> interactive prompt ``>> `` with a persistent history
  file ``.history.txt`` (main.rs:33-34, 50);
- exit words ``q | exit | quit`` (main.rs:51-53);
- a failing query prints the error and the loop continues — it never
  crashes the session (main.rs:54-60);
- every query prints the result table and ``Total execution time: …``
  (main.rs:39-41, 62-65).

Usage::

    python -m datafusion_gpu_spark "SELECT sum_arrow_cpu(float) FROM types"
    python -m datafusion_gpu_spark -l 1000000          # interactive
"""

from __future__ import annotations

import argparse
import os
import sys
import time

from pyspark.sql import SparkSession

HISTORY_FILE = ".history.txt"
EXIT_WORDS = {"q", "exit", "quit"}
#: rows printed per result — the reference's df.show() prints everything,
#: which is impractical for a distributed result; cap and say so.
SHOW_ROWS = 100


def build_session(types_len: int = 1024, sf_dir: str | None = None) -> SparkSession:
    """The ``build_ctx::<Runtime>(&opts)`` analogue (main.rs:29-31)."""
    from datafusion_gpu_spark.context import build_ctx, get_spark

    spark = get_spark("datafusion-gpu-spark-repl")
    spark.sparkContext.setLogLevel("ERROR")
    build_ctx(
        spark,
        types_table_length=types_len,
        sf_dir=sf_dir or os.environ.get("SPARK_GRAFT_SF_DIR"),
    )
    return spark


def run_sql(spark: SparkSession, sql: str, out=sys.stdout) -> bool:
    """Execute one statement: print table + wall-clock, swallow errors.

    Returns True when the statement executed, False when it errored —
    either way the caller keeps the session (main.rs:54-60).
    """
    try:
        from datafusion_gpu_spark.dialect import (
            check_dialect,
            rewrite_qualify,
            rewrite_reference_sums,
        )

        check_dialect(sql)
        # reference-named custom sums plan as JVM two-phase aggregation
        # (identical f32 semantics, no single-shot Python group shipping)
        scalable = rewrite_reference_sums(sql)
        if scalable is not None:
            sql = scalable
        rewritten = rewrite_qualify(sql)
        df = spark.sql(rewritten if rewritten is not None else sql)
        if rewritten is not None:
            df = df.drop("__qualify__")
        t0 = time.perf_counter()
        rows = df.limit(SHOW_ROWS + 1).collect()
        elapsed = time.perf_counter() - t0
        truncated = len(rows) > SHOW_ROWS
        shown = rows[:SHOW_ROWS]
        print(_format_table(df.columns, shown), file=out)
        if truncated:
            print(f"(output truncated at {SHOW_ROWS} rows)", file=out)
        print(f"Total execution time: {elapsed:.6f}s\n", file=out)
        return True
    except Exception as exc:  # error-print-and-continue (main.rs:56-59)
        print(f"Error: {exc}", file=out)
        return False


def _format_table(columns: list[str], rows) -> str:
    """ASCII table like df.show(): computed from already-collected rows
    so the query runs exactly once."""
    cells = [[_fmt(v) for v in row] for row in rows]
    widths = [
        max([len(c)] + [len(r[i]) for r in cells]) for i, c in enumerate(columns)
    ]
    sep = "+" + "+".join("-" * (w + 2) for w in widths) + "+"
    def line(vals):
        return "|" + "|".join(f" {v:<{w}} " for v, w in zip(vals, widths)) + "|"
    body = [line(r) for r in cells]
    return "\n".join([sep, line(columns), sep] + body + [sep])


def _fmt(v) -> str:
    if v is None:
        return "NULL"
    return str(v)


def interact(spark: SparkSession) -> None:
    """The rustyline loop (main.rs:33-78): prompt, history, exit words."""
    try:
        import readline
    except Exception:
        readline = None
    if readline is not None and os.path.exists(HISTORY_FILE):
        try:
            readline.read_history_file(HISTORY_FILE)
        except Exception:
            pass  # unreadable history must not disable SAVING history
    try:
        while True:
            try:
                line = input(">> ")
            except EOFError:  # Ctrl-D (main.rs:72-75)
                print("CTRL-D")
                break
            except KeyboardInterrupt:  # Ctrl-C (main.rs:68-71)
                print("CTRL-C")
                break
            stripped = line.strip()
            if not stripped:
                continue
            if stripped.lower() in EXIT_WORDS:
                break
            run_sql(spark, stripped)
    finally:
        if readline is not None:
            try:
                readline.write_history_file(HISTORY_FILE)
            except Exception:
                pass


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(
        prog="datafusion_gpu_spark",
        description="PySpark-native SQL engine (reference-parity CLI)",
    )
    parser.add_argument("sql", nargs="?", help="one-shot SQL statement")
    parser.add_argument(
        "-l", "--len", type=int, default=1024, dest="types_len",
        help="row count of the synthetic `types` table (default 1024)",
    )
    parser.add_argument(
        "--sf-dir", default=None,
        help="testdata dir to register as the star schema (or $SPARK_GRAFT_SF_DIR)",
    )
    args = parser.parse_args(argv)

    spark = build_session(args.types_len, args.sf_dir)
    if args.sql is not None:
        ok = run_sql(spark, args.sql)
        return 0 if ok else 1
    interact(spark)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
