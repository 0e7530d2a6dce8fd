"""Python UDTFs (SURVEY §2.10 row: the table-function registration
surface — the engine's third user-function kind after scalar shims and
the pandas UDAFs). Row-at-a-time Python: demo surface, not the hot path
(the codegen spelling of the same expansion is explode/LATERAL VIEW,
queries/scalar_fns.py fn_unnest_wordcount).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="word string, wlen int")
class SplitWords:
    """One output row per whitespace-delimited word, with its length;
    empty tokens (from repeated spaces) are dropped."""

    def eval(self, text: str):  # noqa: D102
        for w in (text or "").split(" "):
            if w:
                yield (w, len(w))


def register_udtfs(spark: SparkSession) -> None:
    """SQL-name registration so table functions work from plain SQL —
    the ctx.sql()-reachability bar the reference sets for every surface."""
    spark.udtf.register("split_words", SplitWords)
