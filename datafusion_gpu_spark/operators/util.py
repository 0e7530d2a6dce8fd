"""Shared operator utilities."""

from __future__ import annotations

from collections.abc import Callable

from pyspark import SparkContext
from pyspark.sql import DataFrame


def lineage_truncator(sc: SparkContext) -> Callable[[DataFrame], DataFrame]:
    """The iterative operators' per-round lineage cut, chosen once per
    call: with a checkpoint dir configured (``setCheckpointDir`` — the
    cluster spelling) rounds use reliable ``checkpoint`` (fault-tolerant
    across executor loss); otherwise ``localCheckpoint`` (executor-local
    storage, right for local mode, lost if an executor dies). ONE shared
    policy — connected components, PageRank, and any future iterative
    operator must not drift on this decision."""
    if sc.getCheckpointDir():
        return lambda df: df.checkpoint(eager=True)
    return lambda df: df.localCheckpoint(eager=True)
