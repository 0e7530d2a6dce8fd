"""Shared operator utilities."""

from __future__ import annotations

from collections.abc import Callable

from pyspark import SparkContext
from pyspark.sql import DataFrame


def stats_barrier(df: DataFrame) -> DataFrame:
    """Rebuild ``df`` on its own (already materialized) internal RDD,
    DROPPING the logical plan's inherited size statistics.

    Why this exists: ``checkpoint``/``localCheckpoint`` truncate the
    plan but PRESERVE the origin plan's Catalyst ``sizeInBytes`` (a
    BigInt). Catalyst's join-size visitor multiplies children's sizes,
    so an iterative operator whose round references the previous
    round's checkpoint in k >= 2 join branches compounds the stat
    GEOMETRICALLY: digits(r) ~ 19 * k^r, and after ~a dozen rounds the
    driver spends minutes in BigInteger.multiply (Toom-Cook range)
    just *estimating* plan sizes — measured on louvain pass 3/round 1:
    87 s of pure stats arithmetic on a 43k-edge graph (jstack:
    SizeInBytesOnlyStatsPlanVisitor.visitJoin -> BigInt product).
    Linear-chain iteratives (pagerank, components, bellman_ford) only
    grow the stat ~19 digits/round and never feel it.

    The barrier costs nothing at runtime (reuses the checkpointed
    RDD); its one side effect is that the relation's size becomes the
    default (8 EiB), so Catalyst will never AUTO-broadcast it — use it
    in operators that broadcast-hint explicitly."""
    spark = df.sparkSession
    jdf = df._jdf
    new_jdf = spark._jsparkSession.internalCreateDataFrame(
        jdf.queryExecution().toRdd(), jdf.schema(), False
    )
    return DataFrame(new_jdf, spark)


def lineage_truncator(
    sc: SparkContext, reset_stats: bool = False
) -> Callable[[DataFrame], DataFrame]:
    """The iterative operators' per-round lineage cut, chosen once per
    call: with a checkpoint dir configured (``setCheckpointDir`` — the
    cluster spelling) rounds use reliable ``checkpoint`` (fault-tolerant
    across executor loss); otherwise ``localCheckpoint`` (executor-local
    storage, right for local mode, lost if an executor dies). ONE shared
    policy — connected components, PageRank, and any future iterative
    operator must not drift on this decision.

    ``reset_stats=True`` additionally applies :func:`stats_barrier`
    after the cut — REQUIRED for operators whose round references the
    previous checkpoint in multiple join branches (see stats_barrier's
    geometric-compounding note); leave False where auto-broadcast of
    small checkpointed relations is wanted."""
    if sc.getCheckpointDir():
        cut = lambda df: df.checkpoint(eager=True)  # noqa: E731
    else:
        cut = lambda df: df.localCheckpoint(eager=True)  # noqa: E731
    if reset_stats:
        return lambda df: stats_barrier(cut(df))
    return cut


def scale_truncator(sc: SparkContext) -> Callable[[DataFrame], DataFrame]:
    """Materialization gate for relations whose checkpoint is a REUSE
    optimization, not a correctness/planner need (contrast
    :func:`lineage_truncator`, whose cut iterative operators require
    unconditionally).

    With a checkpoint dir configured (the cluster spelling) the relation
    is reliably checkpointed: at scale, re-running a data-sized
    construction once per consuming join branch dwarfs one write.
    WITHOUT one (local mode — the bench/driver profile) this is the
    IDENTITY: the r15 driver bench measured the eager localCheckpoint
    variants of cox_ph (+25%) and hits (+15%) SLOWER at sf0.1 than the
    lazy spellings, because the extra synchronous job + pinned blocks
    cost more than the re-execution they remove — AQE exchange reuse
    already collapses the repeated data-sized exchange in-plan, and the
    residual per-branch work (window over distinct durations, broadcast
    join fan-in) is scheduling-floor-bound at that size."""
    if sc.getCheckpointDir():
        return lambda df: df.checkpoint(eager=True)
    return lambda df: df
