"""Iterative graph analytics beyond connected components: PageRank.

Training-data pipelines use link-graph centrality as a document-quality
prior (the CommonCrawl crawl frontier is harmonic-centrality ranked, and
"quality weighting by inlink authority" is a standard corpus-curation
signal). Connected components (dedup.connected_components) answers
"which docs are the same"; PageRank answers "which nodes matter".

Spark-first shape, same contract as the components operator:

- the deduped edge list and the node/out-degree relation are each
  materialized ONCE (two setup jobs total: one edge distinct, one
  shuffle producing both the node set and out-degrees) and reused by
  all iterations — per-round cost is one equality join on ``src`` plus
  one hash aggregation on ``dst``, both O(|E|) at most;
- iteration count is FIXED (power iteration to a chosen depth), so
  lineage depth is bounded; each round still truncates lineage via
  checkpoint (cluster: ``setCheckpointDir`` -> fault-tolerant
  ``checkpoint``; local mode: ``localCheckpoint``) so the plan never
  re-derives prior rounds;
- no driver-side data: the only collect in the operator is none at all —
  the node count feeds the teleport term as a broadcast one-row join.

Dangling nodes (no out-edges) are handled the simple documented way:
their mass is NOT redistributed (rank leaks each round). This is the
variant an ANSI-SQL oracle can replay exactly; the normalized variant is
a one-line post-division and does not change the ranking order within
this leak model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    broadcast_ranks: bool = True,
) -> DataFrame:
    """(node, rank) after ``iterations`` rounds of power iteration over
    the directed edge list.

    rank_0(v)   = 1 / N
    rank_i+1(v) = (1 - d) / N + d * SUM over u->v of rank_i(u) / outdeg(u)

    Each round folds ``rank(u)/outdeg(u)`` into the |V|-row rank
    relation (no O(|E|) weighted-edge table ever materializes), joins it
    onto the deduped edges and hash-aggregates on ``dst`` with map-side
    partial sums — a celebrity node costs one partial row per upstream
    partition, not a single-reducer hot key.

    ``broadcast_ranks`` (default True) broadcasts the |V|-row rank
    vector into the edge join, so the O(|E|) edge table is NEVER
    shuffled after setup — the right plan while |V| x ~24 bytes fits
    executor memory (hundreds of millions of nodes). For graphs beyond
    that, pass False: both sides hash-shuffle on the node key and the
    edge side's exchange is reused across rounds by AQE where possible
    (the classic co-partitioned PageRank).
    """
    from datafusion_gpu_spark.operators.util import lineage_truncator

    ckpt = lineage_truncator(edges.sparkSession.sparkContext)
    # setup is TWO materializations (was three): the deduped edge list,
    # then one shuffle that yields BOTH the node set and the out-degrees
    # (sources contribute 1, destinations 0 — every endpoint appears).
    # The 1/outdeg edge weight never materializes as an O(|E|) table:
    # it rides the |V|-row rank relation into each round's join instead.
    e = ckpt(
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    )
    nodes_deg = ckpt(
        e.select(F.col("src").alias("node"), F.lit(1).alias("out"))
        .unionAll(e.select(F.col("dst").alias("node"), F.lit(0).alias("out")))
        .groupBy("node")
        .agg(F.sum("out").cast("double").alias("outdeg"))
    )
    nodes = nodes_deg.select("node")
    # one-row broadcast with the teleport constants — no driver collect
    n_row = F.broadcast(nodes.agg(F.count(F.lit(1)).cast("double").alias("n")))
    ranks = nodes.crossJoin(n_row).select(
        "node", (F.lit(1.0) / F.col("n")).alias("rank")
    )
    maybe_bcast = F.broadcast if broadcast_ranks else (lambda df: df)
    for _ in range(iterations):
        # rank(u)/outdeg(u) on the |V|-row side; dst-only nodes (outdeg
        # 0) can never match an e.src, so dropping them just shrinks the
        # broadcast
        rank_w = (
            ranks.join(nodes_deg, "node")
            .where(F.col("outdeg") > 0)
            .select("node", (F.col("rank") / F.col("outdeg")).alias("rw"))
        )
        contribs = (
            e.join(maybe_bcast(rank_w), e["src"] == rank_w["node"])
            .groupBy("dst")
            .agg(F.sum("rw").alias("contrib"))
        )
        ranks = ckpt(
            nodes.join(
                maybe_bcast(contribs), nodes["node"] == contribs["dst"], "left"
            )
            .crossJoin(n_row)
            .select(
                "node",
                (
                    (1.0 - damping) / F.col("n")
                    + damping * F.coalesce(F.col("contrib"), F.lit(0.0))
                ).alias("rank"),
            )
        )
    return ranks
