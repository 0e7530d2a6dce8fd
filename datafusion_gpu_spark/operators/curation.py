"""Dataset-curation operators: deterministic train/val/test splitting and
stratified sampling.

Both use a salted portable hash (md5-prefix, dedup.word_hash60 family)
instead of Spark's random sample(): the assignment of a document is a
pure function of (salt, key), so it survives reshards, re-runs, engine
changes, and backfills — the property a training pipeline actually needs
(a random split re-drawn per run silently leaks val into train). Pure
codegen column expressions: no shuffle, no Python, embarrassingly
parallel at any scale, and exactly replayable by the SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: hash-space granularity: assignments resolve to 1e-6 of probability
_BUCKETS = 1_000_000


def _hash_bucket(key: Column, salt: str) -> Column:
    """Uniform bucket in [0, 1e6) from the salted portable 60-bit hash
    (nonnegative by construction — 15 hex chars < 2^60)."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(salt), key.cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    return h % _BUCKETS


def hash_split(
    docs: DataFrame,
    key: str = "doc_id",
    weights: dict[str, float] | None = None,
    salt: str = "split-v1",
) -> DataFrame:
    """Assign every row a split label by cumulative hash-bucket ranges.

    weights default to {'train': 0.9, 'val': 0.05, 'test': 0.05}; they
    must sum to 1. Changing the salt re-draws the whole assignment;
    growing a split's weight only MOVES boundary buckets (monotone
    ranges), so e.g. raising train 0.9 -> 0.95 never flips train rows
    back out of train.
    """
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    bucket = _hash_bucket(F.col(key), salt)
    cum = 0.0
    expr = None
    for name, w in weights.items():
        cum += w
        bound = int(round(cum * _BUCKETS))
        cond = bucket < F.lit(bound)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
    # float-rounding safety net: the final range is half-open at 1e6
    return docs.withColumn("split", expr.otherwise(F.lit(list(weights)[-1])))


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    key: str = "doc_id",
    default_rate: float = 0.0,
    salt: str = "sample-v1",
) -> DataFrame:
    """Keep each row with its stratum's rate, deterministically.

    The per-stratum keep decision is ``hash_bucket(salt, key) <
    rate * 1e6`` — so a row kept at rate 0.1 is still kept at rate 0.2
    (nested samples for scaling-law runs), and two strata sampled at the
    same rate keep the SAME key subspace, which makes cross-stratum
    joins of sampled tables line up.
    """
    bucket = _hash_bucket(F.col(key), salt)
    rate = None
    for stratum, r in rates.items():
        cond = F.col(strata_col) == stratum
        rate = F.when(cond, F.lit(r)) if rate is None else rate.when(cond, F.lit(r))
    rate = rate.otherwise(F.lit(default_rate)) if rate is not None else F.lit(
        default_rate
    )
    return docs.where(bucket < (rate * _BUCKETS).cast("long"))


def pack_sequences(
    docs: DataFrame,
    token_col: str = "n_tokens",
    budget: int = 2048,
    shards: int = 64,
    key: str = "doc_id",
    salt: str = "pack-v1",
) -> DataFrame:
    """Assign documents to fixed-token-budget training bins (sequence
    packing): within a shard, documents are laid out in key order and a
    new bin starts whenever the running token total crosses the budget.

    bin = floor(tokens_before_this_doc / budget) — contiguous greedy
    packing in a deterministic order, the standard approximation of
    first-fit (bins overflow by at most one document rather than
    splitting documents). Sharding by salted hash keeps every window
    partition-sized — the cumulative sum never runs over more than
    corpus/shards rows, so the operator scales by raising ``shards``
    with the corpus (at 100 TB, thousands of shards keep each window's
    state executor-local; one shuffle total).
    """
    from pyspark.sql import Window

    shard = _hash_bucket(F.col(key), salt) % shards
    w = (
        Window.partitionBy("shard")
        .orderBy(key)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = docs.withColumn("shard", shard).withColumn(
        "tokens_before", F.coalesce(F.sum(token_col).over(w), F.lit(0))
    )
    return out.withColumn(
        "bin", (F.col("tokens_before") / budget).cast("long")
    ).drop("tokens_before")
