"""A/B probe: incremental MinHash-LSH ingest vs full re-band (VERDICT
r14 ask #3 "Done" criterion).

Plants a synthetic corpus far beyond the gate tables: H history docs of
30 deterministic pseudo-random tokens each (vocabulary sized so docs are
pairwise unrelated), plus a B-doc batch where 1 doc in 10 is a one-token
edit of some history doc (a true near-dup, shingle Jaccard ~ 0.89) and
the rest are novel. Then measures, on the SAME session:

  A. one-off index build: minhash_band_index(history) persisted to
     parquet (the production artifact, written once per corpus);
  B. per-ingest incremental: incremental_minhash_lsh(history, batch,
     index=persisted) — the daily cost;
  C. full recompute: minhash_lsh_pairs(history UNION batch) — what a
     pipeline without the index pays per ingest — restricted to
     cross-side pairs for the equality check.

Asserts B == C on the cross-side pair set (the same equality
tests/test_dedup.py pins at toy scale), then prints the three
wall-clocks. The headline is B vs C: per-ingest work drops from
corpus-sized re-banding to batch-sized probing.

Usage: python tools/incremental_minhash_probe.py [H] [B]
       (default 500_000 5_000)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    h_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    b_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000

    import tempfile

    from pyspark.sql import functions as F

    from datafusion_gpu_spark.context import get_spark
    from datafusion_gpu_spark.operators.dedup import (
        incremental_minhash_lsh,
        minhash_band_index,
        minhash_lsh_pairs,
    )

    spark = get_spark("incremental-minhash-probe")
    spark.sparkContext.setLogLevel("ERROR")

    n_words, vocab = 30, 1 << 22

    def tokens(id_col, edit_pos=None):
        # token j of doc i = 'w' || hash(i*31+j) % vocab — deterministic,
        # pairwise-unrelated docs; edit_pos swaps ONE token so the edited
        # copy keeps 27/31 of the 3-shingle union (j ~ 0.871)
        parts = []
        for j in range(n_words):
            tok = F.concat(
                F.lit("w"),
                (
                    F.xxhash64(id_col * F.lit(31) + F.lit(j))
                    .bitwiseAND(F.lit(0x7FFFFFFF))
                    % F.lit(vocab)
                ).cast("string"),
            )
            if edit_pos is not None and j == edit_pos:
                tok = F.lit("edited")
            parts.append(tok)
        return F.concat_ws(" ", *parts)

    history = spark.range(h_docs).select(
        F.col("id").alias("doc_id"), tokens(F.col("id")).alias("text")
    )
    # batch ids live above the history id space (fresh ingest ids);
    # every 10th batch doc is a one-token edit of history doc id*97 % H
    base = spark.range(b_docs)
    edit_src = (F.col("id") * F.lit(97)) % F.lit(h_docs)
    batch = base.select(
        (F.col("id") + F.lit(h_docs)).alias("doc_id"),
        F.when(F.col("id") % 10 == 0, tokens(edit_src, edit_pos=15))
        .otherwise(tokens(F.col("id") + F.lit(2 * h_docs)))
        .alias("text"),
    )
    history = history.persist()
    batch = batch.persist()
    history.count(), batch.count()

    with tempfile.TemporaryDirectory() as tmp:
        idx_path = f"{tmp}/band_index"
        t0 = time.time()
        minhash_band_index(history).write.mode("overwrite").parquet(idx_path)
        t_index = time.time() - t0
        n_index = spark.read.parquet(idx_path).count()
        print(f"A. index build+persist over {h_docs} history docs: "
              f"{t_index:.1f}s ({n_index} band rows)")

        idx = spark.read.parquet(idx_path)
        t0 = time.time()
        inc = {
            (r.hist_id, r.batch_id, r.jaccard)
            for r in incremental_minhash_lsh(
                history, batch, threshold=0.5, index=idx
            ).collect()
        }
        t_inc = time.time() - t0
        print(f"B. incremental probe of {b_docs}-doc batch: {t_inc:.1f}s "
              f"({len(inc)} near-dup pairs)")

    t0 = time.time()
    full = set()
    for r in minhash_lsh_pairs(
        history.unionByName(batch), threshold=0.5
    ).collect():
        a, b = r.doc_a, r.doc_b
        if a < h_docs <= b:
            full.add((a, b, r.jaccard))
        elif b < h_docs <= a:
            full.add((b, a, r.jaccard))
    t_full = time.time() - t0
    print(f"C. full re-band of {h_docs + b_docs} docs: {t_full:.1f}s "
          f"({len(full)} cross pairs of a larger all-pairs set)")

    assert inc == full, (
        f"A/B MISMATCH: inc-only={sorted(inc - full)[:5]} "
        f"full-only={sorted(full - inc)[:5]}"
    )
    expect = b_docs // 10
    assert len(inc) >= expect, f"planted {expect} near-dups, found {len(inc)}"
    print(f"EQUAL: incremental == full-recompute cross slice "
          f"({len(inc)} pairs, >= {expect} planted); "
          f"per-ingest speedup x{t_full / t_inc:.1f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
