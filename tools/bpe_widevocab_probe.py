"""Wide-vocab BPE fidelity probe (VERDICT r6, ask #3): the vocab-scale
claim the 31-distinct-word driver corpus provably cannot test
(tools/bpe_divergence_probe.py documents the saturation block).

Corpus: text.synthetic_zipf_corpus — seeded, generated in-process, no
driver-data dependency: 50k distinct syllable-structured words under a
Zipf(s=1) frequency profile, so BPE training stays meaningful for
thousands of merges.

Measures, per merge_batch in {1, 16, 64}:
- train wall to the target merge count;
- merge-list agreement vs exact (merge_batch=1): exact-prefix length
  and pair-set Jaccard;
- the consumer-facing number: total encoded token count of the corpus
  under each list (tokens-divergence %), plus batched-only training
  carried to 2048 merges to show the vocab keeps supporting meaningful
  merges far past the driver corpus' 90-merge ceiling.

Usage: python tools/bpe_widevocab_probe.py [vocab] [tokens] [merges]
       (default 50_000 2_000_000 512)
Prints one block per mode (paste into SCALE.md).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    vocab = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    tokens = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    merges_n = int(sys.argv[3]) if len(sys.argv) > 3 else 512

    from pyspark.sql import functions as F

    from datafusion_gpu_spark.context import get_spark
    from datafusion_gpu_spark.operators.text import (
        bpe_encode,
        bpe_train,
        synthetic_zipf_corpus,
    )

    spark = get_spark("bpe-widevocab-probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = synthetic_zipf_corpus(spark, vocab, tokens).cache()
    n_distinct = docs.select(F.countDistinct("text")).first()[0]
    print(f"corpus: {tokens:,} tokens, {n_distinct:,} distinct words "
          f"(vocab target {vocab:,})", flush=True)

    results = {}
    for mb in (1, 16, 64):
        t0 = time.perf_counter()
        merges = bpe_train(docs, num_merges=merges_n, merge_batch=mb)
        wall = time.perf_counter() - t0
        n_tok = bpe_encode(docs, merges).agg(F.sum("n_tokens")).first()[0]
        results[mb] = (merges, wall, n_tok)
        print(f"merge_batch={mb}: {len(merges)} merges in {wall:.1f}s, "
              f"corpus encodes to {n_tok:,} tokens", flush=True)

    ex_pairs = [(l, r) for l, r, _ in results[1][0]]
    ex_tok = results[1][2]
    for mb in (16, 64):
        got = [(l, r) for l, r, _ in results[mb][0]]
        prefix = 0
        for x, y in zip(ex_pairs, got):
            if x != y:
                break
            prefix += 1
        jac = len(set(ex_pairs) & set(got)) / len(set(ex_pairs) | set(got))
        dv = 100.0 * (results[mb][2] - ex_tok) / ex_tok
        print(f"merge_batch={mb} vs exact: prefix={prefix}/{merges_n} "
              f"pair-set jaccard={jac:.3f} tokens-divergence={dv:+.3f}% "
              f"speedup x{results[1][1] / results[mb][1]:.1f}", flush=True)

    # vocab-scale demonstration: batched training far past the driver
    # corpus' 90-merge saturation ceiling
    t0 = time.perf_counter()
    deep = bpe_train(docs, num_merges=2048, merge_batch=64)
    wall = time.perf_counter() - t0
    n_tok = bpe_encode(docs, deep).agg(F.sum("n_tokens")).first()[0]
    floor = docs.count()  # one token per word is the compression floor
    print(f"merge_batch=64 to 2048 merges: {len(deep)} learned in "
          f"{wall:.1f}s, corpus encodes to {n_tok:,} tokens "
          f"(floor {floor:,}; last merge weight "
          f"{deep[-1][2]:,} -- still meaningful)", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
