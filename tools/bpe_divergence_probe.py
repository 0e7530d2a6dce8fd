"""Exact-vs-batched BPE training fidelity at realistic scale
(VERDICT r5, ask #5).

Round 5 measured merge_batch=16 at 11.6x faster than exact sequential
training but characterized its divergence only on a ~40-distinct-word
toy corpus. This probe trains BOTH modes on the full sf0.1 documents
corpus (5,000 real-ish documents) to >= 512 merges and reports:

- wall-clock for each mode (the speedup claim re-measured at scale);
- merge-LIST agreement: exact-prefix length, set overlap (Jaccard) of
  the (left, right) pairs, and overlap at 128/256/512 ranks;
- downstream effect: total encoded token count of the corpus under
  each merge list (compression parity is what a tokenizer consumer
  actually cares about — two lists that tokenize to within a fraction
  of a percent are interchangeable).

Usage: python tools/bpe_divergence_probe.py [sf_dir] [num_merges] [batch]
Writes one human-readable block to stdout (paste into SCALE.md).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    num_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 16

    from datafusion_gpu_spark.context import get_spark, register_tables
    from datafusion_gpu_spark.operators.text import bpe_encode, bpe_train

    spark = get_spark("bpe-divergence-probe")
    spark.sparkContext.setLogLevel("ERROR")
    register_tables(spark, sf_dir)
    docs = spark.table("documents").select("doc_id", "text").cache()
    n_docs = docs.count()

    results = {}
    for label, mb in (("exact", 1), (f"batch={batch}", batch)):
        t0 = time.perf_counter()
        merges = bpe_train(docs, num_merges=num_merges, merge_batch=mb)
        wall = time.perf_counter() - t0
        t0 = time.perf_counter()
        n_tokens = (
            bpe_encode(docs, merges)
            .agg({"n_tokens": "sum"})
            .collect()[0][0]
        )
        enc_wall = time.perf_counter() - t0
        results[label] = (merges, wall, n_tokens, enc_wall)
        print(
            f"{label}: {len(merges)} merges in {wall:.1f}s, "
            f"encoded {n_docs} docs -> {n_tokens} tokens ({enc_wall:.1f}s)",
            flush=True,
        )

    (em, ew, et, _), (bm, bw, bt, _) = results["exact"], results[f"batch={batch}"]
    epairs = [(l, r) for l, r, _ in em]
    bpairs = [(l, r) for l, r, _ in bm]
    prefix = 0
    for a, b in zip(epairs, bpairs):
        if a != b:
            break
        prefix += 1
    print(f"\n=== exact vs batch={batch} on {sf_dir} ({n_docs} docs, "
          f"{num_merges} merges) ===")
    print(f"speedup: {ew:.1f}s -> {bw:.1f}s ({ew / bw:.1f}x)")
    print(f"identical prefix: {prefix} merges")
    for k in (128, 256, num_merges):
        a, b = set(epairs[:k]), set(bpairs[:k])
        print(f"overlap@{k}: {len(a & b)} shared "
              f"(jaccard {len(a & b) / len(a | b):.3f})")
    print(f"encoded tokens: exact {et} vs batched {bt} "
          f"(delta {(bt - et) / et * 100:+.3f}%)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
