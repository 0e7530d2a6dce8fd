"""Large-scale training-data-pipeline operators.

These extend the engine beyond the reference's own surface using exactly
the extension mechanism the reference demonstrates (vectorized columnar
UDFs + relational composition) — SURVEY §7 Phase 3. Every operator is
designed shuffle-aware for the 100 TB case:

- dedup: exact, MinHash+LSH, SimHash, n-gram Jaccard (datafusion_gpu_spark.operators.dedup)
- similarity: brute-force + LSH-bucketed cosine ANN (operators.similarity)
- text: language-ID, quality scoring, tokenization, fingerprints (operators.text)
- multimodal: binary columns + decode plumbing (operators.multimodal)
- events: time buckets, sessionization, as-of join (operators.events)
"""
