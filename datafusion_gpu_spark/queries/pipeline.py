"""Training-data-pipeline operator queries (dedup, similarity, text,
multimodal, events) — filled in by datafusion_gpu_spark.operators.*."""

from __future__ import annotations

QUERIES: dict = {}
ORACLES: dict = {}
