"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design (SURVEY §7 Phase 3 / task brief): image/audio/video travel as
``binary`` columns with a metadata struct; decode / feature-extraction run
as Arrow-batched pandas functions over ``mapInPandas`` so each Python
worker sees a columnar batch (the exact boundary the reference's GPU UDAFs
use for host->device transfer). The actual codec call is STUBBED — the
container has no image/audio libraries — behind ``decode_image``; the
Spark-side plumbing (schema, batch shape, partitioning) is real and
tested, and ``extract_features`` demonstrates it with a deterministic
byte-level feature set.

Scale notes: payloads never pass through the driver; mapInPandas streams
Arrow batches executor-side, and the metadata struct lets filters prune
on (modality, byte size) before any Python is invoked.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Output schema of the (stubbed) decode/feature pass.
FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
    ]
)


def decode_image(payload: bytes) -> "object":
    """Real codec hook: decodes via Pillow when it is importable (any
    deployment with imaging libs gets real decode with zero code change);
    this container ships without one, so the error documents the gap.
    The pipeline around it is exercised via the deterministic fake in
    ``_fake_decode``."""
    try:
        from PIL import Image  # optional dependency, absent in sandbox
    except ImportError as exc:
        raise NotImplementedError(
            "image decoding requires an imaging library (e.g. Pillow/libvips); "
            "not available in this environment — use extract_features, which "
            "runs the same mapInPandas plumbing with a deterministic fake"
        ) from exc
    import io as _io

    return Image.open(_io.BytesIO(payload))


def _fake_decode(payload: bytes) -> tuple[int, int, int, int]:
    """Deterministic stand-in for a codec: byte length + fake dimensions
    derived from it. Mirrorable in SQL for the correctness oracle."""
    n = len(payload)
    return n, n % 640 + 1, (n * 7) % 480 + 1, 3


#: Output schema of the chunk/frame-sampling pass.
CHUNK_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("chunk_idx", IntegerType()),
        StructField("offset", IntegerType()),
        StructField("n_bytes", IntegerType()),
        StructField("chunk_md5", StringType()),
    ]
)


def sample_chunks(
    binary_df: DataFrame, chunk_bytes: int = 64, stride: int = 2
) -> DataFrame:
    """Frame-sampling model for video-like payloads: split each payload
    into fixed-size byte chunks and keep every ``stride``-th one (chunk
    0, stride, 2*stride, …), emitting per-chunk metadata + content hash.

    Runs as the same Arrow-batched mapInPandas plumbing as the decode
    pass — real byte slicing in Python, one worker per partition, no
    shuffle, and the downstream join key (doc_id, chunk_idx) stays
    partition-aligned with the payloads.
    """
    import hashlib

    from datafusion_gpu_spark.context import ensure_parallelism

    binary_df = ensure_parallelism(binary_df)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "chunk_idx", "offset", "n_bytes", "chunk_md5")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                n_chunks = (len(data) + chunk_bytes - 1) // chunk_bytes
                for idx in range(0, n_chunks, stride):
                    chunk = data[idx * chunk_bytes : (idx + 1) * chunk_bytes]
                    rows["doc_id"].append(doc_id)
                    rows["chunk_idx"].append(idx)
                    rows["offset"].append(idx * chunk_bytes)
                    rows["n_bytes"].append(len(chunk))
                    rows["chunk_md5"].append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(rows)

    return binary_df.select("doc_id", "payload").mapInPandas(run, CHUNK_SCHEMA)


def attach_binary(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Treat each document's text as an opaque payload: binary column +
    typed metadata struct — the multimodal table layout."""
    return docs.select(
        "doc_id",
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit("image/fake").alias("mime"),
            F.octet_length(F.encode(F.col(text_col), "utf-8")).alias("n_bytes"),
            F.col("source").alias("origin"),
        ).alias("meta"),
    )


def extract_features(binary_df: DataFrame) -> DataFrame:
    """mapInPandas decode pass: Arrow batches in, feature rows out.

    One Python worker per partition batch; no shuffle — features land
    partition-aligned with the payloads for any downstream join.
    """

    from datafusion_gpu_spark.context import ensure_parallelism

    binary_df = ensure_parallelism(binary_df)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_fake_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "n_bytes": [d[0] for d in decoded],
                    "width": [d[1] for d in decoded],
                    "height": [d[2] for d in decoded],
                    "channels": [d[3] for d in decoded],
                }
            )

    return binary_df.select("doc_id", "payload").mapInPandas(run, FEATURE_SCHEMA)
