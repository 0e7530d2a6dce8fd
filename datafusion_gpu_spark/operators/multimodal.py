"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design (SURVEY §7 Phase 3 / task brief): image/audio/video travel as
``binary`` columns with a metadata struct; decode / feature-extraction run
as Arrow-batched pandas functions over ``mapInPandas`` so each Python
worker sees a columnar batch (the exact boundary the reference's GPU UDAFs
use for host->device transfer). All three modalities have REAL built-in
pure-NumPy codecs — P6 PPM / 24-bit BMP images (``decode_image_array``),
RIFF/WAV PCM16 audio (``decode_wav_pcm16``), YUV4MPEG2 video
(``decode_y4m``) — so the gate exercises true byte-level decoding with no
native dependency; Pillow is picked up automatically for arbitrary image
formats when a deployment ships it (``decode_image``), and
``extract_features`` keeps the original deterministic byte-level fake as
the SQL-mirrorable plumbing demo.

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
    DoubleType,
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


def decode_image_array(payload: bytes) -> "object":
    """(height, width, 3) uint8 RGB pixels. Tries Pillow first (any
    format, zero code change on deployments with imaging libs); falls
    back to BUILT-IN pure-NumPy decoders for binary PPM (P6) and
    uncompressed 24-bit BMP — real pixel decoding with no native
    dependency, so even this sandbox exercises a true codec path
    end-to-end instead of a fake."""
    import numpy as np

    try:
        from PIL import Image  # optional; absent in sandbox
    except ImportError:
        Image = None
    if Image is not None:
        import io as _io

        try:
            return np.asarray(Image.open(_io.BytesIO(payload)).convert("RGB"))
        except Exception:
            pass  # undecodable by Pillow: fall through to the built-ins
    if payload[:2] == b"P6":
        return _decode_ppm_p6(payload)
    if payload[:2] == b"BM":
        return _decode_bmp24(payload)
    raise NotImplementedError(
        "no imaging library and payload is neither P6 PPM nor 24-bit BMP"
    )


def _decode_ppm_p6(payload: bytes) -> "object":
    """Binary PPM: 'P6' <ws> width <ws> height <ws> maxval <1 ws byte>
    raster of height*width*3 bytes. '#' comments run to end-of-line."""
    import numpy as np

    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            pos = payload.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    width, height, maxval = fields
    if maxval != 255:
        raise NotImplementedError(f"PPM maxval {maxval} != 255")
    need = height * width * 3
    # spec: exactly ONE whitespace byte before the raster — but Windows
    # tooling emits \r\n; disambiguate by exact remaining length so an
    # off-spec header can never silently shift the pixels
    if len(payload) - (pos + 1) == need:
        pos += 1
    elif payload[pos : pos + 2] == b"\r\n" and len(payload) - (pos + 2) == need:
        pos += 2
    else:
        raise ValueError(
            f"PPM raster length mismatch: header ends at {pos}, "
            f"need {need} bytes, have {len(payload) - (pos + 1)}"
        )
    raster = np.frombuffer(payload, dtype=np.uint8, count=need, offset=pos)
    return raster.reshape(height, width, 3).copy()


def _decode_bmp24(payload: bytes) -> "object":
    """Uncompressed 24-bpp Windows BMP: BGR rows, bottom-up, each row
    padded to a 4-byte boundary."""
    import struct

    import numpy as np

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (data_offset,) = struct.unpack_from("<I", payload, 10)
    width, height = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"only uncompressed 24-bpp BMP (got bpp={bpp})")
    bottom_up = height > 0
    height = abs(height)
    row_bytes = (width * 3 + 3) & ~3
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=height * row_bytes, offset=data_offset
    ).reshape(height, row_bytes)
    pixels = rows[:, : width * 3].reshape(height, width, 3)
    if bottom_up:
        pixels = pixels[::-1]
    return pixels[..., ::-1].copy()  # BGR -> RGB


#: Output schema of the REAL decode pass (built-in codecs).
DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("mean_r", IntegerType()),
        StructField("mean_g", IntegerType()),
        StructField("mean_b", IntegerType()),
    ]
)


def decode_features(binary_df: DataFrame) -> DataFrame:
    """REAL image decode over the standard multimodal plumbing: each
    Arrow batch's payloads decode executor-side via decode_image_array
    (Pillow when present, built-in PPM/BMP otherwise) and emit exact
    dimensions + per-channel integer mean. Same scale shape as
    extract_features: payloads never touch the driver, no shuffle, and
    metadata filters prune before Python runs."""
    from datafusion_gpu_spark.context import ensure_parallelism

    binary_df = ensure_parallelism(binary_df)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "width", "height", "channels", "mean_r", "mean_g", "mean_b"
            )}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                px = decode_image_array(bytes(payload))
                out["doc_id"].append(doc_id)
                out["height"].append(px.shape[0])
                out["width"].append(px.shape[1])
                out["channels"].append(px.shape[2])
                out["mean_r"].append(int(px[..., 0].mean()))
                out["mean_g"].append(int(px[..., 1].mean()))
                out["mean_b"].append(int(px[..., 2].mean()))
            yield pd.DataFrame(out)

    return binary_df.select("doc_id", "payload").mapInPandas(run, DECODED_SCHEMA)


# -- audio: pure-NumPy RIFF/WAV PCM16 codec ---------------------------------

AUDIO_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("n_samples", IntegerType()),
        StructField("duration_ms", IntegerType()),
        StructField("rms", DoubleType()),
        StructField("peak", IntegerType()),
    ]
)


def encode_wav_pcm16(samples, sample_rate: int) -> bytes:
    """Minimal RIFF/WAVE writer for 16-bit PCM: ``samples`` is an
    (n, channels) int16 array (or (n,) for mono). No audio library —
    the container format is 44 bytes of little-endian struct fields."""
    import struct

    import numpy as np

    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    data = s.tobytes()  # interleaved frames, little-endian
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, ch, sample_rate, byte_rate, ch * 2, 16
    )
    body = fmt + struct.pack("<4sI", b"data", len(data)) + data
    return struct.pack("<4sI4s", b"RIFF", 4 + len(body), b"WAVE") + body


def decode_wav_pcm16(payload: bytes):
    """Parse a RIFF/WAVE container and return (sample_rate, samples)
    with samples shaped (n, channels) int16. Walks the chunk list (so
    extra chunks like LIST/INFO before ``data`` are fine) and rejects
    anything but uncompressed 16-bit PCM — a clear error beats a wrong
    decode."""
    import struct

    import numpy as np

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack("<4sI", payload[pos : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                raise NotImplementedError("truncated fmt chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise NotImplementedError("WAVE missing fmt or data chunk")
    audio_format, ch, rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16:
        raise NotImplementedError(
            f"only PCM16 supported (format={audio_format}, bits={bits})"
        )
    s = np.frombuffer(data, dtype="<i2")
    return rate, s.reshape(-1, ch)


def audio_features(binary_df: DataFrame) -> DataFrame:
    """REAL audio decode over the standard multimodal plumbing: each
    payload parses executor-side via decode_wav_pcm16 and emits
    (sample_rate, channels, n_samples, duration_ms, rms, peak) — rms in
    float64 over all channels, rounded to 4, duration in integer ms.
    Same scale shape as decode_features: payloads never touch the
    driver, no shuffle."""
    import numpy as np

    from datafusion_gpu_spark.context import ensure_parallelism

    binary_df = ensure_parallelism(binary_df)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "sample_rate", "channels", "n_samples",
                "duration_ms", "rms", "peak",
            )}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                rate, s = decode_wav_pcm16(bytes(payload))
                out["doc_id"].append(doc_id)
                out["sample_rate"].append(rate)
                out["channels"].append(s.shape[1])
                out["n_samples"].append(s.shape[0])
                out["duration_ms"].append(s.shape[0] * 1000 // rate)
                out["rms"].append(
                    round(float(np.sqrt(np.mean(s.astype(np.float64) ** 2))), 4)
                )
                out["peak"].append(int(np.abs(s.astype(np.int64)).max()))
            yield pd.DataFrame(out)

    return binary_df.select("doc_id", "payload").mapInPandas(run, AUDIO_SCHEMA)


AFP_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("afp", LongType()),
        StructField("n_bits", IntegerType()),
    ]
)


def audio_fingerprint(binary_df: DataFrame, frames: int = 31) -> DataFrame:
    """62-bit audio near-dup fingerprint over REAL decoded WAV payloads
    — the audio analogue of :func:`phash64` (VERDICT r14 ask #4): a
    renormalized (gain-changed) or slightly time-shifted copy of a clip
    keeps the same coarse spectral-energy envelope, so its fingerprint
    lands within a few bits while dedup_exact's md5 sees a new file.

    Transform, all INTEGER arithmetic so a SQL engine replays it
    bit-for-bit (the pHash exactness discipline):

    1. integer mono mix: sum across channels // n_channels (int64);
    2. split into ``frames`` equal contiguous frames of n_f = n //
       frames samples (trailing remainder dropped; n_f >= 2 required);
    3. per frame, a crude exact 2-band filterbank over adjacent-sample
       pairs: low band a_j = s_{j+1} + s_j (lowpass sum), high band
       d_j = s_{j+1} - s_j (highpass first difference), with per-frame
       band energies L_f = sum a_j^2 and H_f = sum d_j^2 (bounded by
       (2*32768)^2 * n_f < 2^63 for any realistic clip);
    4. threshold each band's 31 energies against that band's MEDIAN —
       31 is odd, so the median is the exact middle order statistic
       (the pHash 63-AC trick), and scaling every sample by g scales
       every energy by g^2, leaving all comparisons unchanged: exact
       gain invariance by construction.

    Bit f (0..30) of ``afp`` is the low-band flag of frame f; bit
    31 + f the high-band flag. A small time shift moves a few samples
    across frame boundaries and flips at most a few near-median bits
    (the dust-radius property the tests plant); pair generation
    downstream reuses the banded-equality machinery (dedup_simhash's
    pigeonhole), exactly as for phash64. Arrow-batched mapInPandas,
    one Python stage, payloads never reach the driver, no shuffle.
    """
    import numpy as np

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "afp": [], "n_bits": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                _, s = decode_wav_pcm16(bytes(payload))
                mono = s.astype(np.int64).sum(axis=1) // s.shape[1]
                n_f = len(mono) // frames
                if n_f < 2:
                    raise ValueError(
                        f"audio_fingerprint needs >= {2 * frames} samples, "
                        f"got {len(mono)}"
                    )
                fr = mono[: frames * n_f].reshape(frames, n_f)
                a = fr[:, 1:] + fr[:, :-1]
                d = fr[:, 1:] - fr[:, :-1]
                low = (a * a).sum(axis=1)
                high = (d * d).sum(axis=1)
                lbits = low > int(np.median(low))  # odd count: exact element
                hbits = high > int(np.median(high))
                afp = int(
                    sum(int(b) << f for f, b in enumerate(lbits))
                    + sum(int(b) << (frames + f) for f, b in enumerate(hbits))
                )
                out["doc_id"].append(int(doc_id))
                out["afp"].append(afp)
                out["n_bits"].append(int(lbits.sum() + hbits.sum()))
            yield pd.DataFrame(out)

    return binary_df.select("doc_id", "payload").mapInPandas(compute, AFP_SCHEMA)


def audio_neardup_pairs(
    binary_df: DataFrame,
    max_hamming: int = 3,
    chunks: int = 4,
    frames: int = 31,
) -> DataFrame:
    """Audio near-duplicate pairs: :func:`audio_fingerprint` + the
    SimHash chunked-equality pigeonhole (dedup.simhash_pairs'
    candidate machinery restated over the 62-bit afp) — a gain-changed
    re-encode of a clip pairs with its original at hamming 0..3 while
    unrelated clips sit ~31 bits apart, and candidate generation is an
    equality join on (chunk_id, chunk_value), never an all-pairs scan.

    Pigeonhole: hamming < chunks implies one of the ``chunks``
    bit-slices identical. Chunk width covers ceil(62/chunks) bits;
    the top chunk being narrower only ADDS candidates (a flip in an
    uncovered position breaks no chunk), so completeness at
    max_hamming <= chunks - 1 is preserved. Verification is one
    bit_count(xor) per candidate. Same scale shape as simhash_pairs:
    bucket-blocked join, distinct, no pair space.
    """
    sig = audio_fingerprint(binary_df, frames)
    width = (2 * frames + chunks - 1) // chunks
    mask = (1 << width) - 1
    chunk_cols = [
        (F.shiftrightunsigned(F.col("afp"), i * width).bitwiseAND(F.lit(mask)))
        for i in range(chunks)
    ]
    buckets = sig.select(
        "doc_id", "afp", F.posexplode(F.array(*chunk_cols)).alias("chunk", "val")
    )
    x, y = buckets.alias("x"), buckets.alias("y")
    pairs = (
        x.join(
            y,
            (F.col("x.chunk") == F.col("y.chunk"))
            & (F.col("x.val") == F.col("y.val"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.bit_count(F.col("x.afp").bitwiseXOR(F.col("y.afp"))).alias(
                "hamming"
            ),
        )
        .distinct()
    )
    return pairs.where(F.col("hamming") <= max_hamming)


# -- video: pure-NumPy YUV4MPEG2 (Y4M) codec + frame sampling ---------------

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mean_y", DoubleType()),
    ]
)


def encode_y4m(frames, fps: int = 25) -> bytes:
    """Minimal YUV4MPEG2 writer: ``frames`` is a (n, h, w) uint8 array
    of luma planes; chroma is written flat 128 (C420, quarter-size U/V
    planes). The container is plain text headers + raw planes — no
    video library involved."""
    import numpy as np

    f = np.asarray(frames, dtype=np.uint8)
    n, h, w = f.shape
    if w % 2 or h % 2:
        raise ValueError("C420 needs even dimensions")
    uv = bytes([128]) * ((w // 2) * (h // 2))
    out = [f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 C420\n".encode()]
    for i in range(n):
        out.append(b"FRAME\n")
        out.append(f[i].tobytes())
        out.append(uv)
        out.append(uv)
    return b"".join(out)


def decode_y4m(payload: bytes):
    """Parse a YUV4MPEG2 stream: returns (width, height, fps_num,
    frames) with frames shaped (n, h, w) uint8 — luma planes only
    (chroma is parsed past, not returned). Only C420 layouts are
    accepted; frame headers may carry parameters (read to newline)."""
    import numpy as np

    nl = payload.find(b"\n")
    if nl < 0 or not payload.startswith(b"YUV4MPEG2"):
        raise NotImplementedError("not a YUV4MPEG2 payload")
    w = h = fps = None
    colorspace = "C420"
    for tok in payload[:nl].split()[1:]:
        t = tok.decode("ascii", "replace")
        if t[0] == "W":
            w = int(t[1:])
        elif t[0] == "H":
            h = int(t[1:])
        elif t[0] == "F":
            fps = int(t[1:].split(":")[0])
        elif t[0] == "C":
            colorspace = t
    if w is None or h is None:
        raise NotImplementedError("Y4M header missing W/H")
    if not colorspace.startswith("C420"):
        raise NotImplementedError(f"only C420 supported, got {colorspace}")
    y_size, uv_size = w * h, (w // 2) * (h // 2)
    frames, pos = [], nl + 1
    while pos < len(payload):
        fnl = payload.find(b"\n", pos)
        if fnl < 0 or not payload[pos:fnl].startswith(b"FRAME"):
            raise NotImplementedError("malformed FRAME header")
        start = fnl + 1
        end = start + y_size + 2 * uv_size
        if end > len(payload):
            raise NotImplementedError("truncated frame payload")
        frames.append(
            np.frombuffer(payload[start : start + y_size], np.uint8).reshape(h, w)
        )
        pos = end
    return w, h, fps, np.stack(frames) if frames else np.empty((0, h, w), np.uint8)


def frame_sample(binary_df: DataFrame, every: int = 2) -> DataFrame:
    """REAL video decode + frame sampling over the standard multimodal
    plumbing: each Y4M payload parses executor-side (decode_y4m) and
    every ``every``-th frame emits (frame_idx, width, height, mean
    luma). The training-data shape: videos stay as opaque binary until
    the one mapInPandas pass that samples them — payloads never touch
    the driver, metadata filters prune first, no shuffle."""
    import numpy as np

    from datafusion_gpu_spark.context import ensure_parallelism

    binary_df = ensure_parallelism(binary_df)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "frame_idx", "width", "height", "mean_y")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, _, frames = decode_y4m(bytes(payload))
                for i in range(0, frames.shape[0], every):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["mean_y"].append(
                        round(float(frames[i].astype(np.float64).mean()), 4)
                    )
            yield pd.DataFrame(out)

    return binary_df.select("doc_id", "payload").mapInPandas(run, FRAME_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("src_w", IntegerType()),
        StructField("src_h", IntegerType()),
        StructField("out_w", IntegerType()),
        StructField("out_h", IntegerType()),
        StructField("sum_r", LongType()),
        StructField("sum_g", LongType()),
        StructField("sum_b", LongType()),
    ]
)


def resize_nearest(binary_df: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor image resize over the standard multimodal
    plumbing (the thumbnail / vision-encoder-input-prep step): decode
    executor-side, index-map with

        src_x = floor(x_out * src_w / out_w)
        src_y = floor(y_out * src_h / out_h)

    (pure integer arithmetic — no interpolation, so every output pixel
    is exactly reproducible by a SQL oracle), and emit the resized
    image's exact per-channel SUMS. Arrow-batched mapInPandas, payloads
    never touch the driver, no shuffle — the same scale contract as
    decode_features."""
    import numpy as np

    from datafusion_gpu_spark.context import ensure_parallelism

    binary_df = ensure_parallelism(binary_df)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "src_w", "src_h", "out_w", "out_h",
                "sum_r", "sum_g", "sum_b",
            )}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                px = decode_image_array(bytes(payload))
                h, w = px.shape[0], px.shape[1]
                ys = (np.arange(out_h) * h) // out_h
                xs = (np.arange(out_w) * w) // out_w
                rz = px[np.ix_(ys, xs)]
                out["doc_id"].append(doc_id)
                out["src_w"].append(w)
                out["src_h"].append(h)
                out["out_w"].append(out_w)
                out["out_h"].append(out_h)
                out["sum_r"].append(int(rz[..., 0].astype(np.int64).sum()))
                out["sum_g"].append(int(rz[..., 1].astype(np.int64).sum()))
                out["sum_b"].append(int(rz[..., 2].astype(np.int64).sum()))
            yield pd.DataFrame(out)

    return binary_df.select("doc_id", "payload").mapInPandas(run, RESIZED_SCHEMA)


# -- perceptual hashing ------------------------------------------------------

#: Integer-quantized DCT-II basis: PHASH_COEF[u][x] = round(1024 *
#: cos(pi * (2x+1) * u / 16)). Computed ONCE in Python and shared with
#: the oracle's generated SQL, so no libm cosine is evaluated at query
#: time on either engine — the whole transform is exact int64.
import math as _math

PHASH_COEF = [
    [round(1024 * _math.cos(_math.pi * (2 * x + 1) * u / 16)) for x in range(8)]
    for u in range(8)
]

PHASH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("phash", LongType()),
        StructField("n_bits", IntegerType()),
    ]
)


def phash64(binary_df: DataFrame) -> DataFrame:
    """64-bit perceptual hash (pHash family: mean-pool -> 2-D DCT-II ->
    median-threshold the AC coefficients) over REAL decoded image
    payloads — the multimodal near-dup key: a re-encoded, slightly
    recolored or noise-dusted copy of an image keeps the same low-
    frequency structure, so its pHash lands within a few bits while
    cryptographic hashes (dedup_exact's md5) see a different file.

    Exactness discipline: every stage is INTEGER arithmetic — luma
    (299R + 587G + 114B) // 1000, 2x2 mean-pool as sum // 4, the DCT
    with the module-level integer-quantized basis (products bounded by
    255 * 1024^2 * 64 < 2^63), and the 63-AC-coefficient median of an
    odd count, which is the exact middle order statistic. A SQL engine
    replays the transform bit-for-bit from the same constants; no
    float forms anywhere.

    Input: (doc_id, payload) with 16x16 decodable images (PPM/BMP via
    :func:`decode_image_array`). Arrow-batched ``mapInPandas``, one
    Python stage, no shuffle. Returns (doc_id, phash, n_bits); bit i-1
    of ``phash`` is coefficient index i = 8u + v (DC excluded), set
    when F(u,v) exceeds the AC median. Pair generation downstream is
    the existing banded-equality machinery (dedup_simhash's pigeonhole:
    any 16-bit band equality join guarantees completeness at hamming
    <= 3 with 4 bands)."""
    import numpy as np

    coef = np.array(PHASH_COEF, dtype=np.int64)

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "phash": [], "n_bits": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                arr = decode_image_array(bytes(payload)).astype(np.int64)
                if arr.shape[0] != 16 or arr.shape[1] != 16:
                    raise ValueError(f"phash64 expects 16x16, got {arr.shape}")
                luma = (
                    299 * arr[:, :, 0] + 587 * arr[:, :, 1] + 114 * arr[:, :, 2]
                ) // 1000
                pooled = (
                    luma[0::2, 0::2]
                    + luma[0::2, 1::2]
                    + luma[1::2, 0::2]
                    + luma[1::2, 1::2]
                ) // 4
                dct = coef @ pooled @ coef.T
                ac = np.delete(dct.reshape(64), 0)
                med = int(np.median(ac))  # 63 values: exact middle statistic
                bits = (ac > med).astype(np.int64)
                phash = int(sum(int(b) << i for i, b in enumerate(bits)))
                out["doc_id"].append(int(doc_id))
                out["phash"].append(phash)
                out["n_bits"].append(int(bits.sum()))
            yield pd.DataFrame(out)

    return binary_df.mapInPandas(compute, PHASH_SCHEMA)
