"""Built-in image decoders (pure NumPy PPM/BMP) and the real decode
pass over the multimodal mapInPandas plumbing."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from datafusion_gpu_spark.operators.multimodal import (
    decode_features,
    decode_image_array,
)


def _ppm_bytes(pixels: np.ndarray, comment: bool = False) -> bytes:
    h, w, _ = pixels.shape
    header = b"P6\n"
    if comment:
        header += b"# a comment\n"
    header += f"{w} {h}\n255\n".encode()
    return header + pixels.astype(np.uint8).tobytes()


def _bmp24_bytes(pixels: np.ndarray) -> bytes:
    """Bottom-up 24-bpp BMP with row padding — the classic layout."""
    h, w, _ = pixels.shape
    row_bytes = (w * 3 + 3) & ~3
    pad = row_bytes - w * 3
    raster = b""
    for row in pixels[::-1]:  # bottom-up
        raster += row[:, ::-1].astype(np.uint8).tobytes()  # RGB -> BGR
        raster += b"\x00" * pad
    data_offset = 14 + 40
    header = b"BM" + struct.pack(
        "<IHHI", data_offset + len(raster), 0, 0, data_offset
    )
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 0, 0, 0, 0)
    return header + dib + raster


@pytest.fixture
def rgb_2x3():
    # height=2, width=3, distinct channel values everywhere
    return np.array(
        [[[255, 0, 0], [0, 255, 0], [0, 0, 255]],
         [[10, 20, 30], [40, 50, 60], [70, 80, 90]]],
        dtype=np.uint8,
    )


def test_ppm_decode_exact(rgb_2x3):
    out = decode_image_array(_ppm_bytes(rgb_2x3))
    assert out.shape == (2, 3, 3)
    assert (out == rgb_2x3).all()
    # header comments are skipped
    out2 = decode_image_array(_ppm_bytes(rgb_2x3, comment=True))
    assert (out2 == rgb_2x3).all()


def test_bmp_decode_exact_including_padding(rgb_2x3):
    # width=3 -> 9 bytes/row, padded to 12: the decoder must strip pad
    # bytes, flip bottom-up rows, and swap BGR back to RGB
    out = decode_image_array(_bmp24_bytes(rgb_2x3))
    assert out.shape == (2, 3, 3)
    assert (out == rgb_2x3).all()


def test_unknown_payload_raises():
    with pytest.raises(NotImplementedError):
        decode_image_array(b"\x89PNG\r\n\x1a\n not actually decodable here")


def test_decode_features_mixed_formats_through_spark(spark, rgb_2x3):
    solid = np.full((4, 5, 3), (100, 150, 200), dtype=np.uint8)
    rows = [
        (1, bytearray(_ppm_bytes(rgb_2x3))),
        (2, bytearray(_bmp24_bytes(solid))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in decode_features(df).collect()}
    assert (got[1].height, got[1].width, got[1].channels) == (2, 3, 3)
    assert (got[2].height, got[2].width) == (4, 5)
    # solid-color image: channel means are exact
    assert (got[2].mean_r, got[2].mean_g, got[2].mean_b) == (100, 150, 200)
    # rgb_2x3 means: r=(255+10+40+70)/6=62, g=(255+20+50+80)/6=67,
    # b=(255+30+60+90)/6=72 (int truncation)
    assert (got[1].mean_r, got[1].mean_g, got[1].mean_b) == (62, 67, 72)


def test_ppm_crlf_after_maxval_decodes_exactly(rgb_2x3):
    # Windows tooling emits \r\n where the spec wants one whitespace
    # byte — the decoder must not shift the raster by one
    h, w, _ = rgb_2x3.shape
    payload = f"P6\n{w} {h}\n255\r\n".encode() + rgb_2x3.tobytes()
    out = decode_image_array(payload)
    assert (out == rgb_2x3).all()


def test_ppm_truncated_raster_raises(rgb_2x3):
    good = _ppm_bytes(rgb_2x3)
    with pytest.raises(ValueError, match="length mismatch"):
        decode_image_array(good[:-4])


def test_wav_pcm16_roundtrip_exact():
    import numpy as np

    from datafusion_gpu_spark.operators.multimodal import (
        decode_wav_pcm16,
        encode_wav_pcm16,
    )

    rng = np.random.default_rng(3)
    s = rng.integers(-32768, 32767, size=(1000, 2), dtype=np.int16)
    rate, out = decode_wav_pcm16(encode_wav_pcm16(s, 44100))
    assert rate == 44100 and out.shape == (1000, 2)
    assert (out == s).all()  # bit-exact through the container


def test_wav_decode_skips_extra_chunks():
    import struct

    import numpy as np

    from datafusion_gpu_spark.operators.multimodal import (
        decode_wav_pcm16,
        encode_wav_pcm16,
    )

    s = np.arange(-5, 6, dtype=np.int16)
    payload = encode_wav_pcm16(s, 8000)
    # splice an odd-sized LIST chunk between fmt and data (word-aligned
    # walk must skip the pad byte)
    fmt_end = 12 + 8 + 16
    extra = struct.pack("<4sI", b"LIST", 5) + b"INFOx" + b"\x00"
    spliced = payload[:fmt_end] + extra + payload[fmt_end:]
    rate, out = decode_wav_pcm16(spliced)
    assert rate == 8000 and (out[:, 0] == s).all()


def test_wav_decode_rejects_non_pcm():
    import struct

    import numpy as np
    import pytest

    from datafusion_gpu_spark.operators.multimodal import (
        decode_wav_pcm16,
        encode_wav_pcm16,
    )

    payload = bytearray(encode_wav_pcm16(np.zeros(4, dtype=np.int16), 8000))
    payload[20:22] = struct.pack("<H", 3)  # audio_format = IEEE float
    with pytest.raises(NotImplementedError):
        decode_wav_pcm16(bytes(payload))
    with pytest.raises(NotImplementedError):
        decode_wav_pcm16(b"OggS garbage")


def test_audio_features_stereo(spark):
    import numpy as np
    import pandas as pd

    from datafusion_gpu_spark.operators.multimodal import (
        audio_features,
        encode_wav_pcm16,
    )

    # stereo: left all +100, right all -200 -> rms over both channels
    s = np.stack(
        [np.full(800, 100, np.int16), np.full(800, -200, np.int16)], axis=1
    )
    pdf = pd.DataFrame({"doc_id": [1], "payload": [encode_wav_pcm16(s, 16000)]})
    df = spark.createDataFrame(pdf)
    [r] = audio_features(df).collect()
    assert (r["channels"], r["n_samples"], r["duration_ms"]) == (2, 800, 50)
    assert r["peak"] == 200
    expected_rms = round(float(np.sqrt((100**2 + 200**2) / 2)), 4)
    assert r["rms"] == expected_rms


def test_y4m_roundtrip_exact():
    import numpy as np

    from datafusion_gpu_spark.operators.multimodal import decode_y4m, encode_y4m

    rng = np.random.default_rng(11)
    frames = rng.integers(0, 256, size=(5, 6, 8), dtype=np.uint8)
    w, h, fps, out = decode_y4m(encode_y4m(frames, fps=30))
    assert (w, h, fps) == (8, 6, 30)
    assert (out == frames).all()  # luma survives bit-exact


def test_y4m_rejects_non_c420_and_garbage():
    import numpy as np
    import pytest

    from datafusion_gpu_spark.operators.multimodal import decode_y4m, encode_y4m

    payload = encode_y4m(np.zeros((1, 4, 4), np.uint8))
    with pytest.raises(NotImplementedError):
        decode_y4m(payload.replace(b"C420", b"C444"))
    with pytest.raises(NotImplementedError):
        decode_y4m(b"RIFF not a video")
    with pytest.raises(NotImplementedError):
        decode_y4m(payload[:-3])  # truncated final frame


def test_frame_sample_stride_and_means(spark):
    import numpy as np
    import pandas as pd

    from datafusion_gpu_spark.operators.multimodal import encode_y4m, frame_sample

    # 7 frames, mean luma f*10 -> sampled 0,3,6 with exact means
    frames = np.stack([np.full((4, 4), f * 10, np.uint8) for f in range(7)])
    pdf = pd.DataFrame({"doc_id": [9], "payload": [encode_y4m(frames)]})
    out = frame_sample(spark.createDataFrame(pdf), every=3).orderBy("frame_idx")
    got = [(r["frame_idx"], r["mean_y"]) for r in out.collect()]
    assert got == [(0, 0.0), (3, 30.0), (6, 60.0)]


def test_resize_nearest_matches_numpy_reference(spark):
    import numpy as np

    from datafusion_gpu_spark.operators.multimodal import resize_nearest

    # 6x4 gradient image, resize to 3x2; reference = direct numpy index map
    w, h = 6, 4
    y, x = np.mgrid[0:h, 0:w]
    px = np.stack([(3 * x + 5 * y) % 256, (7 * x + y) % 256,
                   (x + 11 * y) % 256], axis=-1).astype(np.uint8)
    payload = f"P6\n{w} {h}\n255\n".encode() + px.tobytes()
    df = spark.createDataFrame([(1, bytearray(payload))],
                               "doc_id long, payload binary")
    out = resize_nearest(df, out_w=3, out_h=2).collect()[0]
    ys = (np.arange(2) * h) // 2
    xs = (np.arange(3) * w) // 3
    ref = px[np.ix_(ys, xs)]
    assert (out["src_w"], out["src_h"]) == (w, h)
    assert out["sum_r"] == int(ref[..., 0].astype(np.int64).sum())
    assert out["sum_g"] == int(ref[..., 1].astype(np.int64).sum())
    assert out["sum_b"] == int(ref[..., 2].astype(np.int64).sum())


def test_resize_upscale_repeats_pixels(spark):
    import numpy as np

    from datafusion_gpu_spark.operators.multimodal import resize_nearest

    # 1x1 red pixel upscaled to 4x4 = 16 red pixels
    payload = b"P6\n1 1\n255\n" + bytes([200, 10, 30])
    df = spark.createDataFrame([(1, bytearray(payload))],
                               "doc_id long, payload binary")
    out = resize_nearest(df, out_w=4, out_h=4).collect()[0]
    assert out["sum_r"] == 200 * 16
    assert out["sum_g"] == 10 * 16
    assert out["sum_b"] == 30 * 16


def _ppm16(arr) -> bytes:
    out = bytearray(b"P6\n16 16\n255\n")
    for y in range(16):
        for x in range(16):
            out += bytes(int(v) for v in arr[y][x])
    return bytes(out)


def test_phash64_near_dup_vs_distinct(spark):
    """pHash's defining property, end-to-end through the REAL PPM
    decode: brightness shift -> identical hash; one-pixel dust ->
    within the 4x16-bit-band pigeonhole radius (<= 3); a different
    image -> far."""
    import numpy as np

    from datafusion_gpu_spark.operators.multimodal import phash64

    base = np.zeros((16, 16, 3), np.int64)
    for y in range(16):
        for x in range(16):
            base[y, x] = ((7 * x + 11 * y) % 256, (5 * x + 3 * y) % 256,
                          (x + y) % 256)
    bright = np.clip(base + 6, 0, 255)
    dust = base.copy()
    dust[3, 5] = np.clip(dust[3, 5] + 15, 0, 255)
    other = np.zeros((16, 16, 3), np.int64)
    for y in range(16):
        for x in range(16):
            other[y, x] = ((13 * x * x + y) % 256, (x + 9 * y) % 256,
                           (3 * x) % 256)
    df = spark.createDataFrame(
        [(0, _ppm16(base)), (1, _ppm16(bright)), (2, _ppm16(dust)),
         (3, _ppm16(other))],
        "doc_id long, payload binary",
    )
    got = {r.doc_id: r.phash for r in phash64(df).collect()}
    ham = lambda a, b: bin(a ^ b).count("1")
    assert got[0] == got[1]                 # brightness-invariant
    assert 0 < ham(got[0], got[2]) <= 3     # near-dup radius
    assert ham(got[0], got[3]) > 10         # distinct image is far


def test_phash64_rejects_wrong_size(spark):
    import pytest as _pytest

    from datafusion_gpu_spark.operators.multimodal import phash64

    bad = b"P6\n2 2\n255\n" + bytes(12)
    df = spark.createDataFrame([(0, bad)], "doc_id long, payload binary")
    with _pytest.raises(Exception, match="16x16"):
        phash64(df).collect()


def _wav_of(sig):
    import numpy as np

    from datafusion_gpu_spark.operators.multimodal import encode_wav_pcm16

    return encode_wav_pcm16(np.asarray(sig, dtype=np.int16), 8000)


def test_audio_fingerprint_near_dup_vs_distinct(spark):
    """The fingerprint's defining properties, end-to-end through the
    REAL WAV decode — the audio mirror of the pHash plant suite:
    exact gain change -> identical fingerprint; renormalization with
    rounding -> dust radius (<= 3 bits); small time shift -> near
    (<= 6 bits, see inline note); different audio -> far."""
    import numpy as np

    from datafusion_gpu_spark.operators.multimodal import audio_fingerprint

    n = 31 * 20
    i = np.arange(n, dtype=np.int64)
    # realistic shape: pseudo-noise under a smooth amplitude envelope
    # (a loudness ramp, +1 every 2 frames) — frame energies are then
    # well-separated, the regime the fingerprint is perturbation-robust
    # in. White noise is the adversarial case: all frame energies are
    # statistically identical, every bit is a coin flip around the
    # median, and any perturbation flips many — but two white-noise
    # takes aren't perceptual near-dups either.
    noise = (i * 7919 + 13) % 128 - 64
    base = noise * (1 + i // 40)
    doubled = base * 2                              # exact gain x2
    renorm = np.round(base * 0.7).astype(np.int64)  # rounded renormalize
    shifted = np.roll(base, 3)                      # 3-sample time shift
    other = noise * (1 + (n - 1 - i) // 40)         # reversed envelope
    df = spark.createDataFrame(
        [(0, _wav_of(base)), (1, _wav_of(doubled)), (2, _wav_of(renorm)),
         (3, _wav_of(shifted)), (4, _wav_of(other))],
        "doc_id long, payload binary",
    )
    got = {r.doc_id: r.afp for r in audio_fingerprint(df).collect()}
    ham = lambda a, b: bin(a ^ b).count("1")
    assert got[0] == got[1]                 # gain-invariant by construction
    assert ham(got[0], got[2]) <= 3         # renormalized: inside the
    #                                         4x16-band pigeonhole radius
    # a time shift moves samples across EVERY frame boundary at once,
    # flipping the near-median bits (measured: 5 of 62, deterministic)
    # — ~10x under the ~50% an unrelated clip scores, but outside the
    # hamming<=3 single-table guarantee; the scale path for shifted
    # copies is a second band table over a rotated frame grid (the
    # standard multi-probe LSH move)
    assert 0 < ham(got[0], got[3]) <= 6     # shifted copy: near, not exact
    assert ham(got[0], got[4]) > 20         # distinct audio is far


def test_audio_fingerprint_stereo_mixes_to_mono(spark):
    # a stereo clip whose channels are (x, x) must fingerprint exactly
    # like mono x — the integer mono mix sums channels // n_channels
    import numpy as np

    from datafusion_gpu_spark.operators.multimodal import audio_fingerprint

    n = 31 * 8
    i = np.arange(n, dtype=np.int64)
    x = ((i * 101 + 7) % 2048 - 1024).astype(np.int16)
    stereo = np.stack([x, x], axis=1)
    df = spark.createDataFrame(
        [(0, _wav_of(x)), (1, _wav_of(stereo))], "doc_id long, payload binary"
    )
    got = {r.doc_id: r.afp for r in audio_fingerprint(df).collect()}
    assert got[0] == got[1]


def test_audio_fingerprint_rejects_too_short(spark):
    import numpy as np
    import pytest as _pytest

    from datafusion_gpu_spark.operators.multimodal import audio_fingerprint

    df = spark.createDataFrame(
        [(0, _wav_of(np.zeros(40, np.int16)))], "doc_id long, payload binary"
    )
    with _pytest.raises(Exception, match="samples"):
        audio_fingerprint(df).collect()


def test_audio_neardup_pairs_planted_gain_copy(spark):
    # a gain-2 re-encode pairs with its original at hamming 0; the
    # unrelated clip pairs with nothing (multiplicatively-seeded noise)
    import numpy as np

    from datafusion_gpu_spark.operators.multimodal import audio_neardup_pairs

    n = 31 * 12
    i = np.arange(n, dtype=np.int64)
    mk = lambda seed: ((2 * seed + 1) * (i * i * 31 + i * 7919) + seed * 13) % 4096 - 2048
    base = mk(5)
    df = spark.createDataFrame(
        [(0, _wav_of(base)), (1, _wav_of(base * 2)), (2, _wav_of(mk(9)))],
        "doc_id long, payload binary",
    )
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in audio_neardup_pairs(df).collect()}
    assert pairs == {(0, 1): 0}
