"""functions/media.py stdlib PNG/WAV codecs + the REAL decode branches
they enable in operators/multimodal.py: encode→decode round-trips, all
five PNG filter types un-applied per spec, nearest-neighbor resample
semantics, and the Arrow mapInPandas stages emitting true dimensions /
signal stats for PNG/WAV payloads while non-media payloads keep the
deterministic-fake contract."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from vector_database_app_spark.functions import media


def _rand(shape, seed):
    return np.random.default_rng(seed).integers(
        0, 256, size=shape, dtype=np.uint8
    )


@pytest.mark.parametrize(
    "shape",
    [(5, 7), (5, 7, 1), (8, 3, 3), (4, 4, 4), (1, 1, 3), (16, 16, 3)],
)
def test_png_roundtrip_all_channel_shapes(shape):
    img = _rand(shape, seed=hash(shape) % 2**32)
    dec = media.png_decode(media.png_encode(img))
    want = img if img.ndim == 3 else img[:, :, None]
    assert dec.shape == want.shape
    assert np.array_equal(dec, want)


def test_png_decode_unapplies_every_filter_type():
    """Forward-filter a known image row-by-row with each of the five
    spec filters (None/Sub/Up/Average/Paeth), assemble a PNG by hand,
    and require the decoder to reconstruct the original exactly — the
    encoder only emits filter 0, so this is the only way to prove the
    other four reconstruction paths."""
    img = _rand((5, 6, 3), seed=42)
    h, w, c = img.shape
    stride = w * c
    flat = img.reshape(h, stride).astype(np.int32)

    def paeth_pred(left, up, ul):
        pa, pb, pc = abs(up - ul), abs(left - ul), abs(left + up - 2 * ul)
        return left if pa <= pb and pa <= pc else (up if pb <= pc else ul)

    raw = bytearray()
    for y, ftype in enumerate([0, 1, 2, 3, 4]):
        raw.append(ftype)
        prev = flat[y - 1] if y > 0 else np.zeros(stride, dtype=np.int32)
        for x in range(stride):
            cur = int(flat[y][x])
            left = int(flat[y][x - c]) if x >= c else 0
            up = int(prev[x])
            ul = int(prev[x - c]) if x >= c else 0
            if ftype == 0:
                v = cur
            elif ftype == 1:
                v = cur - left
            elif ftype == 2:
                v = cur - up
            elif ftype == 3:
                v = cur - ((left + up) >> 1)
            else:
                v = cur - paeth_pred(left, up, ul)
            raw.append(v & 0xFF)

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    png = (
        media.PNG_MAGIC
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(media.png_decode(png), img)


def test_png_decode_rejects_non_png_and_unsupported():
    with pytest.raises(ValueError):
        media.png_decode(b"not a png at all")
    # 16-bit depth is out of scope and must raise, not mis-decode
    bad_ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    png = media.PNG_MAGIC + chunk(b"IHDR", bad_ihdr) + chunk(
        b"IDAT", zlib.compress(b"\x00" * 26)
    ) + chunk(b"IEND", b"")
    with pytest.raises(ValueError):
        media.png_decode(png)


def test_resize_nearest_semantics():
    img = _rand((10, 20, 3), seed=7)
    up = media.resize_nearest(img, 40, 30)
    assert up.shape == (30, 40, 3)
    # identity at the same size
    assert np.array_equal(media.resize_nearest(img, 20, 10), img)
    # every output pixel is an exact source pixel (floor mapping)
    for ty in (0, 29):
        for tx in (0, 39):
            sy, sx = (ty * 10) // 30, (tx * 20) // 40
            assert np.array_equal(up[ty, tx], img[sy, sx])


def test_wav_roundtrip_int16_and_8bit():
    sam = (
        np.round(
            12000 * np.sin(np.arange(1600) * 2 * np.pi * 440 / 16000)
        ).astype(np.int16)
    )
    b = media.wav_encode(sam, rate=16000, channels=1)
    assert media.is_wav(b)
    dec, rate, ch = media.wav_decode(b)
    assert (rate, ch) == (16000, 1)
    assert np.array_equal(dec[:, 0], sam)
    # 8-bit path widens per spec (unsigned → centered int16)
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(1)
        wv.setframerate(8000)
        wv.writeframes(bytes([0, 128, 255]))
    dec8, rate8, _ = media.wav_decode(buf.getvalue())
    assert rate8 == 8000
    assert list(dec8[:, 0]) == [-32768, 0, 32512]


@pytest.fixture(scope="module")
def payload_df(spark):
    img = _rand((12, 9, 3), seed=3)
    png = media.png_encode(img)
    sam = np.full(3200, 1000, dtype=np.int16)
    wav = media.wav_encode(sam, rate=16000)
    rows = [(0, bytearray(png)), (1, bytearray(wav)), (2, bytearray(b"plain text bytes"))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    return df, img, sam


def test_image_stage_decodes_real_png(payload_df):
    from vector_database_app_spark.operators import multimodal

    df, img, _ = payload_df
    got = {
        r.doc_id: r
        for r in multimodal.decode_image_features(df).collect()
    }
    # PNG row: true dims + per-channel mean/std features
    r0 = got[0]
    assert (r0.width, r0.height, r0.channels) == (9, 12, 3)
    want = img.reshape(-1, 3).astype(np.float64) / 255.0
    exp = []
    for ch in range(3):
        exp += [want[:, ch].mean(), want[:, ch].std()]
    exp = [round(float(x), 6) for x in (exp + [0.0] * 8)[:8]]
    assert [round(float(x), 6) for x in r0.features] == exp
    # non-media rows keep the deterministic fake (dims from the digest)
    assert got[2].channels == 3
    assert 64 <= got[2].width < 256


def test_resize_stage_roundtrips_real_png(payload_df):
    from vector_database_app_spark.operators import multimodal

    df, img, _ = payload_df
    got = {
        r.doc_id: r
        for r in multimodal.resize_images(df, target=(4, 6)).collect()
    }
    import hashlib

    want = media.png_encode(media.resize_nearest(img, 4, 6))
    assert got[0].resized_bytes == len(want)
    assert got[0].resized_sha == hashlib.sha256(want).hexdigest()
    # and the advertised artifact decodes to the nearest-neighbor image
    assert np.array_equal(
        media.png_decode(want), media.resize_nearest(img, 4, 6)
    )


def test_audio_stage_decodes_real_wav(payload_df):
    from vector_database_app_spark.operators import multimodal

    df, _, sam = payload_df
    got = {
        r.doc_id: r
        for r in multimodal.decode_audio_features(df).collect()
    }
    r1 = got[1]
    assert r1.sample_rate == 16000
    assert r1.n_samples == 3200
    assert r1.duration_ms == 200
    assert r1.rms_energy == 1000.0  # constant-amplitude signal
    assert r1.n_windows == 1
    # text payload keeps the fake-PCM contract at the fake rate
    assert got[2].sample_rate == 16000
    assert got[2].n_samples == len(b"plain text bytes")


def test_registry_real_codec_queries(spark):
    """The driver-visible real-path queries: executor-synthesized
    PNG/WAV payloads through the REAL decode branches, with one row
    independently re-derived in Python."""
    import hashlib

    from vector_database_app_spark.registry import QUERIES

    img = {
        r.doc_id: r
        for r in QUERIES["image_features_png"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert len(img) == 200
    # doc 13: re-derive dims + mean_r from the same seeded generator
    seed = 13
    w, h = 4 + seed % 21, 4 + (seed // 7) % 21
    ref = np.random.default_rng(seed).integers(
        0, 256, size=(h, w, 3), dtype=np.uint8
    )
    r13 = img[13]
    assert (r13.width, r13.height, r13.channels) == (w, h, 3)
    # features ride a float32 array column, so compare at float32 grain
    assert abs(
        r13.mean_r - round(float(ref[:, :, 0].mean() / 255.0), 6)
    ) < 1e-6

    wav = {
        r.doc_id: r
        for r in QUERIES["audio_features_wav"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert len(wav) == 200
    seed, rate = 9, 8000
    n = rate // 10 + (seed % 5) * rate // 100
    freq, amp = 200 + (seed % 20) * 25, 8000 + (seed % 4) * 1000
    t = np.arange(n, dtype=np.float64)
    sam = np.round(amp * np.sin(2 * np.pi * freq * t / rate)).astype(
        np.int16
    )
    r9 = wav[9]
    assert (r9.sample_rate, r9.n_samples) == (rate, n)
    assert r9.rms_energy == round(
        float(np.sqrt((sam.astype(np.float64) ** 2).mean())), 6
    )
