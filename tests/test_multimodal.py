"""Multimodal decode stubs: deterministic fakes exercise the real
plumbing (schema, batching, windowing arithmetic); the NotImplementedError
slots mark exactly where codecs/models plug in."""

from __future__ import annotations

import math

import pytest

from vector_database_app_spark.operators import multimodal


@pytest.fixture(scope="module")
def payload(spark):
    return spark.createDataFrame(
        [(0, bytes([128] * 16000)), (1, bytes([0, 255] * 12000)), (2, b"x")],
        "doc_id long, payload binary",
    )


def test_audio_features_deterministic_fake(payload):
    rows = {r.doc_id: r for r in multimodal.decode_audio_features(payload).collect()}
    # doc 0: one second of silence (all samples at the 128 midpoint)
    assert rows[0].duration_ms == 1000
    assert rows[0].rms_energy == 0.0
    assert rows[0].n_windows == 1
    # doc 1: 24000 samples of a 0/255 square wave -> 1500 ms, 2 windows
    assert rows[1].duration_ms == 1500
    assert rows[1].n_windows == 2
    assert rows[1].rms_energy == round(
        math.sqrt((128.0**2 + 127.0**2) / 2), 6
    )
    # doc 2: sub-millisecond payload still yields a valid row
    assert rows[2].n_samples == 1 and rows[2].n_windows == 1
    assert all(r.sample_rate == 16000 for r in rows.values())


def test_audio_features_real_slot_raises(payload):
    df = multimodal.decode_audio_features(payload, deterministic_fake=False)
    with pytest.raises(Exception, match="soundfile|librosa|ffmpeg"):
        df.collect()
