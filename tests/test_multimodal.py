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


def test_resize_images_deterministic_and_real_slot_raises(spark):
    from pyspark.sql import functions as F

    from vector_database_app_spark.operators import multimodal as MM
    from vector_database_app_spark.sources.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(20)
    payload = MM.attach_binary_payload(docs)
    out = MM.resize_images(payload, target=(224, 224))
    pdf = out.toPandas()
    assert len(pdf) == 20
    assert (pdf["target_w"] == 224).all() and (pdf["target_h"] == 224).all()
    assert (pdf["resized_bytes"] == 224 * 224 * 3).all()
    # deterministic: same input -> same digest across runs
    pdf2 = MM.resize_images(payload, target=(224, 224)).toPandas()
    assert sorted(pdf["resized_sha"]) == sorted(pdf2["resized_sha"])
    # digest depends on the target (resize is part of the content identity)
    pdf3 = MM.resize_images(payload, target=(64, 64)).toPandas()
    assert set(pdf["resized_sha"]).isdisjoint(set(pdf3["resized_sha"]))
    # full dims feed the digest: targets 256px apart must NOT collide
    # (a mod-256 fold made (224,224) and (480,224) identical — advisor)
    pdf4 = MM.resize_images(payload, target=(480, 224)).toPandas()
    assert set(pdf["resized_sha"]).isdisjoint(set(pdf4["resized_sha"]))
    # the real-model slot raises exactly at the plug-in line
    import pytest as _pytest

    with _pytest.raises(Exception, match="NotImplementedError|real resize"):
        MM.resize_images(payload, deterministic_fake=False).collect()
