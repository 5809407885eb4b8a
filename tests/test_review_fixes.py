"""Regression pins for the round-4 review findings: the triangle-count
orientation-key collision, the DSIR zero-target division, corrupt media
containers, and the rounded-logit keep boundary."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vector_database_app_spark.functions import media
from vector_database_app_spark.operators import graph, multimodal, textops


def test_triangle_count_big_node_ids(spark):
    """Node ids >= 10^9 collided under the old scalar deg*1e9+node
    orientation key (deg difference compensated the id difference),
    silently dropping triangles. The struct (deg, node) key cannot
    collide for distinct nodes."""
    edges = spark.createDataFrame(
        [(1, 10**9), (1, 2 * 10**9), (10**9, 2 * 10**9), (10**9, 3)],
        "src long, dst long",
    )
    out = sorted(
        (r.node, r.n_triangles)
        for r in graph.triangle_count(edges).collect()
    )
    assert out == [(1, 1), (10**9, 1), (2 * 10**9, 1)], out


def test_triangle_count_equal_degree_ties(spark):
    """A clique of equal-degree nodes exercises the id tiebreak of the
    lexicographic key: K4 has exactly C(4,3)=4 triangles, 3 per node."""
    nodes = [5, 6, 7, 8]
    edges = spark.createDataFrame(
        [(a, b) for a in nodes for b in nodes if a < b],
        "src long, dst long",
    )
    out = {r.node: r.n_triangles for r in graph.triangle_count(edges).collect()}
    assert out == {5: 3, 6: 3, 7: 3, 8: 3}


def test_dsir_zero_target_language(spark):
    """An absent target language must yield NULL scores / unselected,
    not an ANSI DIVIDE_BY_ZERO that kills the job."""
    docs = spark.createDataFrame(
        [(0, "hello world", "en"), (1, "bonjour monde", "fr")],
        "doc_id long, text string, lang string",
    )
    rows = textops.dsir_scores(docs, target_langs=("ja",)).collect()
    assert len(rows) == 2
    for r in rows:
        assert r.dsir_score is None
        assert r.selected is False
        assert r.target_mass == 0


def test_corrupt_containers_fall_back_to_fake(spark):
    """PNG/WAV magic with corrupt bodies must not kill the stage when
    deterministic_fake=True — one bad payload in a 100 TB corpus is
    data, not an engine failure."""
    bad_png = media.PNG_MAGIC + b"\x00\x00\x00\x04IDATxxxx"  # no IHDR
    img = np.zeros((3, 3, 3), dtype=np.uint8)
    good_png = media.png_encode(img)
    bad_wav = b"RIFF" + b"\x10\x00\x00\x00" + b"WAVEjunkjunkjunk"
    df = spark.createDataFrame(
        [
            (0, bytearray(bad_png)),
            (1, bytearray(good_png)),
            (2, bytearray(bad_wav)),
        ],
        "doc_id long, payload binary",
    )
    feats = {r.doc_id: r for r in multimodal.decode_image_features(df).collect()}
    assert (feats[1].width, feats[1].height) == (3, 3)  # real branch
    assert 64 <= feats[0].width < 256  # fake fallback, digest dims
    audio = {r.doc_id: r for r in multimodal.decode_audio_features(df).collect()}
    assert audio[2].sample_rate == 16000  # fake-PCM fallback contract
    resized = {r.doc_id: r for r in multimodal.resize_images(df).collect()}
    assert resized[0].resized_bytes == 224 * 224 * 3  # fake model size
    # strict mode surfaces the corruption instead of faking it
    with pytest.raises(Exception):
        multimodal.decode_image_features(
            df.filter(F.col("doc_id") == 0), deterministic_fake=False
        ).collect()


def test_trained_classifier_keep_matches_emitted_logit(spark):
    """keep must be decided on the EMITTED rounded logit: build a model
    whose raw logit is a tiny positive epsilon — round(logit,6)=0.0, so
    keep must be False (previously True from the raw logit)."""
    docs = spark.createDataFrame(
        [(0, "the a data")], "doc_id long, text string"
    )
    # weights 0 + intercept epsilon: logit = 2e-7 for every doc
    out = textops.serve_quality_classifier(
        docs, [0.0, 0.0, 0.0, 0.0], 2e-7
    ).collect()[0]
    assert out.quality_logit == 0.0
    assert out.keep is False


def test_srp_bucket_zero_bits_is_bucket_zero(spark):
    """Advisor r8: n_bits=0 used to generate 'CAST(0 AS BIGINT) + ' —
    the empty terms join left a trailing operator, a plan-time parse
    error where the pre-generated-SQL Column form returned bucket 0."""
    from vector_database_app_spark.operators.search import _srp_bucket

    df = spark.createDataFrame([([0.5, -0.5],)], "embedding array<double>")
    rows = df.select(_srp_bucket("embedding", 0, 2).alias("b")).collect()
    assert [r.b for r in rows] == [0]


def test_unigram_batched_prune_lands_exactly_on_vocab_size(spark):
    """Advisor r8: the exact=False float geometric schedule could
    overshoot the LAST round to vocab_size+1 (e.g. ceil(25*(7/25)**1.0)
    == 8 — the float product lands just above the integer), keeping one
    extra multi-char piece despite the docstring's lands-exactly claim.
    The final round is now pinned to vocab_size outright; em_rounds=1
    makes the single round the pinned one."""
    from vector_database_app_spark.operators import unigram

    docs = spark.createDataFrame(
        [(i, "the quick brown foxes jump over many lazy dogs today "
             "while other words pad the piece inventory",) for i in range(4)],
        "doc_id long, text string",
    )
    got = unigram.unigram_train(
        docs, vocab_size=7, max_piece_len=3, seed_size=60,
        em_rounds=1, exact=False,
    )
    assert sum(len(r["piece"]) >= 2 for r in got) <= 7
