"""run_search composition tests: the reference's flagship lifecycle (SURVEY
§3.1) over a hand-planted chunks table — text search, cross-modal search,
image search, space safety, location filter, fusion, RRF."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from vector_database_app_spark.functions.embed import CLIP_STUB_SPACE
from vector_database_app_spark.operators import rag
from vector_database_app_spark.operators.search import EmbeddingSpaceMismatch, knn_batch
from vector_database_app_spark.sources import ingest


@pytest.fixture(scope="module")
def chunks(spark):
    """Planted corpus: 3 text docs + 2 'images' whose payloads carry text."""
    texts = [
        ("data/a.txt", "0", "the quarterly revenue grew twelve percent"),
        ("data/a.txt", "1", "cloud segment operating income detail"),
        ("data/b.txt", "0", "unrelated text about gardening tulips"),
    ]
    images = [
        ("data/deck.pptx", "7", b"bar chart of quarterly revenue growth"),
        ("data/deck.pptx", "9", b"photo of a garden with tulips"),
    ]
    rows = [
        {
            "doc_name": d, "doc_type": d.rsplit(".", 1)[-1], "page_num": 0,
            "content_type": "text_chunk", "content_id": c, "content_raw": t,
            "content_bytes": None, "bbox": None, "file_hash": "h" + c,
            "timestamp": None, "error": None,
        }
        for d, c, t in texts
    ] + [
        {
            "doc_name": d, "doc_type": "pptx", "page_num": 1,
            "content_type": "image", "content_id": c, "content_raw": None,
            "content_bytes": b, "bbox": None, "file_hash": "i" + c,
            "timestamp": None, "error": None,
        }
        for d, c, b in images
    ]
    df = spark.createDataFrame(rows, schema=ingest.PARSED_SCHEMA)
    return ingest.embed_chunks(df).cache()


def test_text_search_ranks_planted_match_first(chunks):
    hits = rag.text_search(chunks, "quarterly revenue grew", top_n=2).collect()
    assert hits[0].content_raw == "the quarterly revenue grew twelve percent"
    assert all(h.content_type != "image" for h in hits)


def test_cross_modal_text_query_finds_matching_image(chunks):
    hits = rag.cross_modal_search(chunks, "quarterly revenue growth chart", top_n=1).collect()
    assert len(hits) == 1
    assert hits[0].content_type == "image"
    assert hits[0].content_id == "7"  # the revenue chart, not the garden photo


def test_image_search_per_query_topk(chunks, spark):
    q = spark.createDataFrame(
        [(0, b"garden tulips photo"), (1, b"revenue bar chart")],
        "query_id int, payload binary",
    )
    hits = rag.image_search(chunks, q, top_n=1).collect()
    best = {h.query_id: h.content_id for h in hits}
    assert best == {0: "9", 1: "7"}


def test_space_mismatch_refused(chunks, spark):
    """hash-64 corpus vs clipstub query must raise, not return garbage."""
    with pytest.raises(EmbeddingSpaceMismatch):
        knn_batch(
            chunks.filter(F.col("content_type") == "text_chunk"),
            spark.range(1).select(
                F.lit(0).alias("query_id"),
                F.lit(None).cast("array<float>").alias("query_embedding"),
            ),
            corpus_space="hash-64",
            query_space=CLIP_STUB_SPACE,
        )


def test_search_location_filter(chunks):
    hits = rag.text_search(
        chunks, "tulips gardening", top_n=5, search_location="data/a.txt"
    ).collect()
    assert {h.doc_name for h in hits} == {"data/a.txt"}


def test_run_search_fuses_modalities(chunks):
    fused = rag.run_search(chunks, query_text="quarterly revenue", top_n=2)
    rows = fused.collect()
    kinds = {r.content_type for r in rows}
    assert kinds == {"text_chunk", "image"}
    assert all(r.search_reference == "quarterly revenue" for r in rows)
    with pytest.raises(ValueError):
        rag.run_search(chunks)


def test_run_search_negative_query_id_fails_in_plan(chunks, spark):
    """The reserved-id guard is an in-plan raise_error, not a driver-side
    pre-flight count: building the query fires no job, executing it fails
    on the bad row."""
    bad = spark.createDataFrame(
        [(-1, b"some image")], "query_id int, payload binary"
    )
    before = spark.sparkContext._jsc.sc().dagScheduler().numTotalJobs()
    out = rag.run_search(chunks, query_images=bad, top_n=1)  # builds fine
    after = spark.sparkContext._jsc.sc().dagScheduler().numTotalJobs()
    assert after == before, "validation must not fire a Spark job at build"
    with pytest.raises(Exception, match="query_id must be >= 0"):
        out.collect()


def test_image_text_search_v5(chunks, spark):
    """Reference V5 (image→text, the TODO at vector_db.py:757): a query
    image whose payload carries revenue-chart text retrieves the revenue
    TEXT chunk first — both sides embedded by the paired clipstub towers."""
    q = spark.createDataFrame(
        [(0, b"quarterly revenue grew")], "query_id int, payload binary"
    )
    hits = rag.image_text_search(chunks, q, top_n=2).collect()
    assert all(h.content_type == "text_chunk" for h in hits)
    assert hits[0].content_raw == "the quarterly revenue grew twelve percent"


def test_image_text_search_guard_hash64_corpus(chunks, spark):
    """The stored hash-64 text embeddings must NEVER be dotted against a
    clipstub image query: skipping the re-embed (what a naive V5 port
    would do) trips EmbeddingSpaceMismatch instead of returning garbage."""
    q = spark.createDataFrame(
        [(0, b"anything")], "query_id int, payload binary"
    )
    from vector_database_app_spark.functions.embed import clip_stub_image_embed

    text_corpus = chunks.filter(F.col("content_type") != "image").withColumn(
        "chunk_uid", F.concat_ws("#", "doc_name", "content_id")
    )
    with pytest.raises(EmbeddingSpaceMismatch):
        knn_batch(
            text_corpus,  # still tagged hash-64
            q.select(
                "query_id",
                clip_stub_image_embed(F.col("payload")).alias("query_embedding"),
            ),
            vec_col="embedding",
            id_col="chunk_uid",
            corpus_space="hash-64",
            query_space=CLIP_STUB_SPACE,
        )


def test_rrf_fusion_known_ranks(spark):
    a = spark.createDataFrame([(1, 0.9), (2, 0.8)], "doc_id long, sim double")
    b = spark.createDataFrame([(2, 0.7), (3, 0.6)], "doc_id long, sim double")
    got = {r.doc_id: (r.rrf, r.n_lists) for r in rag.rrf_fusion(a, b).collect()}
    assert got[2] == (round(1 / 62 + 1 / 61, 6), 2)  # rank 2 in a, rank 1 in b
    assert got[1] == (round(1 / 61, 6), 1)
    assert got[3] == (round(1 / 62, 6), 1)


def test_cross_encoder_model_slot_raises(spark):
    hits = spark.createDataFrame(
        [(0, "q", 2, "t")], "query_id long, query_text string, doc_id long, text string"
    )
    with pytest.raises(NotImplementedError):
        rag.cross_encoder_rerank(hits, backend="model")
    with pytest.raises(ValueError):
        rag.cross_encoder_rerank(hits, backend="nope")


def test_cross_encoder_scores_match_hashlib(spark):
    """The Arrow-UDF score equals a driver-side hashlib recomputation."""
    import hashlib

    hits = spark.createDataFrame(
        [(0, "alpha", 2, "beta"), (0, "alpha", 3, "gamma")],
        "query_id long, query_text string, doc_id long, text string",
    )
    rows = rag.cross_encoder_rerank(hits, k=2).collect()
    for r in rows:
        t = {2: "beta", 3: "gamma"}[r.doc_id]
        assert r.ce_score == hashlib.md5(f"alpha\x1f{t}".encode()).hexdigest()
