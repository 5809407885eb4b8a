"""Binary (sign-bit) quantization search (search.binary_quantize /
binary_search): word-packing invariants, the exactness-restoring re-rank,
and the space-mismatch guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_database_app_spark.operators import search
from vector_database_app_spark.operators.search import EmbeddingSpaceMismatch
from vector_database_app_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    # unpersist on teardown: Spark cache matching is canonicalized-plan
    # based, so a leaked persist of this scan would silently serve
    # InMemoryRelation to EVERY later test reading the same parquet —
    # including the plan-shape gates asserting parquet PushedFilters.
    df = load_table(spark, SF, "embeddings").persist()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def queries(emb):
    return emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_embedding"),
    )


def test_sign_words_fit_unsigned_32(emb):
    """MSB-first fold keeps each packed word in [0, 2^32) — no negative
    values, so Hamming XOR never touches the sign bit."""
    q = search.binary_quantize(emb, "embedding", dims=64)
    row = q.agg(
        F.min("bq0"), F.max("bq0"), F.min("bq1"), F.max("bq1")
    ).first()
    assert min(row) >= 0
    assert max(row) < 2**32


def test_packing_matches_python_reference(emb):
    """The packed word equals an independent per-row Python repack of the
    same floats (element i of the slice → bit 31-i)."""
    rows = (
        search.binary_quantize(emb, "embedding", dims=64)
        .select("embedding", "bq0", "bq1")
        .limit(20)
        .collect()
    )
    for r in rows:
        for w, col in ((0, "bq0"), (1, "bq1")):
            expect = 0
            for i, x in enumerate(r["embedding"][w * 32 : w * 32 + 32]):
                expect = expect * 2 + (1 if x > 0 else 0)
            assert r[col] == expect


def test_cover_all_shortlist_equals_exact_knn(emb, queries):
    """With a shortlist covering the whole corpus the Hamming stage cannot
    evict anyone, so the composite must equal exact brute-force top-k —
    the same recall-restoration invariant pinned for IVF-PQ."""
    corpus = emb.filter(F.col("vec_id") >= 3)
    n = corpus.count()
    approx = search.binary_search(corpus, queries, k=5, shortlist=n).select(
        "query_id", "vec_id", "sim", "rk"
    )
    exact = search.knn_batch(corpus, queries, k=5).select(
        "query_id", "vec_id", "sim", "rk"
    )
    a = {tuple(r) for r in approx.collect()}
    e = {tuple(r) for r in exact.collect()}
    assert a == e


def test_tight_shortlist_recall_is_reasonable(emb, queries):
    """Hamming-50 shortlist over ~497 vectors should recover most of the
    exact top-5 (sign sketch preserves angle ordering in expectation)."""
    corpus = emb.filter(F.col("vec_id") >= 3)
    approx = search.binary_search(corpus, queries, k=5, shortlist=50)
    exact = search.knn_batch(corpus, queries, k=5)
    a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    assert len(a & e) / len(e) >= 0.6


def test_space_mismatch_guard(emb, queries):
    with pytest.raises(EmbeddingSpaceMismatch):
        search.binary_search(
            emb, queries, corpus_space="clipstub", query_space="hash64"
        )
