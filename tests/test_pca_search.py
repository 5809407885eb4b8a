"""search.pca_search: the PCA-prefilter ANN path — recall against the
engine's own brute-force ground truth, coarse-score fidelity, and
determinism of the two-stage ranking."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vector_database_app_spark.operators.search import (
    knn_batch,
    pca_search,
    pca_train,
)
from vector_database_app_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def setup(spark):
    emb = load_table(spark, SF, "embeddings")
    comps, _ = pca_train(emb, k=16)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_embedding"),
    )
    corpus = emb.filter(F.col("vec_id") >= 5)
    return emb, comps, queries, corpus


def test_recall_at_5_vs_brute_force(setup):
    """16-dim learned projection + 100-deep shortlist must recover at
    least 70% of the exact top-5. The fixture embeddings are nearly
    ISOTROPIC (top PCA axis explains 2.9% vs the 1.56% uniform floor —
    measured), the worst case for any linear prefilter, so this bound
    is the measured 0.84 minus noise margin; real embedding corpora
    concentrate variance and sit far above it. A failure here means the
    projection or the rerank broke, not that ANN is approximate."""
    _, comps, queries, corpus = setup
    approx = pca_search(corpus, queries, comps, k=5, shortlist=100)
    exact = knn_batch(corpus, queries, k=5)
    a = {(r.query_id, r.vec_id) for r in approx.select("query_id", "vec_id").collect()}
    e = {(r.query_id, r.vec_id) for r in exact.select("query_id", "vec_id").collect()}
    assert len(e) == 25  # 5 queries x 5
    recall = len(a & e) / len(e)
    assert recall >= 0.7, recall


def test_full_shortlist_is_exact(setup):
    """With shortlist = |corpus| the coarse stage prunes nothing, so the
    result must EQUAL brute force exactly — isolates the rerank stage."""
    _, comps, queries, corpus = setup
    n = corpus.count()
    approx = pca_search(corpus, queries, comps, k=5, shortlist=n)
    exact = knn_batch(corpus, queries, k=5)
    a = sorted(
        (r.query_id, r.rk, r.vec_id)
        for r in approx.select("query_id", "rk", "vec_id").collect()
    )
    e = sorted(
        (r.query_id, r.rk, r.vec_id)
        for r in exact.select("query_id", "rk", "vec_id").collect()
    )
    assert a == e


def test_coarse_sim_matches_numpy_projection_dot(setup):
    emb, comps, queries, corpus = setup
    out = pca_search(corpus, queries, comps, k=3, shortlist=10)
    rows = out.select("query_id", "vec_id", "coarse_sim").collect()
    vecs = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in emb.select("vec_id", "embedding").collect()
    }
    C = np.array(comps)
    for r in rows:
        want = float((C @ vecs[r.query_id]) @ (C @ vecs[r.vec_id]))
        assert abs(r.coarse_sim - round(want, 6)) < 1e-9, r


def test_deterministic_across_runs(setup):
    _, comps, queries, corpus = setup
    a = pca_search(corpus, queries, comps, k=5, shortlist=20).collect()
    b = pca_search(corpus, queries, comps, k=5, shortlist=20).collect()
    key = lambda r: (r.query_id, r.rk)  # noqa: E731
    assert sorted(a, key=key) == sorted(b, key=key)


def test_registry_query_schema(spark):
    from vector_database_app_spark.registry import QUERIES

    df = QUERIES["knn_pca_search"](spark, SF)
    assert df.columns == [
        "query_id", "vec_id", "label", "coarse_sim", "sim", "rk",
    ]
    assert df.count() == 15  # 3 queries x k=5
