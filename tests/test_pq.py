"""Product quantization (operators/pq.py): determinism, compressed-domain
ADC quality, and the recall-restoring exact re-rank."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_database_app_spark.operators import pq, search
from vector_database_app_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"
M, KCODES, DIM = 8, 16, 64


@pytest.fixture(scope="module")
def emb(spark):
    # teardown unpersist: see tests/test_binary_quant.py — a leaked
    # persist of this scan hijacks later tests' parquet plans via
    # canonicalized-plan cache matching.
    df = load_table(spark, SF, "embeddings").persist()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def codebooks(spark, emb):
    df = pq.pq_train(emb, m=M, k=KCODES, iters=2, dim=DIM).persist()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def codes(spark, emb, codebooks):
    df = pq.pq_encode(emb, codebooks, dim=DIM).persist()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def queries(emb):
    return emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_embedding"),
    )


def test_codebook_shape_and_determinism(emb, codebooks):
    rows = codebooks.collect()
    assert len(rows) == M * KCODES
    assert {(r.subspace, r.code) for r in rows} == {
        (s, j) for s in range(M) for j in range(KCODES)
    }
    assert all(len(r.centroid) == DIM // M for r in rows)
    again = pq.pq_train(emb, m=M, k=KCODES, iters=2, dim=DIM).collect()
    assert sorted(map(str, rows)) == sorted(map(str, again))


def test_encode_emits_m_codes_in_range(codes):
    rows = codes.collect()
    assert len(rows) == 500
    assert all(len(r.codes) == M for r in rows)
    assert all(0 <= c < KCODES for r in rows for c in r.codes)


def test_encode_is_deterministic_and_lazy_shape(emb, codebooks, codes):
    again = {r.vec_id: r.codes for r in pq.pq_encode(emb, codebooks, dim=DIM).collect()}
    assert {r.vec_id: r.codes for r in codes.collect()} == again
    # shuffle-free projection: no Exchange in the encode plan
    plan = pq.pq_encode(emb, codebooks, dim=DIM)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def _recall(got_df, truth: set, id_cols=("query_id", "vec_id")) -> float:
    got = {(r[0], r[1]) for r in got_df.select(*id_cols).collect()}
    return len(got & truth) / len(truth)


def test_adc_beats_chance_and_rerank_restores_recall(emb, codebooks, codes, queries):
    """Compressed-domain ADC alone is a lossy ranking (32 bits/vector);
    the exact re-rank over the ADC shortlist recovers near-exact top-k —
    the PQ system claim, measured against brute force."""
    K = 10
    truth = {
        (r.query_id, r.vec_id)
        for r in search.knn_batch(emb, queries, k=K)
        .select("query_id", "vec_id")
        .collect()
    }
    adc_only = pq.pq_search(codes, codebooks, queries, k=K, m=M, dim=DIM)
    r_adc = _recall(adc_only, truth)

    refined = pq.pq_search(
        codes, codebooks, queries, k=K, m=M, dim=DIM,
        shortlist=100, refine_with=emb,
    )
    r_ref = _recall(refined, truth)
    assert r_adc > 0.3  # far above chance (10/500 = 0.02)
    assert r_ref >= r_adc
    assert r_ref >= 0.9  # shortlist of 100/500 + exact re-rank ≈ exact

    # contract columns
    assert refined.columns == ["query_id", "vec_id", "sim", "adc_score", "rk"]
    per_q = refined.groupBy("query_id").count().collect()
    assert all(r["count"] == K for r in per_q)


def test_adc_score_tracks_true_dot(emb, codebooks, codes, queries):
    """ADC approximates the true dot product: mean absolute error over
    query×corpus pairs is well below the score's dynamic range (unit
    vectors → dots in [-1, 1])."""
    adc = pq.pq_search(codes, codebooks, queries, k=500, m=M, dim=DIM)
    exact = search.knn_batch(emb, queries, k=500).select(
        "query_id", "vec_id", "sim"
    )
    joined = adc.join(exact, ["query_id", "vec_id"]).select(
        F.abs(F.col("adc_score") - F.col("sim")).alias("err")
    )
    mae = joined.agg(F.avg("err")).first()[0]
    assert mae < 0.15


def test_ivfpq_with_cover_all_shortlist_equals_ivf_exact(spark, sf_dir):
    """IVF-PQ's only recall losses are (a) unprobed cells and (b) ADC
    shortlist truncation. With the shortlist covering every probed
    candidate, (b) vanishes — the composite must return EXACTLY the
    oracle-checked ann_ivf_search answer (same cells, same exact cosine
    re-rank, same tie-breaks)."""
    from vector_database_app_spark.registry import QUERIES, _ivf_centroids
    from vector_database_app_spark.operators import pq as PQ, search
    from vector_database_app_spark.sources.catalog import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    centroids = _ivf_centroids(emb)
    codebooks = PQ.pq_train(emb, m=8, k=16, iters=1)
    assigned = search.ivf_assign(emb, centroids)
    assigned_codes = assigned.select("vec_id", "centroid_id").join(
        PQ.pq_encode(emb, codebooks), "vec_id"
    )
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_embedding"),
    )
    got = {
        (r.query_id, r.vec_id, r.sim, r.rk)
        for r in PQ.ivfpq_search(
            assigned_codes, centroids, codebooks, queries,
            k=5, n_probe=2, m=8, shortlist=10_000_000, refine_with=emb,
        ).collect()
    }
    want = {
        (r.query_id, r.vec_id, r.sim, r.rk)
        for r in search.ivf_search(
            assigned, centroids, queries, k=5, n_probe=2
        ).collect()
    }
    assert got == want
    assert len(got) == 15


def test_residual_encode_zero_residual_scores_like_origin(spark, codebooks):
    """A vector that IS its cell centroid has residual 0 — its codes
    must equal the codes of the all-zero vector under the same
    codebooks (the residual-identity sanity of IVFADC encode)."""
    cents = load_table(spark, SF, "embeddings").filter(
        F.col("vec_id") < 4
    ).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("centroid"),
    ).persist()
    corpus = cents.select(
        F.col("centroid_id").alias("vec_id"),
        F.col("centroid").alias("embedding"),
    )
    got = {
        r.vec_id: r.codes
        for r in pq.pq_encode_residual(
            corpus, cents, codebooks, dim=DIM
        ).collect()
    }
    zero = spark.createDataFrame(
        [(0, [0.0] * DIM)], "vec_id long, embedding array<double>"
    )
    zero_codes = pq.pq_encode(zero, codebooks, dim=DIM).collect()[0].codes
    # every corpus vector assigns to itself (cosine 1.0 beats any other
    # cell; ties broken by centroid_id can only pick an identical twin,
    # whose residual is also 0) -> all codes equal the zero-vector codes
    assert all(codes == zero_codes for codes in got.values())
    cents.unpersist()


def test_ivfpq_residual_rerank_recall(emb, codebooks, queries):
    """Residual IVFADC with a generous shortlist + exact re-rank tracks
    brute force within the probe budget's ceiling — and the ADC stage
    (q·c + residual lookups) must beat chance on its own."""
    from vector_database_app_spark.registry import _ivf_centroids

    K = 10
    centroids = _ivf_centroids(emb)
    assigned = pq.pq_encode_residual(emb, centroids, codebooks, dim=DIM)
    truth = {
        (r.query_id, r.vec_id)
        for r in search.knn_batch(emb, queries, k=K)
        .select("query_id", "vec_id")
        .collect()
    }
    adc_only = pq.ivfpq_residual_search(
        assigned, centroids, codebooks, queries,
        k=K, n_probe=4, m=M, dim=DIM,
    )
    refined = pq.ivfpq_residual_search(
        assigned, centroids, codebooks, queries,
        k=K, n_probe=4, m=M, dim=DIM, shortlist=100, refine_with=emb,
    )
    r_adc = _recall(adc_only, truth)
    r_ref = _recall(refined, truth)
    assert r_adc > 0.3
    assert r_ref >= r_adc
    assert r_ref >= 0.7  # 4/8-ish probed cells bound recall, not ADC
    assert refined.columns == ["query_id", "vec_id", "sim", "adc_score", "rk"]
