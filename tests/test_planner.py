"""ANN strategy rule (plans.ann_planner): branch selection on the plan-size
statistic, and result parity between rule output and the direct operators."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from vector_database_app_spark.operators import search
from vector_database_app_spark.plans import ann_planner as AP
from vector_database_app_spark.sources.catalog import load_table

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_SMOKE, "embeddings")


@pytest.fixture(scope="module")
def queries(emb):
    return emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_embedding"),
    )


def _ivf_index(emb):
    w = Window.partitionBy("label").orderBy("vec_id")
    cents = (
        emb.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select(
            F.col("label").alias("centroid_id"),
            F.col("embedding").alias("centroid"),
        )
    )
    return AP.IvfIndex(centroids=cents, n_probe=2)


def test_plan_size_bytes_positive(emb):
    size = AP.plan_size_bytes(emb)
    assert size is not None and size > 0


def test_small_corpus_chooses_brute_even_with_index(emb, queries):
    planned = AP.plan_topk_similarity(
        emb, queries, k=5, index=_ivf_index(emb)
    )  # sf0.001 is far below the default 256 MiB threshold
    assert planned.strategy == "brute_force"
    assert "index skipped" in planned.reason


def test_zero_threshold_chooses_registered_ivf(emb, queries):
    planned = AP.plan_topk_similarity(
        emb, queries, k=5, index=_ivf_index(emb), brute_force_max_bytes=0
    )
    assert planned.strategy == "ivf"


def test_zero_threshold_chooses_registered_srp(emb, queries):
    planned = AP.plan_topk_similarity(
        emb, queries, k=5, index=AP.SrpIndex(), brute_force_max_bytes=0
    )
    assert planned.strategy == "srp"


def test_no_index_above_threshold_falls_back_with_warning(emb, queries):
    planned = AP.plan_topk_similarity(
        emb, queries, k=5, index=None, brute_force_max_bytes=0
    )
    assert planned.strategy == "brute_force"
    assert "no index registered" in planned.reason


def _rows(df, cols=("query_id", "vec_id", "sim", "rk")):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_brute_branch_matches_knn_batch(emb, queries):
    planned = AP.plan_topk_similarity(emb, queries, k=5)
    direct = search.knn_batch(emb, queries, k=5)
    assert _rows(planned.df) == _rows(direct)


def test_ivf_branch_matches_ivf_search(emb, queries):
    idx = _ivf_index(emb)
    planned = AP.plan_topk_similarity(
        emb, queries, k=5, index=idx, brute_force_max_bytes=0
    )
    assigned = search.ivf_assign(emb, idx.centroids)
    direct = search.ivf_search(assigned, idx.centroids, queries, k=5, n_probe=2)
    assert _rows(planned.df) == _rows(direct)


def test_ivf_probe_recall_vs_exact(emb, queries):
    """The probe path is approximate by contract; at n_probe=2 over these
    centroids it should still recover most exact neighbors."""
    exact = set(_rows(search.knn_batch(emb, queries, k=5), ("query_id", "vec_id")))
    planned = AP.plan_topk_similarity(
        emb, queries, k=5, index=_ivf_index(emb), brute_force_max_bytes=0
    )
    got = set(_rows(planned.df, ("query_id", "vec_id")))
    assert len(got & exact) / len(exact) >= 0.6


def test_explain_carries_rule_decision_and_plan(emb, queries):
    planned = AP.plan_topk_similarity(emb, queries, k=5)
    text = planned.explain()
    assert "ANNStrategyRule" in text
    assert "brute_force" in text
    assert "== Physical Plan ==" in text


def test_matryoshka_fallback_branch(spark):
    """Above-threshold + no index + explicit opt-in -> the index-free
    coarse-to-fine path; without the opt-in the planner stays exact."""
    from vector_database_app_spark.plans import ann_planner as AP
    from vector_database_app_spark.registry import QUERIES

    df = QUERIES["ann_planner_fallback"](spark, "/root/testdata/sf0.001")
    direct = QUERIES["ann_matryoshka"](spark, "/root/testdata/sf0.001")
    got = sorted(map(tuple, df.collect()))
    want = sorted(map(tuple, direct.collect()))
    assert got == want


def test_choose_n_probe_from_measured_sweep(spark):
    """The planner picks the cheapest measured operating point that meets
    the recall target, falls back to the widest probe when nothing does,
    and to the default on an empty sweep."""
    from vector_database_app_spark.plans.ann_planner import choose_n_probe
    from vector_database_app_spark.registry import QUERIES

    sweep = QUERIES["ann_probe_sweep"](spark, "/root/testdata/sf0.001")
    n, r = choose_n_probe(sweep, target_recall=0.5)
    rows = {int(x["n_probe"]): float(x["recall"]) for x in sweep.collect()}
    assert r == rows[n] and r >= 0.5
    assert all(rows[m] < 0.5 for m in rows if m < n), "not the cheapest"
    # unreachable target -> widest probe, achieved recall reported
    n_hi, r_hi = choose_n_probe(sweep, target_recall=1.1)
    assert n_hi == max(rows) and r_hi == rows[n_hi]
    # empty sweep -> default
    empty = spark.createDataFrame([], "n_probe int, recall double")
    assert choose_n_probe(empty, target_recall=0.9) == (2, 0.0)
