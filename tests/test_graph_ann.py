"""Graph-based ANN (nsw_build / nsw_search) — recall floor, degree
bounds, and determinism. The value-level cross-engine gate lives in
tests/test_oracle.py::test_oracle_match[ann_graph_search_pinned]; here
we pin the properties a value oracle cannot express: how CLOSE the
approximate result is to brute force, and that the graph the search
walks is the bounded one the 100 TB story depends on.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_database_app_spark.operators import search as S
from vector_database_app_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"

# the shipped q_ann_graph_search_pinned configuration
CFG = dict(n_bits=6, degree=16, bridge=8)
SEARCH = dict(k=5, n_bits=6, entry=16, beam=32, hops=2)


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF, "embeddings")


@pytest.fixture(scope="module")
def edges(spark, emb):
    e = S.nsw_build(emb, **CFG).persist()
    yield e
    e.unpersist()


def test_recall_floor_vs_brute_force(spark, emb, edges):
    # 20 queries (100 query-neighbor pairs) for a stable recall
    # reading — the registry query's 3 are too granular to pin
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_embedding"),
    )
    approx = S.nsw_search(emb, edges, queries, **SEARCH)
    got: dict[int, set[int]] = {}
    for r in approx.collect():  # ≤ 20·k rows: bounded
        got.setdefault(r.query_id, set()).add(r.vec_id)
    brute = S.knn_batch(emb, queries, k=5)
    recall_num = recall_den = 0
    for r in brute.collect():  # ≤ 20·k rows: bounded
        recall_den += 1
        if r.vec_id in got.get(r.query_id, set()):
            recall_num += 1
    recall = recall_num / recall_den
    # shipped config swept 0.87 on the 3 registry queries at both
    # fixture scales and 0.80 on this 20-query panel; pin a margin
    # below so a legitimate tiebreak change can't flake the suite
    assert recall >= 0.70, f"graph-ANN recall collapsed: {recall:.2f}"


def test_out_degree_bounded(edges):
    # union(distinct) of degree-16 within-bucket + bridge-8 ring edges
    cap = CFG["degree"] + CFG["bridge"]
    worst = (
        edges.groupBy("src")
        .agg(F.count(F.lit(1)).alias("deg"))
        .agg(F.max("deg").alias("m"))
        .collect()[0]["m"]  # 1-row aggregate: bounded
    )
    assert worst <= cap, f"out-degree {worst} exceeds {cap}"


def test_no_self_loops(edges):
    assert edges.filter(F.col("src") == F.col("dst")).count() == 0


def test_build_is_deterministic(spark, emb, edges):
    again = S.nsw_build(emb, **CFG)
    assert edges.exceptAll(again).count() == 0
    assert again.exceptAll(edges).count() == 0
