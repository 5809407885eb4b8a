"""knn_batch_twophase == knn_batch: same rows, sims, and ranks — the
two-phase distributed top-k (per-partition local top-k, candidate-only
shuffle, final merge) is a physical-strategy change only."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_database_app_spark.operators import search
from vector_database_app_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def _frames(spark):
    emb = load_table(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_embedding"),
    )
    corpus = emb.filter(F.col("vec_id") >= 3)
    return corpus, queries


def _key_rows(df):
    return sorted(
        (r["query_id"], r["rk"], r["vec_id"], r["label"], r["sim"])
        for r in df.select("query_id", "rk", "vec_id", "label", "sim").collect()
    )


def test_knn_twophase_equals_window(spark):
    corpus, queries = _frames(spark)
    a = search.knn_batch(corpus, queries, k=7)
    b = search.knn_batch_twophase(corpus, queries, k=7)
    assert _key_rows(a) == _key_rows(b)


def test_knn_twophase_partitioning_invariance(spark):
    """The result must not depend on the input partitioning (local
    top-k per partition is an implementation detail)."""
    corpus, queries = _frames(spark)
    base = _key_rows(search.knn_batch_twophase(corpus, queries, k=5))
    for parts in (1, 7):
        got = _key_rows(
            search.knn_batch_twophase(
                corpus.repartition(parts), queries, k=5
            )
        )
        assert got == base


def test_knn_twophase_no_window_exchange(spark):
    """Plan property: no row_number window anywhere; the only shuffles
    are the two hash aggregations and the final id join."""
    corpus, queries = _frames(spark)
    plan = (
        search.knn_batch_twophase(corpus, queries, k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan
