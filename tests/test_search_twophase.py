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


def test_knn_null_vectors_agree_across_forms(spark):
    """Null-vector rows must not make the two forms diverge (r6 advice:
    struct array_sort is nulls-FIRST vs the window's sim DESC
    nulls-LAST). Today `cosine` maps a null/zero vector to sim 0.0 (the
    documented zero-safe convention), so NULL sims cannot arise — the
    isNotNull filters in all three knn forms pin the agreement should a
    sim expression ever produce NULLs. k exceeds the non-null corpus so
    any divergence (or any NULL sim leaking) would show."""
    corpus, queries = _frames(spark)
    small = corpus.filter(F.col("vec_id") < 9)  # 6 non-null rows
    nulled = small.unionByName(
        small.limit(2).withColumn(
            "embedding", F.lit(None).cast("array<double>")
        ).withColumn("vec_id", F.col("vec_id") + 1000)
    )
    a = search.knn_batch(nulled, queries, k=20)
    b = search.knn_batch_twophase(nulled, queries, k=20)
    rows_a = _key_rows(a)
    assert rows_a == _key_rows(b)
    assert len(rows_a) > 0
    # null vectors score exactly 0.0 — never NULL, never top-ranked
    # above a positive-sim row
    null_rows = [r for r in rows_a if r[2] >= 1000]
    assert null_rows and all(r[4] == 0.0 for r in null_rows)


def test_knn_twophase_persist_corpus_equals(spark):
    """persist_corpus=True pins one corpus materialization for the
    score and re-attach sides; rows are identical to the default."""
    corpus, queries = _frames(spark)
    base = _key_rows(search.knn_batch_twophase(corpus, queries, k=5))
    got = _key_rows(
        search.knn_batch_twophase(corpus, queries, k=5, persist_corpus=True)
    )
    assert got == base
