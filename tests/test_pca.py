"""search.pca_train / pca_project_expr: the REAL MLlib PCA model —
fitted-axis invariants (orthonormality, ordered explained variance),
expression-vs-numpy projection parity, and the artifact-backed registry
query's schema/lifecycle."""

from __future__ import annotations

import numpy as np
import pytest

from vector_database_app_spark.operators.search import (
    pca_project_expr,
    pca_train,
)
from vector_database_app_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def fitted(spark):
    emb = load_table(spark, SF, "embeddings")
    comps, ev = pca_train(emb, k=4)
    return emb, comps, ev


def test_components_are_orthonormal(fitted):
    _, comps, _ = fitted
    C = np.array(comps)
    assert C.shape[0] == 4
    assert np.allclose(C @ C.T, np.eye(4), atol=1e-8)


def test_explained_variance_ordered_and_valid(fitted):
    _, _, ev = fitted
    assert len(ev) == 4
    assert all(0.0 < v <= 1.0 for v in ev)
    assert all(ev[i] >= ev[i + 1] for i in range(len(ev) - 1))
    assert sum(ev) <= 1.0 + 1e-9


def test_projection_expression_matches_numpy(fitted):
    """The zip_with/aggregate column expression must compute the same
    dot products as numpy on the same fitted axes."""
    emb, comps, _ = fitted
    from pyspark.sql import functions as F

    sample = emb.orderBy("vec_id").limit(20)
    got = sample.select(
        "vec_id",
        *[
            pca_project_expr("embedding", c).alias(f"p{j}")
            for j, c in enumerate(comps)
        ],
    ).collect()
    raw = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in sample.select("vec_id", "embedding").collect()
    }
    C = np.array(comps)
    for r in got:
        want = C @ raw[r.vec_id]
        have = np.array([r.p0, r.p1, r.p2, r.p3])
        assert np.allclose(have, want, atol=1e-9), r.vec_id


def test_projection_variance_concentrates_in_leading_axes(fitted):
    """Per-axis variance of the projected corpus must be non-increasing
    — the property dimensionality reduction exists for."""
    emb, comps, _ = fitted
    rows = emb.select("embedding").collect()
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    P = X @ np.array(comps).T
    var = P.var(axis=0)
    assert all(var[i] >= var[i + 1] - 1e-12 for i in range(len(var) - 1))


def test_registry_query_schema_and_artifact_reuse(spark):
    from vector_database_app_spark.registry import QUERIES

    df = QUERIES["embed_pca"](spark, SF)
    assert df.columns == [
        "vec_id", "p0", "p1", "p2", "p3",
        "var0", "var1", "var2", "var3",
    ]
    n = df.count()
    assert n == load_table(spark, SF, "embeddings").count()
    # second construction: artifact memo — zero Spark jobs
    before = spark.sparkContext._jsc.sc().dagScheduler().numTotalJobs()
    QUERIES["embed_pca"](spark, SF)
    after = spark.sparkContext._jsc.sc().dagScheduler().numTotalJobs()
    assert after == before
