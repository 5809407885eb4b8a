"""SQ8 scalar-quantized search (sq8_search) — recall floor and code
properties the value oracle can't express. The cross-engine value gate
lives in tests/test_oracle.py::test_oracle_match[ann_sq8_search]."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_database_app_spark.operators import search as S
from vector_database_app_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_sq8_recall_floor_vs_brute_force(spark):
    emb = load_table(spark, SF, "embeddings")
    qs = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_embedding"),
    )
    got: dict[int, set[int]] = {}
    for r in S.sq8_search(emb, qs, k=5, shortlist=50).collect():  # ≤100 rows
        got.setdefault(r.query_id, set()).add(r.vec_id)
    num = den = 0
    for r in S.knn_batch(emb, qs, k=5).collect():  # ≤100 rows
        den += 1
        num += r.vec_id in got.get(r.query_id, set())
    recall = num / den
    # measured 1.00 at both fixture scales (int8 on 64-dim preserves
    # ordering easily through a 50-deep shortlist); pin a margin
    assert recall >= 0.90, f"SQ8 recall collapsed: {recall:.2f}"


def test_sq8_codes_bounded_and_integer_dot_exact(spark):
    from vector_database_app_spark.functions.vector import (
        int8_quantize,
        int8_scale,
    )

    emb = load_table(spark, SF, "embeddings").limit(50)
    codes = emb.select(
        int8_quantize("embedding", int8_scale("embedding")).alias("c")
    )
    mx = codes.select(
        F.array_max(F.transform(F.col("c"), F.abs)).alias("m")
    ).agg(F.max("m").alias("m")).collect()[0]["m"]  # 1-row agg: bounded
    assert mx <= 127
