"""Layout strategy tests: bucketed co-located joins plan with no shuffle;
partitioned writes prune directories."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from vector_database_app_spark.plans.explain import explain_str
from vector_database_app_spark.sources import layout
from vector_database_app_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange(spark, tmp_path, no_broadcast):
    orders = load_table(spark, SF, "orders").select("o_orderkey", "o_totalprice")
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    bo = layout.write_bucketed(
        orders, "t_orders_b", str(tmp_path / "ob"),
        bucket_cols=["o_orderkey"], n_buckets=4, sort_cols=["o_orderkey"],
    )
    bl = layout.write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        "t_lineitem_b", str(tmp_path / "lb"),
        bucket_cols=["o_orderkey"], n_buckets=4, sort_cols=["o_orderkey"],
    )
    try:
        joined = bo.join(bl, "o_orderkey")
        plan = explain_str(joined)
        assert "Exchange" not in plan, plan       # co-located: no shuffle
        assert "SortMergeJoin" in plan, plan
        # and the result is the plain join's result
        plain = orders.join(
            li.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"
        )
        assert joined.count() == plain.count()
    finally:
        layout.drop_table(spark, "t_orders_b")
        layout.drop_table(spark, "t_lineitem_b")


def test_partitioned_write_prunes(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    pdf = layout.write_partitioned(
        docs, str(tmp_path / "docs_p"), partition_cols=["lang"]
    )
    pruned = pdf.filter(F.col("lang") == "en")
    plan = explain_str(pruned)
    # partition filter shows up as PartitionFilters on the scan, and the
    # row counts match the unpartitioned filter
    assert "PartitionFilters" in plan and "lang" in plan, plan
    assert pruned.count() == docs.filter(F.col("lang") == "en").count()


def test_ivf_probe_over_partitioned_store_is_dpp_pruned(spark, tmp_path):
    """The 100 TB ANN read path: cell-assigned corpus stored partitioned by
    centroid_id, probe list broadcast — Spark turns the probe equi-join into
    dynamic partition pruning, so the scan reads n_probe cells, not the
    corpus."""
    from pyspark.sql import Window

    from vector_database_app_spark.operators import search

    emb = load_table(spark, SF, "embeddings")
    w = Window.partitionBy("label").orderBy("vec_id")
    cents = (
        emb.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select(
            F.col("label").alias("centroid_id"),
            F.col("embedding").alias("centroid"),
        )
    )
    assigned = search.ivf_assign(emb, cents)
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_embedding"),
    )
    stored = layout.write_partitioned(
        assigned, str(tmp_path / "ivf_store"), partition_cols=["centroid_id"]
    )
    res = search.ivf_search(stored, cents, queries, k=5, n_probe=2)
    plan = explain_str(res)
    assert "dynamicpruningexpression" in plan, plan
    # pruning must not change results: same rows as the in-memory path
    direct = search.ivf_search(assigned, cents, queries, k=5, n_probe=2)
    key = lambda df: sorted(  # noqa: E731
        (r.query_id, r.vec_id, r.rk) for r in df.collect()
    )
    assert key(res) == key(direct)
