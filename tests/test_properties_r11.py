"""Algebraic properties of the round-11 primitives — the invariants the
value oracles can't express: greedy k-center's monotone radius
certificate, PPR's mass conservation under integer fixed-point, and
the ranking-metric bounds."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_database_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_kcenter_radius_monotone_nonincreasing(spark):
    # Gonzalez greedy: each round picks the farthest remaining point,
    # so the selection-time max-min distance can never increase
    rows = sorted(
        (r.sel_ix, r.radius)
        for r in QUERIES["coreset_kcenter"](spark, SF).collect()  # k rows
    )
    radii = [rad for ix, rad in rows if ix >= 2]  # seed radius is 0.0
    assert all(a >= b for a, b in zip(radii, radii[1:])), radii


def test_kcenter_assignment_partitions_corpus(spark):
    from vector_database_app_spark.sources.catalog import load_table

    out = QUERIES["coreset_kcenter"](spark, SF).collect()
    n = load_table(spark, SF, "embeddings").count()
    assert sum(r.n_assigned for r in out) == n


def test_ppr_mass_conserved_and_concentrated(spark):
    from vector_database_app_spark.operators.graph import SCALE

    rows = QUERIES["graph_ppr"](spark, SF).collect()  # top-100: bounded
    total = sum(r.rank_scaled for r in rows)
    # integer floor division only LOSES mass; top-100 holds most of it
    assert total <= SCALE
    assert total >= SCALE // 2, total
    # restart mass lands on seeds every round, so each seed outranks
    # the global uniform share
    seed_ranks = [r.rank_scaled for r in rows if r.is_seed == 1]
    assert len(seed_ranks) == 3
    assert min(seed_ranks) > SCALE // 1000


def test_retrieval_metric_bounds(spark):
    for r in QUERIES["retrieval_metrics"](spark, SF).collect():  # 3 rows
        assert 0.0 <= r.recall_at_k <= 1.0
        assert r.mrr_at_k == 0.0 or (1.0 / 10 - 1e-9) <= r.mrr_at_k <= 1.0
        assert 0.0 <= r.ndcg_at_k <= 1.0 + 1e-9
        assert 0 <= r.n_hits <= 10


def test_stream_scd_state_is_run_compressed(spark, tmp_path):
    # the SCD twin's state never exceeds one row per history version
    from vector_database_app_spark.sources.catalog import load_table
    from vector_database_app_spark.streaming import windows as SW

    orders = load_table(spark, SF, "orders").select(
        "o_custkey", "o_orderpriority", "o_orderdate", "o_orderkey"
    )
    arrivals = tmp_path / "arrivals"
    arrivals.mkdir()
    orders.coalesce(1).write.parquet(str(arrivals / "w0"))
    stream = (
        spark.readStream.schema(orders.schema)
        .option("recursiveFileLookup", "true")
        .parquet(str(arrivals))
    )
    SW.run_stream_scd_merge(
        stream,
        str(tmp_path / "store"),
        str(tmp_path / "hist"),
        str(tmp_path / "ckpt"),
    )
    hist = spark.read.parquet(str(tmp_path / "hist"))
    n_versions = hist.count()
    n_rows = orders.count()
    assert n_versions <= n_rows
    # every (custkey, version) unique and versions start at 1
    assert (
        hist.groupBy("o_custkey", "version").count().filter("count > 1").count()
        == 0
    )
    assert hist.filter("version = 1").count() == hist.select(
        "o_custkey"
    ).distinct().count()
