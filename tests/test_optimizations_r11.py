"""Focused equivalence tests for the round-11 optimization rewrites.

Each optimization changed an operator's internals while claiming
value-identity; the oracle suite verifies that against DuckDB at two
SFs, and these tests additionally pin the EQUIVALENCE ARGUMENT itself
on adversarial micro-cases (ties, fallbacks, encode/decode edges) so a
future refactor cannot silently weaken it.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_database_app_spark import caching
from vector_database_app_spark.operators import graph as G
from vector_database_app_spark.operators import textops


@pytest.fixture(scope="module")
def spark():
    from vector_database_app_spark.session import get_spark

    return get_spark("test_optimizations_r11", cpus=4)


def test_lpa_agg_pick_matches_window_tiebreak(spark):
    """label_propagation's min-of-struct((-c, label)) pick must equal the
    old row_number pick under (count DESC, label ASC) — exercised on a
    graph engineered so node X's neighbor labels TIE on count and the
    smallest label must win."""
    # Round 1: every node still carries its OWN label, so x's four
    # in-neighbors a1, a2, b1, b2 each contribute their own label once
    # — a 4-way count tie (1,1,1,1) that the (count DESC, label ASC)
    # order must break to the smallest label, a1.
    edges = spark.createDataFrame(
        [
            ("a1", "x"),
            ("a2", "x"),
            ("b1", "x"),
            ("b2", "x"),
            # give the label sources self-stabilizing back-edges so their
            # own labels survive round 1 deterministically
            ("a1", "a2"),
            ("a2", "a1"),
            ("b1", "b2"),
            ("b2", "b1"),
        ],
        "src string, dst string",
    )
    out = G.label_propagation(edges, rounds=1)
    got = {r["node"]: r["label"] for r in out.collect()}
    caching.release(out)
    assert got["x"] == "a1"  # 4-way count tie → smallest label wins


def test_pagerank_int_bijection_equals_string_form(spark):
    """The s→2s / c→2c+1 BIGINT encoding must give bit-identical ranks
    to the string-keyed form after decode (the q_graph_pagerank
    restructure) — including a dangling-free symmetrized graph with a
    hub, where flooring by differing outdegs exercises the integer
    arithmetic."""
    pairs = [(1, 10), (1, 20), (2, 10), (3, 10), (3, 30), (4, 40)]
    fwd_s = spark.createDataFrame(
        [(f"s{s}", f"c{c}") for s, c in pairs], "src string, dst string"
    )
    edges_s = fwd_s.unionByName(
        fwd_s.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    out_s = G.pagerank(edges_s, iters=3, damping_pct=85)
    rows_s = {r["node"]: r["rank_scaled"] for r in out_s.collect()}
    caching.release(out_s)

    fwd_i = spark.createDataFrame(
        [(2 * s, 2 * c + 1) for s, c in pairs], "src long, dst long"
    )
    edges_i = fwd_i.unionByName(
        fwd_i.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    out_i = G.pagerank(edges_i, iters=3, damping_pct=85)
    decoded = out_i.select(
        F.when(
            F.col("node") % 2 == 0, F.concat(F.lit("s"), F.shiftright("node", 1))
        )
        .otherwise(F.concat(F.lit("c"), F.shiftright("node", 1)))
        .alias("node"),
        "rank_scaled",
    )
    rows_i = {r["node"]: r["rank_scaled"] for r in decoded.collect()}
    caching.release(out_i)
    assert rows_s == rows_i


def test_pagerank_pins_released_by_caller(spark):
    """pagerank/PPR persist their round-invariant edge frame lazily and
    pin it for the caller: construction marks it (zero jobs — the
    registry laziness gate covers that), and caching.release drops it."""
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a")], "src string, dst string"
    )
    out = G.pagerank(edges, iters=1)
    deps = caching.deps(out)
    assert deps, "pagerank must pin its persisted edge frame"
    out.collect()
    assert any(d.storageLevel.useMemory for d in deps)
    caching.release(out)
    assert all(not d.storageLevel.useMemory for d in deps)


def test_caching_deps_carries_through_wrappers(spark):
    """caching.deps lets a wrapper (orderBy/limit returns a NEW frame)
    carry release handles forward — the q_graph_ppr pattern."""
    base = spark.range(10).persist()
    inner = caching.pin(base.select("id"), base)
    wrapped = caching.pin(
        inner.orderBy("id").limit(3), *caching.deps(inner)
    )
    assert caching.deps(wrapped) == (base,)
    wrapped.collect()
    caching.release(wrapped)
    assert not base.storageLevel.useMemory


def test_duplicate_spans_window_min_ownership_tie(spark):
    """duplicate_spans' min-over-window owner must mark EXACTLY the
    occurrences whose passage appears in a lower-id doc — including a
    doc that shares a passage with itself only (repeated phrase inside
    one doc must NOT be a duplicated span: owner == doc)."""
    docs = spark.createDataFrame(
        [
            (1, "w1 w2 w3 w4 w5 w6 w7 w8 tail"),
            # doc 2 contains doc 1's full 8-window at position 1
            (2, "x0 w1 w2 w3 w4 w5 w6 w7 w8"),
            # doc 3 repeats ITS OWN 8-window twice; no earlier doc has it
            (3, "a b c d e f g h a b c d e f g h"),
        ],
        "doc_id long, text string",
    )
    out = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in textops.duplicate_spans(docs, n=8).collect()
    }
    assert (2, 1, 8) in out  # the stolen window, exact offsets
    assert all(d != 3 for d, _, _ in out)  # self-repeat is not a dup
    assert all(d != 1 for d, _, _ in out)  # owner passes through


def test_remove_duplicate_spans_single_kept_projection(spark):
    """The staged `kept` projection must survive optimization as a
    SEPARATE projection (CollapseProject would re-duplicate the
    interpreted HOF filter three times): the optimized plan evaluates
    the ArrayFilter expression exactly once."""
    docs = spark.createDataFrame(
        [
            (1, "w1 w2 w3 w4 w5 w6 w7 w8"),
            (2, "pre w1 w2 w3 w4 w5 w6 w7 w8 post"),
        ],
        "doc_id long, text string",
    )
    cleaned = textops.remove_duplicate_spans(docs, n=8)
    plan = cleaned._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("filter(_ws") == 1, plan
    rows = {r["doc_id"]: r["cleaned"] for r in cleaned.collect()}
    assert rows[1] == "w1 w2 w3 w4 w5 w6 w7 w8"
    assert rows[2] == "pre post"
