"""Driver-harness compatibility gate.

The driver's correctness sweep canonicalizes every query result with a
pandas ``sort_values`` over all columns, which raises ``TypeError:
unhashable type: 'list'`` on any Array/Map/Struct column — and one such
crash aborts the whole sweep (round-1 lesson: ``ingest_chunks`` took ~34
downstream queries' driver rows with it).

This test builds EVERY registry query at sf0.001 and asserts its output
schema is scalar-only, so no future query can re-introduce the abort.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from vector_database_app_spark.registry import QUERIES

_COMPLEX = (T.ArrayType, T.MapType, T.StructType)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_output_schema_is_scalar_only(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    bad = [f.name for f in df.schema.fields if isinstance(f.dataType, _COMPLEX)]
    assert not bad, (
        f"{name} exposes non-scalar columns {bad}; the driver's pandas "
        "canonicalizer cannot hash lists/dicts — project to scalars "
        "(sha2(to_json(col)), size(col), ...) in the registry form"
    )


#: Queries whose CONSTRUCTION legitimately runs Spark jobs. EMPTY since
#: round 3: the iterative trainers (k-means centroids, PQ codebooks,
#: Word2Vec vectors, connected-components labels) load-or-train through
#: plans/artifacts.py — the one-time training happens on FIRST build
#: (covered by the warm_registry fixture below), and every later build is
#: a lazy schema'd read / in-process memo, so the zero-jobs invariant now
#: holds for every registry query with no exceptions.
_EAGER_BY_DESIGN: set = set()


def _total_jobs(spark) -> int:
    return spark.sparkContext._jsc.sc().dagScheduler().numTotalJobs()


@pytest.fixture(scope="module")
def warm_registry(spark, sf_dir):
    """First-touch warm-up: building a query the first time may fire
    one-off jobs outside its control (parquet footer schema inference,
    Python data-source registration) — those are per-table, memoized by
    sources.catalog. The laziness gate measures the SECOND build."""
    for name, fn in QUERIES.items():
        if name not in _EAGER_BY_DESIGN:
            fn(spark, sf_dir)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_construction_is_lazy(spark, sf_dir, warm_registry, name):
    """Re-building a registry query must fire ZERO Spark jobs — an eager
    count()/collect() inside a query constructor is a serial driver-side
    scan that re-runs on every re-plan (round-1 finding: ngram_jaccard and
    dedup_edit_distance each ran a full docs.count() at build time)."""
    if name in _EAGER_BY_DESIGN:
        pytest.skip("iterative algorithm collects centroids by design")
    before = _total_jobs(spark)
    QUERIES[name](spark, sf_dir)
    after = _total_jobs(spark)
    assert after == before, f"{name} fired {after - before} job(s) at build time"


def test_every_oracle_has_a_query():
    """An ORACLE entry whose QUERIES key was renamed/removed would vanish
    silently from the sweep (the driver iterates queries()); make the
    orphan loud instead."""
    from vector_database_app_spark.registry import ORACLE, QUERIES

    orphans = sorted(set(ORACLE) - set(QUERIES))
    assert not orphans, f"ORACLE entries without a QUERIES entry: {orphans}"


def test_twins_map_covers_every_rows_only_query():
    """The rows-only → value-oracled-twin map (registry.TWINS, exported
    as __spark_entry__.twins()) must be mechanically in sync: one entry
    per rows-only query (QUERIES key with no ORACLE SQL), every named
    twin live in QUERIES AND value-oracled in ORACLE, and no twin
    rows-only itself (a rows-only 'twin' would cover nothing)."""
    from vector_database_app_spark.registry import ORACLE, QUERIES, TWINS

    rows_only = set(QUERIES) - set(ORACLE)
    assert set(TWINS) == rows_only, (
        sorted(rows_only - set(TWINS)), sorted(set(TWINS) - rows_only))
    for name, spec in TWINS.items():
        assert set(spec) == {"twin", "reason"}, name
        twin = spec["twin"]
        assert twin in QUERIES, (name, twin)
        assert twin in ORACLE, (name, twin)
        assert spec["reason"].strip(), name


def test_twins_exported_through_entry_module():
    import __spark_entry__ as E

    t = E.twins()
    assert set(t) == set(E.queries()) - set(E.oracle_sql())
    # mutation of the returned map must not touch the registry
    t.clear()
    assert E.twins()
