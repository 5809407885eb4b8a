"""Registry-wide cross-join gate: every Cross join must have at least
one BOUNDED side — the third silent-scale-killer class closed by a
construction-time plan gate (after the global-window gate,
tests/test_plan_shapes.py, and the forced-broadcast gate,
tests/test_broadcast_guard.py).

A cross join of two sf-scaling frames is O(sf²) rows: it cannot OOM-
fail fast like a forced broadcast, it just runs forever at 100 TB.
Every legitimate crossJoin in this registry carries a 1-row total, a
top-k query set, a centroid/fence table, or a bounded dim — all of
which show up in the ANALYZED logical plan as an Aggregate / Limit /
Sample / Deduplicate node above any sf-scaling leaf on that side.

Detector: for each Join node whose type is Cross, check each side —
a side is BOUNDED when every sf-scaling leaf under it has a
cardinality-bounding ancestor WITHIN that side (same node classes as
the broadcast guard; projections/filters/joins do not bound). The
join passes when at least one side is bounded.
"""

from __future__ import annotations

import re

import pytest

from vector_database_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"

SCALING_TABLES = (
    "lineitem",
    "orders",
    "customer",
    "supplier",
    "part",
    "events",
    "documents",
    "embeddings",
)

BOUNDING_NODES = {
    "Aggregate",
    "GlobalLimit",
    "LocalLimit",
    "Limit",
    "Sample",
    "Deduplicate",
}

#: query -> documented reason an unbounded×unbounded cross join is
#: acceptable anyway. Empty: there is no such reason at 100 TB.
ALLOWLIST: dict[str, str] = {}

_LEAF_TABLE_RE = re.compile(r"/(\w+)\.parquet")


def _unbounded_leaves(jnode, bounded, hits):
    cls = jnode.getClass().getSimpleName()
    if cls in BOUNDING_NODES:
        bounded = True
    n = jnode.children().size()
    if n == 0 and not bounded:
        for tbl in _LEAF_TABLE_RE.findall(jnode.toString()):
            if tbl in SCALING_TABLES:
                hits.append(tbl)
    for i in range(n):
        _unbounded_leaves(jnode.children().apply(i), bounded, hits)


def _walk_joins(jnode, violations):
    cls = jnode.getClass().getSimpleName()
    if cls == "Join" and "Cross" in jnode.joinType().toString():
        sides = []
        for i in range(2):
            hits: list[str] = []
            _unbounded_leaves(jnode.children().apply(i), False, hits)
            sides.append(hits)
        if sides[0] and sides[1]:
            violations.append((sorted(set(sides[0])), sorted(set(sides[1]))))
    n = jnode.children().size()
    for i in range(n):
        _walk_joins(jnode.children().apply(i), violations)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_cross_joins_have_a_bounded_side(spark, name):
    df = QUERIES[name](spark, SF)
    violations: list = []
    _walk_joins(df._jdf.queryExecution().analyzed(), violations)
    if name in ALLOWLIST:
        assert violations, (
            f"{name} is allowlisted for an unbounded cross join but its "
            "plan no longer has one — remove it from ALLOWLIST"
        )
        return
    assert not violations, (
        f"{name}: cross join with BOTH sides unbounded "
        f"(scaling leaves {violations}) — O(sf²) rows at 100 TB. Put an "
        "Aggregate/Limit on one side or make it an equi-join on a "
        "blocking key."
    )
