"""Plan introspection helpers — the tests assert physical-plan properties
(filter pushed to the parquet scan, small side broadcast, top-k planned as
TakeOrderedAndProject), because at 100 TB the plan IS the performance.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def assert_pushed_filters(df: DataFrame, *needles: str) -> None:
    """Assert the formatted plan shows parquet PushedFilters containing each
    needle (e.g. a column name) — i.e. the predicate reaches the scan."""
    plan = explain_str(df)
    assert "PushedFilters" in plan, plan
    for n in needles:
        assert any(
            n in line for line in plan.splitlines() if "PushedFilters" in line
        ), f"filter on {n!r} not pushed:\n{plan}"


def assert_broadcast_join(df: DataFrame) -> None:
    plan = explain_str(df)
    assert "Broadcast" in plan, f"expected a broadcast join:\n{plan}"


def assert_take_ordered(df: DataFrame) -> None:
    plan = explain_str(df)
    assert "TakeOrderedAndProject" in plan, f"expected TakeOrderedAndProject:\n{plan}"
