"""Physical-plan inspection helpers (SURVEY.md §4).

The scale contract of every operator is asserted in tests, not assumed:
filters reach the parquet scan (PushedFilters), small dimensions
broadcast, and shuffle counts stay at the algorithmic floor.  These
helpers parse ``explain("formatted")`` output for those properties.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import DataFrame

__all__ = [
    "physical_plan",
    "assert_pushed_filters",
    "assert_broadcast_join",
    "count_exchanges",
]


def physical_plan(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    """Assert each fragment appears in a PushedFilters clause."""
    plan = physical_plan(df)
    pushed = [line for line in plan.splitlines() if "PushedFilters" in line]
    blob = "\n".join(pushed)
    for frag in fragments:
        assert frag in blob, f"filter {frag!r} not pushed down; plan:\n{plan}"


def assert_broadcast_join(df: DataFrame, at_least: int = 1) -> None:
    plan = physical_plan(df)
    n = plan.count("BroadcastHashJoin")
    assert n >= at_least, f"expected ≥{at_least} broadcast joins, saw {n}; plan:\n{plan}"


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan (AQE may remove
    more at runtime; this is the static upper bound)."""
    plan = physical_plan(df)
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line and "BroadcastExchange" not in line and "reuses" not in line
    )
