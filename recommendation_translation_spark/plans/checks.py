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
    "assert_whole_stage_codegen",
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
    # simple mode lists each operator exactly once (formatted repeats
    # them in the details section).
    plan = physical_plan(df, mode="simple")
    n = plan.count("BroadcastHashJoin")
    assert n >= at_least, f"expected ≥{at_least} broadcast joins, saw {n}; plan:\n{plan}"


def assert_whole_stage_codegen(df: DataFrame) -> None:
    """Assert the plan has at least one whole-stage-codegen span.

    Under AQE no plan mode shows codegen spans until the final plan
    materializes, so execute the plan and inspect the executed plan."""
    # collect() executes THIS DataFrame's query execution (count() would
    # build a separate one), finalizing the AQE plan in place
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # codegen spans render as "*(n) Operator" in the finalized plan
    assert "*(" in plan, f"no WholeStageCodegen span in:\n{plan[:4000]}"


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan (AQE may remove
    more at runtime; this is the static upper bound).  Counted on the
    simple plan, where each operator appears exactly once; broadcast
    exchanges and AQE reuse nodes don't count."""
    plan = physical_plan(df, mode="simple")
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line and "BroadcastExchange" not in line and "reuses" not in line
    )
