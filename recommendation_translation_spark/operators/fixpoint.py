"""Scoped session tuning for small-relation iterative fixpoints
(connected components, PageRank).

The iterative operators here run O(log n) .. O(n_iter) rounds where
every round is a couple of joins over a label/rank relation that is
tiny next to the corpus (nodes and edges, not documents).  Under AQE
each round's every exchange is materialized as its own job with its
own re-planning pass; the r13 stage profile showed dedup_clusters at
66 jobs and part_pagerank at 44 with NO stage over one second — the
queries were paying a per-job scheduling floor, not compute (guide
§1.1: decide empirically where the time goes before touching the
plan).  For a relation measured in at most a few million rows the
adaptive machinery cannot win anything back (there is no skew to
split and nothing meaningful to coalesce), so inside the fixpoint we
scope it off and size the shuffle width directly from the relation's
row count — restoring both on exit.

Scale posture: the scope is a NO-OP above ``FIXPOINT_SCOPE_MAX_ROWS``
— a billion-edge graph keeps AQE (skew splitting matters there) and
the session's own shuffle sizing.  Below it the width is derived from
the row count (``rows / FIXPOINT_ROWS_PER_PARTITION``, floored), so
the setting adapts to the data rather than encoding the local core
count; the driver's vanilla 200-partition session and the bench's
32-partition session both converge to the same small width for the
same graph.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import SparkSession

__all__ = [
    "FIXPOINT_SCOPE_MAX_ROWS",
    "FIXPOINT_ROWS_PER_PARTITION",
    "fixpoint_scope",
]

#: Above this relation size the scope is inert: adaptive execution's
#: skew handling is worth its job overhead once per-round shuffles
#: carry real data.  Same "bounded constant, broadcast-threshold
#: standard" reasoning as DRIVER_CC_MAX_EDGES, two decades larger.
FIXPOINT_SCOPE_MAX_ROWS = 2_000_000

#: Target rows per shuffle partition inside the scope — label/rank
#: rows are a few dozen bytes, so 100k rows ≈ single-digit MB per
#: task, far under any memory concern while keeping task counts low.
FIXPOINT_ROWS_PER_PARTITION = 100_000

#: Lower bound on the scoped shuffle width: even a hundred-row graph
#: keeps a few partitions so one straggler task cannot serialize a
#: round on a busy executor.
_FIXPOINT_MIN_PARTITIONS = 4


@contextmanager
def fixpoint_scope(spark: SparkSession, n_rows: int | None,
                   max_rows: int = FIXPOINT_SCOPE_MAX_ROWS):
    """Context manager: inside, AQE is off and shuffle width is sized
    from ``n_rows`` (the fixpoint relation's row count); both settings
    are restored on exit.  Yields True when the scope is active so the
    caller can decide to materialize its lazy chain inside the scope
    (one AQE-free job) — and skip that extra action when inert.
    ``n_rows`` None (unknown) or above ``max_rows`` yields inert with
    the session untouched.  Results cannot depend on the scope: it
    changes job/stage granularity only.
    """
    if n_rows is None or n_rows > max_rows:
        yield False
        return
    conf = spark.conf
    old_aqe = conf.get("spark.sql.adaptive.enabled")
    old_parts = conf.get("spark.sql.shuffle.partitions")
    parts = max(
        _FIXPOINT_MIN_PARTITIONS,
        min(int(old_parts), n_rows // FIXPOINT_ROWS_PER_PARTITION + 1),
    )
    try:
        conf.set("spark.sql.adaptive.enabled", "false")
        conf.set("spark.sql.shuffle.partitions", str(parts))
        yield True
    finally:
        conf.set("spark.sql.adaptive.enabled", old_aqe)
        conf.set("spark.sql.shuffle.partitions", old_parts)
