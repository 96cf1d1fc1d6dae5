"""Change-data-capture extraction between table snapshots.

The missing half of the MERGE/upsert sink (`sources.writers.
merge_upsert_parquet`): given two snapshots of a keyed table, recover
the change set (insert / update / delete rows) that transforms one
into the other — what a downstream incremental consumer replays
instead of re-reading the full table.

No reference counterpart (the reference overwrite-writes whole
outputs, ScorePredictor.scala:51-55); extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Diff two snapshots on ``key_cols``: one FULL OUTER join (a
    single shuffle on the key — broadcast-converted by AQE when one
    side is small), classifying every key as insert (new only),
    delete (old only) or update (both sides, any ``compare_cols``
    value changed, null-safely).  Unchanged keys are dropped — the
    output is the change set, sized by the churn, not the table.

    Returns ``key_cols + [action, old_<c>, new_<c>...]`` for the
    compared columns.
    """
    if not key_cols:
        raise ValueError("snapshot_diff needs at least one key column")
    compare_cols = (
        list(compare_cols)
        if compare_cols is not None
        else [c for c in new.columns if c not in key_cols]
    )
    o = old.select(
        *key_cols, F.struct(*compare_cols).alias("_old")
    )
    n = new.select(
        *key_cols, F.struct(*compare_cols).alias("_new")
    )
    j = o.join(n, key_cols, "full_outer")
    action = (
        F.when(F.col("_old").isNull(), F.lit("insert"))
        .when(F.col("_new").isNull(), F.lit("delete"))
        .when(~F.col("_old").eqNullSafe(F.col("_new")), F.lit("update"))
    )  # unchanged → NULL → filtered
    out = j.withColumn("action", action).filter(F.col("action").isNotNull())
    return out.select(
        *key_cols,
        "action",
        *[F.col(f"_old.{c}").alias(f"old_{c}") for c in compare_cols],
        *[F.col(f"_new.{c}").alias(f"new_{c}") for c in compare_cols],
    )
