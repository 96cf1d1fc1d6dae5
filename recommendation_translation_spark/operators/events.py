"""Event-time window aggregations over the ``events`` table
(SURVEY.md §2.9 extension — the reference has no streaming surface at
all; these are the batch-windowed forms, with Structured Streaming
variants in ``streaming/``).

Window starts are emitted as epoch seconds (bigint) rather than
timestamps so the DuckDB oracle comparison is immune to timestamp
rendering differences; both engines bucket relative to the Unix epoch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["tumbling_agg", "sliding_agg", "sessionize", "resample_ffill", "resample_interpolate"]


def tumbling_agg(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """Tumbling event-time windows per event_type: count + sum(value).

    ``F.window`` is the native bucketing operator — epoch-aligned, one
    shuffle on (window, event_type) with map-side partial aggregation.
    """
    return (
        events.groupBy(F.window("ts", width).alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start_epoch"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_agg(events: DataFrame, width: str = "1 hour", slide: str = "30 minutes") -> DataFrame:
    """Sliding windows (width/slide overlapping buckets) per event_type.

    Each event lands in width/slide windows; ``F.window`` replicates
    rows window-side before the aggregation — shuffle volume is
    (width/slide)× the input, which is the algorithmic floor."""
    return (
        events.groupBy(F.window("ts", width, slide).alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start_epoch"),
            "event_type",
            "n_events",
            "avg_value",
        )
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization per user (batch form).

    lag(ts) over (user order by ts, event_id) → new-session flag on gap
    > threshold → running sum numbers the sessions → aggregate.  Two
    window passes over one (user) partitioning — a single shuffle, both
    windows reuse the exchange.  The streaming equivalent is
    ``session_window``/``applyInPandasWithState`` (streaming module).
    """
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    gap = F.lit(gap_minutes * 60)
    with_flag = events.withColumn(
        "new_session",
        F.when(
            F.col("ts").cast("long") - F.lag(F.col("ts").cast("long"), 1).over(w) > gap,
            1,
        )
        .otherwise(0)
        .cast("int"),
    ).withColumn(
        "new_session",
        F.when(F.lag("ts", 1).over(w).isNull(), 1).otherwise(F.col("new_session")),
    )
    sessioned = with_flag.withColumn(
        "session_seq",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        sessioned.groupBy("user_id", "session_seq")
        .agg(
            F.unix_timestamp(F.min("ts")).alias("session_start_epoch"),
            F.unix_timestamp(F.max("ts")).alias("session_end_epoch"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


def resample_ffill(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """Time-series resampling with gap-fill + forward-fill per event
    type: bucket to a fixed grid, materialize EVERY grid cell between
    each type's first and last bucket (``sequence`` + ``explode`` —
    distributed, no driver-side date loop), left-join the observed
    aggregates back, and carry the last observed sum forward across
    empty cells with ``last(ignorenulls)`` over an ordered window.

    Scale shape: the observed aggregation is one shuffle with map-side
    partials; the grid is |types| × span/width rows generated
    executor-side; the fill window partitions by type so no global
    ordering appears.  The dense grid joins on (type, bucket) and the
    observed side is already aggregated — tiny versus the raw stream.
    """
    hourly = (
        events.groupBy(F.window("ts", width).alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(F.col("w.start").alias("bucket"), "event_type", "n_events", "sum_value")
    )
    grid = (
        hourly.groupBy("event_type")
        .agg(F.min("bucket").alias("lo"), F.max("bucket").alias("hi"))
        .select(
            "event_type",
            F.explode(
                F.sequence("lo", "hi", F.expr(f"INTERVAL {width}"))
            ).alias("bucket"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        grid.join(hourly, ["event_type", "bucket"], "left_outer")
        .select(
            "event_type",
            F.unix_timestamp("bucket").alias("bucket_epoch"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.last("sum_value", ignorenulls=True).over(w).alias("sum_value_filled"),
            F.when(F.col("n_events").isNull(), 1).otherwise(0).cast("long").alias("is_gap"),
        )
    )


def resample_interpolate(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """Time-series resampling with LINEAR interpolation across gaps —
    the numeric companion of :func:`resample_ffill`: each empty grid
    cell gets ``prev + (next − prev) · Δt_prev / Δt_span`` between its
    nearest observed neighbours (head gaps backfill, tail gaps carry
    forward).

    Same scale shape as the ffill form (one observed aggregation, an
    executor-side dense grid, per-type windows — no global ordering);
    the neighbour lookups are two ignorenulls windows (last-preceding,
    first-following) over the already-aggregated grid.

    The gap value is computed in EXACT integer arithmetic (1e-4 value
    units × epoch seconds) with an explicit integer HALF-UP at the
    end.  A float formulation is a latent cross-engine tie-breaker
    bug: interpolating 4-dp inputs at rational grid fractions (e.g.
    7/8 of a gap span) lands on exact decimal halves like 10.63375,
    where Spark's ``round`` (HALF_UP on the shortest decimal string
    via BigDecimal) yields 10.6338 while engines that round the
    binary double (DuckDB, value is a hair below the half) yield
    10.6337 — found by the round-5 sf0.001 sweep.  Integer num/den
    with ``(2·num + den) div (2·den)`` is identical everywhere.
    Bounds: |num| ≤ 1e9·(seconds span) — safe to spans of ~10⁹ s.
    Values are assumed non-negative (sums of event values); the
    truncating ``div`` and flooring ``//`` agree only then."""
    hourly = (
        events.groupBy(F.window("ts", width).alias("w"), F.col("event_type"))
        .agg(F.round(F.sum("value"), 4).alias("sum_value"))
        .select(F.col("w.start").alias("bucket"), "event_type", "sum_value")
    )
    grid = (
        hourly.groupBy("event_type")
        .agg(F.min("bucket").alias("lo"), F.max("bucket").alias("hi"))
        .select(
            "event_type",
            F.explode(
                F.sequence("lo", "hi", F.expr(f"INTERVAL {width}"))
            ).alias("bucket"),
        )
    )
    joined = grid.join(hourly, ["event_type", "bucket"], "left_outer").withColumn(
        "ue", F.unix_micros("bucket")
    )
    wprev = (
        Window.partitionBy("event_type").orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wnext = (
        Window.partitionBy("event_type").orderBy("bucket")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    observed = F.col("sum_value").isNotNull()
    # exact 1e-4 fixed-point: inputs are 4-dp, so ×10000 is integral;
    # epoch seconds (not micros) keep num within int64 headroom
    joined = (
        joined.withColumn(
            "prev_v", F.last("sum_value", ignorenulls=True).over(wprev)
        )
        .withColumn("next_v", F.first("sum_value", ignorenulls=True).over(wnext))
        .withColumn(
            "pes",
            F.expr(
                "last(CASE WHEN sum_value IS NOT NULL THEN ue div 1000000 END, true)"
            ).over(wprev),
        )
        .withColumn(
            "nes",
            F.expr(
                "first(CASE WHEN sum_value IS NOT NULL THEN ue div 1000000 END, true)"
            ).over(wnext),
        )
        .withColumn("prev_i", F.round(F.col("prev_v") * 10000).cast("long"))
        .withColumn("next_i", F.round(F.col("next_v") * 10000).cast("long"))
    )
    prev_v, next_v = F.col("prev_v"), F.col("next_v")
    # integer HALF-UP of num/den (operands non-negative): (2n + d) div 2d
    half_up = F.expr(
        "(2 * (prev_i * (nes - pes) + (next_i - prev_i) * (ue div 1000000 - pes))"
        " + (nes - pes)) div (2 * (nes - pes))"
    )
    interp = (
        F.when(observed, F.col("sum_value"))
        .when(prev_v.isNull(), next_v)   # head gap: backfill
        .when(next_v.isNull(), prev_v)   # tail gap: carry forward
        .otherwise(half_up / F.lit(10000.0))
    )
    return joined.select(
        "event_type",
        (F.col("ue") / 1_000_000).cast("long").alias("bucket_epoch"),
        F.when(observed, 0).otherwise(1).cast("long").alias("is_gap"),
        interp.alias("sum_value_interp"),
    )


def sessionize_dynamic(events: DataFrame) -> DataFrame:
    """Dynamic-gap sessionization via ``session_window`` with a
    per-event gap COLUMN (error events hold a session open for 60
    minutes, everything else 30): sessions are unions of overlapping
    ``[ts, ts+gap)`` intervals, so a single long-gap event stretches
    the whole session — semantics a fixed-gap lag/flag formulation
    cannot express.  Batch mode here; the identical expression runs
    under readStream with a watermark.  One shuffle on (user_id), the
    native session merge runs inside the aggregation."""
    gap = (
        F.when(F.col("event_type") == "error", "60 minutes")
        .otherwise("30 minutes")
    )
    return (
        events.groupBy("user_id", F.session_window("ts", gap).alias("sw"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("sw.start")).alias("session_start_us"),
            F.unix_micros(F.col("sw.end")).alias("session_end_us"),
            F.col("n_events").cast("long").alias("n_events"),
            "sum_value",
        )
    )
