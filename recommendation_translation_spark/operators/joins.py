"""Temporal join operators the reference lacks (extension surface).

The reference's only joins are equi-joins (SURVEY.md §2.3 — J1 inner
USING, J2 outer fold); event pipelines also need *as-of* and *range*
joins, which Spark has no physical operator for.  Both are built here as
compositions of existing DataFrame ops — no UDF, no cartesian product —
so Catalyst still sees a fully declarative plan:

- **as-of join**: the union-and-window trick.  Tag both inputs, union
  them, and for each left row take ``last(right_value, ignorenulls)``
  over ``Window.partitionBy(keys).orderBy(ts, side)``.  Exactly ONE
  shuffle (by key), no join blowup, and per-key skew is bounded by the
  window sort — the same plan a hand-written merge-asof would produce,
  except AQE still gets to pick partitioning.
- **range join**: bucketed equi-join.  Quantize the probe timestamp to
  fixed-width buckets, explode each probe row to the (few) buckets its
  window overlaps, equi-join on (key, bucket), then re-filter with the
  exact range predicate.  Join fan-out is bounded by
  ``window/bucket + 1`` per row instead of the per-key cross product a
  naive ``a.ts BETWEEN ...`` theta-join would cost (which Spark executes
  as BroadcastNestedLoop or a per-key cartesian).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "range_count", "salted_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """For every left row, attach the latest right row with
    ``right.ts <= left.ts`` and equal key(s) — pandas ``merge_asof``
    semantics (direction='backward', inclusive), distributed.

    Right rows must be unique per (key, ts); pre-aggregate if not, or
    the matched row among equal timestamps is undefined.  Output = all
    left columns + ``<prefix><c>`` for each right value column (null
    when no right row precedes the left row).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in keys and c != right_ts]

    l_tag = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in left.columns if c not in keys and c != left_ts],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{prefix}{c}") for c in value_cols],
    )
    r_tag = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in keys and c != left_ts],
        *[F.col(c).alias(f"{prefix}{c}") for c in value_cols],
    )
    unioned = l_tag.unionByName(r_tag)
    # side orders right (0) before left (1) at equal ts ⇒ ties are
    # inclusive, matching ASOF JOIN's l.ts >= r.ts
    w = (
        Window.partitionBy(*keys)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*",
        *[F.last(f"{prefix}{c}", ignorenulls=True).over(w).alias(f"_f_{c}") for c in value_cols],
        F.last(F.when(F.col("_side") == 0, F.col("_ts")).otherwise(F.lit(None)),
               ignorenulls=True).over(w).alias(f"_f__ts"),
    )
    out_left = [c for c in left.columns if c not in keys and c != left_ts]
    return (
        filled.filter(F.col("_side") == 1)
        .select(
            *keys,
            F.col("_ts").alias(left_ts),
            *out_left,
            *[F.col(f"_f_{c}").alias(f"{prefix}{c}") for c in value_cols],
            F.col("_f__ts").alias(f"{prefix}{right_ts}"),
        )
    )


def range_count(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    window_seconds: int,
    probe_ts: str = "ts",
    build_ts: str = "ts",
    probe_id: str = "event_id",
) -> DataFrame:
    """Per probe row, count build rows with the same key whose timestamp
    falls in ``[probe.ts − window, probe.ts)`` — a range (interval)
    join, executed as a bucketed equi-join (module docstring).

    Returns the probe rows + ``n_in_range`` (0 when nothing matched).
    """
    bucket_us = F.lit(int(window_seconds) * 1_000_000)
    p_b = (F.unix_micros(F.col(probe_ts)) / bucket_us).cast("long")
    b_b = (F.unix_micros(F.col(build_ts)) / bucket_us).cast("long")

    probes = probe.select(
        F.col(probe_id), F.col(on), F.col(probe_ts),
        F.explode(F.array(p_b - 1, p_b)).alias("_bkt"),
    )
    builds = build.select(
        F.col(on).alias("_bon"), F.col(build_ts).alias("_bts"), b_b.alias("_bkt")
    )
    lo = F.col(probe_ts) - F.make_dt_interval(secs=F.lit(window_seconds))
    matched = (
        probes.join(
            builds,
            (probes["_bkt"] == builds["_bkt"]) & (F.col(on) == F.col("_bon")),
            "inner",
        )
        .filter((F.col("_bts") >= lo) & (F.col("_bts") < F.col(probe_ts)))
        .groupBy(probe_id)
        .agg(F.count("*").alias("n_in_range"))
    )
    return (
        probe.join(matched, probe_id, "left")
        .withColumn("n_in_range", F.coalesce("n_in_range", F.lit(0)))
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salt: int = 16,
    salt_on: str | None = None,
    how: str = "inner",
    pin_shuffle_join: bool = True,
) -> DataFrame:
    """Equi-join with manual key salting for skewed fact keys.

    A hot key (one customer with 10% of all events) concentrates a
    shuffle join's work on one reducer; AQE's skew-join split handles
    the sort-merge case, but salting is the portable fix that also
    covers aggregations downstream.  The fact side gets a deterministic
    salt in ``[0, salt)`` (hash of ``salt_on``, defaulting to all fact
    columns), the dim side is replicated ``salt``× with ``explode``,
    and the join runs on ``(key, salt)`` — splitting each hot key into
    ``salt`` evenly-sized shuffle partitions.  Result is exactly the
    unsalted join; dim replication cost is ``salt × |dim|`` rows,
    which is the knob to balance against the skew factor.

    ``pin_shuffle_join`` (default True) attaches a sort-merge hint to
    the replicated dim, closing the round-7 "AQE plan luck" watch
    item: at mid scale AQE's runtime stats sometimes rewrote this join
    into a BROADCAST of the replicated dim — measured 3× SLOWER than
    the shuffle join it replaced (sf1 best-of-2: 9.5 s broadcast vs
    2.9 s hinted SMJ / 2.8 s shuffle-hash; sf3: 3.3 / 3.4 / 3.7 s, a
    wash), and structurally wrong besides: salted_join is only called
    when the dim is too big to broadcast — a broadcastable dim needs
    no salt, broadcast joins having no shuffle skew at all.  SMJ over
    shuffle_hash: equal at the salt spread's parallelism and it
    degrades by sort-spill rather than build-side OOM on 100 TB
    partitions.  Pass False to let AQE choose freely."""
    salt_src = F.concat_ws("", *[F.col(c).cast("string") for c in fact.columns]) \
        if salt_on is None else F.col(salt_on).cast("string")
    f = fact.withColumn("_salt", F.pmod(F.xxhash64(salt_src), F.lit(salt)).cast("int"))
    d = dim.withColumn("_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    if pin_shuffle_join:
        d = d.hint("merge")
    out = f.join(d, (f[fact_key] == d[dim_key]) & (f["_salt"] == d["_salt"]), how)
    return out.drop("_salt")
