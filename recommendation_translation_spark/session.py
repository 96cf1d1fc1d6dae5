"""SparkSession construction.

The reference builds its session in JobRunner.scala:21-27 (appName +
optional ``master("local[*]")``).  We add the settings a Catalyst-first
engine wants everywhere:

- AQE on (runtime shuffle coalescing, skew-join splitting, dynamic
  broadcast) — replaces the reference's hand-rolled fixed-16-partition
  ``SitePartitioner`` (FeatureExtractor.scala:40-48).
- Arrow on (fast pandas interchange for the Pandas-UDF extension ops).
- UTC session timezone so timestamp semantics match the DuckDB oracle.
- shuffle partitions sized to the local core count rather than the 200
  default; on a real cluster this is overridden by AQE + explicit conf.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "stop_spark"]


def get_spark(
    app_name: str = "recommendation_translation_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a
    cluster leave it unset and let spark-submit supply it.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
        # Parquet vectorized reader + pushdown are on by default; keep
        # them explicit so a misconfigured cluster profile can't lose them.
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.enableVectorizedReader", "true")
        # The driver-generated events table stores TIMESTAMP(NANOS) which
        # Spark's TimestampType (µs) cannot represent; read as long and
        # convert in sources.readers.read_events.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # FAIR scheduling so the per-site training fan-out
        # (pipeline/train.py, mirroring JobRunner.scala:51-54) round-
        # robins cluster slots across its 8 concurrent sites instead of
        # FIFO-queueing one site's hundreds of tree-depth jobs ahead of
        # the rest; each site thread sets its own spark.scheduler.pool.
        # Static conf — a no-op on sessions built elsewhere (the pool
        # local-property degrades gracefully to FIFO there).
        .config("spark.scheduler.mode", "FAIR")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
