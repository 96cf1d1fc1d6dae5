"""Sink operators S5, S8, S10 (SURVEY.md §2.1).

- Parquet sinks use ``errorifexists`` like the reference
  (DataGatherer.scala:19, FeatureExtractor.scala:26) so a re-run can never
  silently clobber a prior artifact.
- The final CSV sink keeps the reference's single-file contract
  (ScorePredictor.scala:51-56) but the ``coalesce(1)`` runs AFTER all
  aggregation — only the already-small result funnels through one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["write_parquet", "write_predictions_csv", "write_bucketed_table"]


def write_parquet(df: DataFrame, path: str, mode: str = "errorifexists",
                  partition_by: list[str] | None = None) -> None:
    """S5/S7 — parquet sink.  At scale, pass ``partition_by`` (e.g. a date
    or site column) so downstream reads get partition pruning."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "errorifexists",
) -> None:
    """Bucketed (optionally sorted) parquet table.

    Bucketing pays the shuffle ONCE at write time: every later equi-join
    or aggregation on the bucket key reads co-located, pre-hashed (and
    with ``sort_cols`` pre-sorted) buckets, so the join plans with zero
    Exchange — the difference between an hours-long shuffle and a scan
    at 100 TB for fact-to-fact joins that can't broadcast.  Pass
    ``path`` to create it as an external table."""
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def write_predictions_csv(df: DataFrame, path: str, mode: str = "errorifexists") -> None:
    """S10 — single bzip2 CSV with header.  ScorePredictor.scala:51-56."""
    (
        df.coalesce(1)
        .write.mode(mode)
        .option("header", True)
        .option("compression", "bzip2")
        .csv(path)
    )
