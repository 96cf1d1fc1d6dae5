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

__all__ = ["write_parquet", "write_predictions_csv"]


def write_parquet(df: DataFrame, path: str, mode: str = "errorifexists",
                  partition_by: list[str] | None = None) -> None:
    """S5/S7 — parquet sink.  At scale, pass ``partition_by`` (e.g. a date
    or site column) so downstream reads get partition pruning."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_predictions_csv(df: DataFrame, path: str, mode: str = "errorifexists") -> None:
    """S10 — single bzip2 CSV with header.  ScorePredictor.scala:51-56."""
    (
        df.coalesce(1)
        .write.mode(mode)
        .option("header", True)
        .option("compression", "bzip2")
        .csv(path)
    )
