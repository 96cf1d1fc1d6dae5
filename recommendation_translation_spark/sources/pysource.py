"""Python DataSource API (Spark 4) — a deterministic synthetic source.

The reference reads TSV/parquet/Hive (SURVEY.md §2.1); this module
exercises the remaining source surface Spark offers PySpark-native
engines: a custom ``DataSource`` implemented in Python, with a
partitioned batch reader.  The rows are a pure function of the row id
(the cross-engine md5 hash used throughout the repo), so a SQL oracle
can regenerate the identical relation from ``range()`` — which is what
makes a *generator* source testable at all.

Scale notes: ``partitions()`` splits the id space into contiguous
slices, so the source parallelizes like any file scan; each partition
streams its rows from a generator (no materialized list).  A real
deployment would back ``read()`` with an external system's client and
push the slice bounds down as range predicates.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

__all__ = ["SyntheticEventsSource", "register_synthetic_source"]


def _h32(s: str) -> int:
    """int(md5(s)[:8], 16) — matches queries._hash_sql / DuckDB
    ``('0x' || substr(md5(s), 1, 8))::BIGINT``."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16)


class _Slice(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class _SyntheticReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("rows", "2000"))
        self.parts = int(options.get("partitions", "8"))

    def partitions(self):
        step = max(1, -(-self.n // self.parts))
        return [
            _Slice(i, min(i + step, self.n)) for i in range(0, self.n, step)
        ]

    def read(self, partition: _Slice) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield (
                i,
                _h32(f"b:{i}") % 10,
                (_h32(f"s:{i}") % 10000) / 100.0,
            )


class SyntheticEventsSource(DataSource):
    """``spark.read.format("synthetic_events").option("rows", n)`` —
    deterministic (id, bucket, score) rows."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return "id bigint, bucket bigint, score double"

    def reader(self, schema):
        return _SyntheticReader(self.options)


def register_synthetic_source(spark) -> None:
    """Idempotent per-session registration."""
    spark.dataSource.register(SyntheticEventsSource)
