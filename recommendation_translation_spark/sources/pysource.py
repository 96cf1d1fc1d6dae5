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

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

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


def _row(i: int) -> tuple:
    return (i, _h32(f"b:{i}") % 10, (_h32(f"s:{i}") % 10000) / 100.0)


class _SyntheticStreamReader(SimpleDataSourceStreamReader):
    """Streaming form of the same relation: micro-batches of
    ``batch`` ids per trigger until ``rows`` ids have been emitted,
    then caught-up (read returns the unchanged offset).

    Offsets are plain dicts ``{"i": next_id}`` — everything a restart
    needs; ``readBetweenOffsets`` regenerates any committed span
    deterministically (the rows are a pure function of the id), which
    is exactly the replayability contract the API asks of a recoverable
    source."""

    def __init__(self, options):
        self.n = int(options.get("rows", "2000"))
        self.batch = int(options.get("batch", "500"))

    def initialOffset(self):
        return {"i": 0}

    def read(self, start):
        # the prefetch wrapper requires a true iterator AND pickles it
        # to ship prefetched rows to executors — a list_iterator is
        # both (generators are not picklable)
        i = int(start["i"])
        if i >= self.n:
            return iter([]), start  # caught up: offset unchanged
        end = min(i + self.batch, self.n)
        return iter([_row(j) for j in range(i, end)]), {"i": end}

    def readBetweenOffsets(self, start, end):
        return iter([_row(j) for j in range(int(start["i"]), int(end["i"]))])

    def commit(self, end):
        pass  # nothing external to acknowledge


class _StagedFile(WriterCommitMessage):
    def __init__(self, staged: str, rows: int):
        self.staged, self.rows = staged, rows


class _JsonlTwoPhaseWriter(DataSourceWriter):
    """Python DataSource WRITER with the two-phase commit contract the
    API exists for: each task writes its partition to a private
    ``_staging`` file and returns a commit message; only the driver's
    ``commit()`` publishes the files (rename + ``_SUCCESS`` marker),
    and ``abort()`` discards the staging dir — a half-failed job never
    leaves partial output visible.  Local-filesystem staging works in
    this single-node sandbox; a production writer stages into the
    target SYSTEM's transactional primitive (S3 MPU upload ids, a DB
    transaction, an idempotent PUT) — the protocol shape is the same.
    """

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("synthetic_events writer requires option 'path'")

    def write(self, iterator) -> _StagedFile:
        import json
        import os
        import uuid

        staging = os.path.join(self.path, "_staging")
        os.makedirs(staging, exist_ok=True)
        staged = os.path.join(staging, f"part-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(staged, "w") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return _StagedFile(staged, n)

    def commit(self, messages) -> None:
        import os
        import shutil

        total = 0
        for m in messages:
            os.replace(
                m.staged, os.path.join(self.path, os.path.basename(m.staged))
            )
            total += m.rows
        shutil.rmtree(os.path.join(self.path, "_staging"), ignore_errors=True)
        with open(os.path.join(self.path, "_SUCCESS"), "w") as fh:
            fh.write(str(total))

    def abort(self, messages) -> None:
        import shutil

        shutil.rmtree(os.path.join(self.path, "_staging"), ignore_errors=True)


class SyntheticEventsSource(DataSource):
    """``spark.read.format("synthetic_events").option("rows", n)`` —
    deterministic (id, bucket, score) rows; also usable as a streaming
    source (``spark.readStream``) emitting the same relation in
    micro-batches."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return "id bigint, bucket bigint, score double"

    def reader(self, schema):
        return _SyntheticReader(self.options)

    def simpleStreamReader(self, schema):
        return _SyntheticStreamReader(self.options)

    def writer(self, schema, overwrite: bool):
        return _JsonlTwoPhaseWriter(self.options)


def register_synthetic_source(spark) -> None:
    """Idempotent per-session registration."""
    spark.dataSource.register(SyntheticEventsSource)
