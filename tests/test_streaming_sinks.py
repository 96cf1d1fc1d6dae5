"""Durable streaming sinks: checkpointed exactly-once file output and
foreachBatch upsert through the versioned merge sink (round 3).

The memory-sink harness in streaming/events_stream.py proves the
aggregation semantics; these tests pin the DELIVERY semantics — what
happens on restart with the same checkpoint."""

from __future__ import annotations

from recommendation_translation_spark.sources.readers import read_events
from recommendation_translation_spark.sources.writers import read_current_version
from recommendation_translation_spark.streaming.events_stream import (
    stream_events_to_parquet,
    stream_upsert_user_totals,
)

from .conftest import SF_SMALL


def test_checkpointed_file_sink_exactly_once(spark, tmp_path):
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    stream_events_to_parquet(spark, SF_SMALL, out, ckpt)
    n_batch = read_events(spark, SF_SMALL).count()
    assert spark.read.parquet(out).count() == n_batch
    # restart with the SAME checkpoint: nothing uncommitted -> no dupes
    stream_events_to_parquet(spark, SF_SMALL, out, ckpt)
    assert spark.read.parquet(out).count() == n_batch
    # distinct event ids prove exactly-once, not just equal counts
    assert spark.read.parquet(out).select("event_id").distinct().count() == n_batch


def test_foreach_batch_upsert_totals(spark, tmp_path):
    target, ckpt = str(tmp_path / "totals"), str(tmp_path / "ckpt")
    stream_upsert_user_totals(spark, SF_SMALL, target, ckpt)
    got = {
        (r.user_id, r.n_events, r.sum_value)
        for r in read_current_version(spark, target).collect()
    }
    from pyspark.sql import functions as F

    want = {
        (r.user_id, r.n_events, r.sum_value)
        for r in read_events(spark, SF_SMALL)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .collect()
    }
    assert got == want
    # a restart with the same checkpoint must not produce a new version
    # of any key's totals (no uncommitted batches remain)
    stream_upsert_user_totals(spark, SF_SMALL, target, ckpt)
    got2 = {
        (r.user_id, r.n_events, r.sum_value)
        for r in read_current_version(spark, target).collect()
    }
    assert got2 == want


def test_transform_with_state_matches_apply_in_pandas(spark):
    # the new Spark 4 arbitrary-state API must produce the same
    # relation as the applyInPandasWithState twin; requires a working
    # python protobuf (state serialization) — round 13: the
    # session-level fallback (session.ensure_python_protobuf, called
    # at conftest import) wires the cloud-sdk's vendored runtime in
    # this container, so this now RUNS here; it still skips on a host
    # with neither a real nor a vendored protobuf
    import pytest

    from recommendation_translation_spark.session import (
        ensure_python_protobuf,
    )

    if not ensure_python_protobuf():
        pytest.skip("no python protobuf (real or vendored) on this host")
    from recommendation_translation_spark.streaming.events_stream import (
        run_stream_to_memory,
        stream_user_stats,
        stream_user_stats_tws,
    )

    new = {
        (r.user_id, r.n_events, r.sum_value, r.max_value)
        for r in run_stream_to_memory(
            stream_user_stats_tws(spark, SF_SMALL),
            output_mode="update",
            # tws requires the RocksDB provider; the drain sets it
            # around start() and RESTORES it — the builder deliberately
            # does not mutate the shared session's provider conf
            state_store="rocksdb",
        ).collect()
    }
    old = {
        (r.user_id, r.n_events, r.sum_value, r.max_value)
        for r in run_stream_to_memory(
            stream_user_stats(spark, SF_SMALL), output_mode="update"
        ).collect()
    }
    assert new == old


def test_memory_sink_tracked_even_when_drain_raises(spark, monkeypatch):
    """run_stream_to_memory registers the memory-sink table with the
    hygiene list IMMEDIATELY after start(), not on the success path
    only (round-7 advisor): a drain that raises after start() has
    already put the table in the catalog, and an untracked one can
    never be reclaimed by drop_memory_sink_tables."""
    import pytest
    from pyspark.sql.streaming import StreamingQuery

    from recommendation_translation_spark.streaming import events_stream as es

    def boom(self, *a, **k):
        raise RuntimeError("injected drain failure")

    monkeypatch.setattr(StreamingQuery, "awaitTermination", boom)
    before = list(es._MEMORY_SINK_TABLES)
    with pytest.raises(RuntimeError, match="injected"):
        es.run_stream_to_memory(
            es.stream_tumbling_agg(spark, SF_SMALL), output_mode="complete"
        )
    added = [n for n in es._MEMORY_SINK_TABLES if n not in before]
    assert len(added) == 1, "failed drain must still be tracked"
    monkeypatch.undo()
    # let the availableNow query finish, then reclaim the sink table
    for q in spark.streams.active:
        if q.name == added[0]:
            q.awaitTermination()
    assert es.drop_memory_sink_tables(spark) >= 1
    assert added[0] not in [t.name for t in spark.catalog.listTables()]
