"""Round-11 verdict #1/#7: the sf1 fence's storm-deferral and
artifact-guard decision logic, pinned with FAKED probes (pure Python,
no Spark session) — a storm run must produce a deferred marker, never
a committed violation row, and a violating run must never silently
replace a clean committed fence artifact."""

from recommendation_translation_spark.bench_common import (
    ANCHOR_PROBE,
    STORM_PROBE_FACTOR,
    fence_row_outcome,
    fence_write_decision,
    host_is_stormy,
)


def _probe(factor: float) -> dict[str, float]:
    return {k: v * factor for k, v in ANCHOR_PROBE.items()}


def test_host_is_stormy_uses_unclamped_ratio():
    # the normalization clamp saturates at 1.5; the storm detector must
    # see the full excursion (a 4x steal reads 4x, not 1.5x)
    assert host_is_stormy(_probe(4.0))
    assert host_is_stormy(_probe(STORM_PROBE_FACTOR + 0.01))
    assert not host_is_stormy(_probe(STORM_PROBE_FACTOR - 0.01))
    assert not host_is_stormy(_probe(1.0))
    assert not host_is_stormy(_probe(0.7))


def test_host_is_stormy_degrades_to_false_on_bad_probe():
    # a FAILED probe must never block a measurement — only a MEASURED
    # storm may defer a row
    assert not host_is_stormy(None)
    assert not host_is_stormy({})
    assert not host_is_stormy({"md5_2m_sec": "nan-ish"})
    assert not host_is_stormy({"md5_2m_sec": -1.0, "regex_200k_sec": -1.0})
    assert not host_is_stormy(_probe(9.9), anchor={})


def test_fence_row_outcome_storm_never_records_a_violation():
    ref = 10.0
    # within guard: ok regardless of weather
    assert fence_row_outcome(19.9, ref, stormy=False) == "ok"
    assert fence_row_outcome(19.9, ref, stormy=True) == "ok"
    # over guard: violation only on a quiet host
    assert fence_row_outcome(20.1, ref, stormy=False) == "violation"
    assert fence_row_outcome(20.1, ref, stormy=True) == "deferred"
    assert fence_row_outcome(80.0, ref, stormy=True) == "deferred"
    # a failed measurement is code, not weather — always a violation
    assert fence_row_outcome(-1.0, ref, stormy=True) == "violation"
    assert fence_row_outcome(-1.0, ref, stormy=False) == "violation"


def test_write_decision_refuses_to_overwrite_clean_artifact():
    violating = {"violations_2x": ["part_pagerank"], "panel": "active"}
    clean_committed = {"violations_2x": [], "panel": "active"}
    fname, reason = fence_write_decision(violating, clean_committed)
    assert fname == "BENCH_sf1_VIOLATING.json"
    assert reason and "part_pagerank" in reason


def test_write_decision_allows_clean_and_forced_and_unguarded_writes():
    clean_run = {"violations_2x": [], "panel": "active"}
    violating = {"violations_2x": ["x"], "panel": "active"}
    clean_committed = {"violations_2x": []}
    dirty_committed = {"violations_2x": ["y"]}
    # clean run always writes the real artifact
    assert fence_write_decision(clean_run, clean_committed) == (
        "BENCH_sf1.json", None)
    assert fence_write_decision(clean_run, None) == ("BENCH_sf1.json", None)
    # violating over violating: no clean state destroyed
    assert fence_write_decision(violating, dirty_committed) == (
        "BENCH_sf1.json", None)
    # no committed artifact at all: nothing to protect
    assert fence_write_decision(violating, None) == ("BENCH_sf1.json", None)
    # explicit human triage decision overrides
    assert fence_write_decision(violating, clean_committed, force=True) == (
        "BENCH_sf1.json", None)


def test_gumbel_noise_matches_reference_formula(spark):
    # the resample op's Gumbel noise must be exactly the documented
    # pure function of doc_id — pin the Spark expression against a
    # stdlib reference so a refactor cannot silently change the draw
    # (the DuckDB oracle replays the same formula)
    import hashlib
    import math

    from pyspark.sql import functions as F

    from recommendation_translation_spark.operators.text import (
        cross_engine_hash,
    )

    ids = [0, 1, 7, 123456789, 2**40]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    u = (
        cross_engine_hash(F.col("doc_id").cast("string"), seed="gumbel")
        + F.lit(0.5)
    ) / F.lit(float(2**32))
    got = {
        r["doc_id"]: r["g"]
        for r in df.select(
            "doc_id", F.round(-F.log(-F.log(u)), 6).alias("g")
        ).collect()
    }
    for i in ids:
        h = int(hashlib.md5(f"gumbel:{i}".encode()).hexdigest()[:8], 16)
        uu = (h + 0.5) / 2**32
        assert got[i] == round(-math.log(-math.log(uu)), 6), i
