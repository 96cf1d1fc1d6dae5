#!/usr/bin/env python
"""Per-round sf1 regression fence (round-6 verdict #4): the 34-query
expensive panel, promoted from a one-shot curve (SCALE.md round 6) to a
repeatable sidecar with the quiet-host best-of protocol and a 2x guard.

Protocol:
- data: ``tools_gen_scale_data.py`` tiles /root/testdata/sf0.1 to sf1
  (run it first; default location /tmp/scaledata/sf1);
- one timed run per query in sorted order after the same shape warmup
  bench.py uses; any query measuring > 1.5x its reference (or > 2x,
  the guard bound) is re-run once and the min recorded — co-tenant CPU
  bursts don't fail the fence, real regressions reproduce;
- load context (round-8 verdict #6): ``os.getloadavg()`` is recorded
  beside every measurement (the 1-min average at measurement START),
  so a future reader can adjudicate contention from the artifact alone
  — the round-8 closing run violated 2 anchors 4.3x while executing
  concurrently with the driver's own bench, and nothing in the JSON
  showed it.  A still-violating query after the first re-measure gets
  ONE more attempt after a 10 s backoff (a co-tenant burst outlasting
  one immediate retry usually doesn't outlast the backoff too);
- reference: ``BENCH_SF1_BASELINE.json`` (seeded from the round-6
  SCALE.md curve, post-ANN-panel-fix values; overwritten only
  deliberately).  A query > 2x its reference is a FENCE VIOLATION,
  listed in the output JSON and on stderr;
- output: ``BENCH_sf1.json`` at the repo root — commit it per round
  (the driver's own bench stays sf0.1).

Panel policy (round-10, SCALE.md "sf1 fence panel policy"): the
default run covers the ACTIVE panel (``queries`` in the baseline
file); rows that measured <= 1.0x their anchor in 3 consecutive
committed fence runs live under ``retired`` and run only in the
quarterly FULL fence — ``--full`` merges them back in (every 4th
round; a retired row violating 2x there is reinstated).

Usage: python tools_bench_sf1.py [--full] [sf1_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--full"]
    full = "--full" in sys.argv[1:]
    sf_dir = args[0] if args else "/tmp/scaledata/sf1"
    if not os.path.isdir(sf_dir):
        print(f"missing {sf_dir}: run tools_gen_scale_data.py first",
              file=sys.stderr)
        return 1
    with open(os.path.join(REPO, "BENCH_SF1_BASELINE.json")) as fh:
        _b = json.load(fh)
    baseline = dict(_b["queries"])
    if full:
        baseline.update(_b.get("retired", {}))

    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from recommendation_translation_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark(app_name="bench_sf1")
    # the SHARED bench warmup (bench_common, round-11): identical
    # context is required for the probe to be comparable — this tool's
    # old lighter warmup left CPU clocks low and the probe read ~1.3×
    # slower than bench.py's on the same machine, silently loosening
    # every normalized threshold
    from recommendation_translation_spark.bench_common import warmup

    warmup(spark, sf_dir)

    # same deterministic host probe bench.py records, from the SHARED
    # helper (round-10 ADVICE #3: the block was copy-pasted between the
    # two harnesses).  Since round-11 (verdict #3) the probe also FEEDS
    # the fence: thresholds are scaled by the clamped probe factor vs
    # the anchor class recorded in BENCH_SF1_BASELINE.json, so a host
    # step inflates neither the re-measure count nor the violation list
    # — both raw and normalized ratios land in the sidecar.
    from recommendation_translation_spark.bench_common import (
        host_probe as _host_probe,
        probe_factor,
    )

    host_probe = _host_probe(spark)
    anchor_factor = probe_factor(host_probe, _b.get("anchor_probe"))

    qmap = entry_mod.queries()
    timings: dict[str, float] = {}
    loadavg: dict[str, float] = {}
    violations: list[str] = []
    raw_violations: list[str] = []
    reruns: list[str] = []
    rerun_failures: dict[str, int] = {}
    # Same ordering rule as bench.py: ml_train_rmse runs BEFORE the
    # other ml_* rows so the shared one-time training cost lands on the
    # training row — in plain sorted order ml_als_recs/ml_cv_tuning
    # would pay it and ml_train_rmse would measure fully warm,
    # hiding a training-cost regression from the fence.
    names = sorted(baseline)
    ml = [n for n in names if n.startswith("ml_")]
    if "ml_train_rmse" in ml and ml[0] != "ml_train_rmse":
        names.remove("ml_train_rmse")
        names.insert(names.index(ml[0]), "ml_train_rmse")
    for name in names:
        if name not in qmap:
            print(f"# panel query {name} missing from catalog", file=sys.stderr)
            timings[name] = -1.0
            violations.append(name)
            raw_violations.append(name)
            continue
        fn = qmap[name]
        # same cache hygiene as bench.py: drop the previous query's
        # dead cached frames and memory-sink tables before timing the
        # next one
        spark.catalog.clearCache()
        from recommendation_translation_spark.streaming.events_stream import (
            drop_memory_sink_tables,
        )

        drop_memory_sink_tables(spark)
        # clearCache does NOT free localCheckpoint RDD blocks — those
        # are released by the ContextCleaner only after the JVM GCs the
        # RDD objects, which in a long single session lags tens of
        # queries behind.  At sf1 the accumulated blocks are large
        # enough to squeeze the iterative rows (part_pagerank measured
        # 27 s in a fresh session vs 59 s as fence row 26-of-30, min of
        # three attempts — same code, load 15).  Nudge both collectors
        # so each row starts from a clean block store.
        import gc

        gc.collect()
        try:
            spark.sparkContext._jvm.System.gc()  # noqa: SLF001
        except Exception:
            pass  # py4j surface changed — hygiene only, never fail the fence
        loadavg[name] = round(os.getloadavg()[0], 2)
        t0 = time.perf_counter()
        try:
            n = fn(spark, sf_dir).count()
        except Exception as exc:
            timings[name] = -1.0
            violations.append(name)
            raw_violations.append(name)
            msg = " ".join(str(exc).split())[:200]
            print(f"# FAILED {name}: {msg}", file=sys.stderr)
            continue
        t = round(time.perf_counter() - t0, 2)
        # probe-normalized threshold (round-11 verdict #3): the anchor
        # was recorded on the anchor host class; scale it by the
        # clamped factor so the 1.5x trigger and the 2x guard judge the
        # plan, not the machine
        ref = baseline[name] * anchor_factor
        # ml_train_rmse's cost is a Python-side model memo: a re-run is
        # warm through a mechanism clearCache cannot reach, so min()
        # would mask a training-cost regression (same NEVER_REMEASURE
        # rule as bench.py)
        if t > 1.5 * ref and name != "ml_train_rmse":
            # first re-measure immediately; if STILL over the 2x guard,
            # one more after a 10 s backoff (round-8 verdict #6: the
            # contended closing run's burst outlasted the immediate
            # retry — best-of-2 back-to-back samples the same burst).
            # Each re-run records its own start loadavg (min wins).
            # Per-attempt outcomes are recorded (round-9 ADVICE #4):
            # "remeasured" lists only queries with ≥1 SUCCESSFUL
            # re-run; an attempt that raises lands in
            # "remeasure_failed" instead, so the artifact never claims
            # a hardened measurement it didn't get.
            ok_reruns = 0
            failed_reruns = 0
            for backoff in (0.0, 10.0):
                if t <= 2.0 * ref and backoff:
                    break
                time.sleep(backoff)
                # clear again so the re-run measures under the same cold
                # protocol as every first run — otherwise re-measured
                # rows record warm-cache minimums and the 2x guard is
                # systematically looser for exactly the flagged queries
                # (memory-sink tables included — round-7 advisor)
                spark.catalog.clearCache()
                drop_memory_sink_tables(spark)
                la = round(os.getloadavg()[0], 2)
                t1 = time.perf_counter()
                try:
                    fn(spark, sf_dir).count()
                    t2 = round(time.perf_counter() - t1, 2)
                except Exception:
                    failed_reruns += 1
                    continue
                ok_reruns += 1
                if t2 < t:
                    t = t2
                    loadavg[name] = la
            if ok_reruns:
                reruns.append(name)
            if failed_reruns:
                rerun_failures[name] = failed_reruns
        timings[name] = t
        status = "VIOLATION" if t > 2.0 * ref else "ok"
        if status == "VIOLATION":
            violations.append(name)
        if t > 2.0 * baseline[name]:
            raw_violations.append(name)
        print(f"# {name}: {t}s (ref {ref}s = anchor {baseline[name]} x "
              f"{anchor_factor}, rows={n}, load {loadavg[name]}) "
              f"{status}", file=sys.stderr)
    out = {
        "sf": 1.0,
        "schema_version": 3,
        "panel": "full" if full else "active",
        "sum_query_sec": round(sum(v for v in timings.values() if v > 0), 2),
        "queries": timings,
        "loadavg_1min": loadavg,
        "host_probe": host_probe,
        "anchor_probe_factor": anchor_factor,
        "remeasured": sorted(reruns),
        "remeasure_failed": rerun_failures,
        "violations_2x": sorted(violations),
        "violations_2x_raw": sorted(raw_violations),
    }
    with open(os.path.join(REPO, "BENCH_sf1.json"), "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(json.dumps(out, separators=(",", ":")))
    return 0 if not violations else 2


if __name__ == "__main__":
    sys.exit(main())
