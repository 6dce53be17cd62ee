#!/usr/bin/env python
"""Benchmark: run the headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) and print ONE JSON line with per-query wall-clock seconds.

Each query is executed once to warm the JVM/IO caches and twice timed
(min of two runs); the timed run does a ``count()`` action so the full
plan executes without driver materialization of results.

Output contract: the FINAL stdout line is a single JSON object kept
under ~1900 bytes (the harness captures only a 2000-char tail of
stdout, so an oversized line is unparseable — this bit rounds 3-5).
The ``queries`` dict therefore holds the slowest N queries that fit the
byte budget; the complete per-query timing map is written to
``BENCH_DETAIL.json`` next to this script and referenced via ``detail``.
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

# zero the pinned heap at JVM start (see session.py -Xms note): keeps
# first-touch page zeroing out of the timed windows — the r12 in-run
# drift was G1 heap commit/uncommit churn showing up as kernel-time
# stalls inside query timings
os.environ.setdefault("SPARK_GRAFT_PRETOUCH", "1")

# Keep the printed line comfortably inside the harness's 2000-char
# stdout tail, with headroom for the fixed fields.
MAX_LINE_BYTES = 1900

# Noise canary (VERDICT r10 item 4): a constant-work calibration query is
# timed FIRST and LAST; a contended box shows up as the two disagreeing
# or blowing past the pinned clean-box envelope, making a driver-side
# environmental artifact (like r10's 251.9 s vs 139.97 s committed run,
# same code) self-diagnosing instead of looking like a code regression.
# Envelope: ~2.5x the clean-box min-of-2 measurement of 0.15-0.19 s
# (see PERF.md r11).
CANARY_RATIO_LIMIT = 1.5
CANARY_ENVELOPE_SEC = 0.45

# Contended-box outlier re-measure (VERDICT r14 item 1 — judge-requested,
# additions-only): a query whose first-pass time exceeds FACTOR x its
# committed BENCH_DETAIL history (same core count) AND history +
# MIN_EXCESS seconds gets ONE extra pass of the IDENTICAL min-of-2
# fresh-plan measurement, keeping the minimum.  This does not change the
# timing methodology — it takes the min over more samples for queries a
# transient box-contention spike inflated (r14: both driver runs were
# canary-flagged; 28 "regressions" on untouched code paths).  Both
# values are recorded per query in BENCH_DETAIL ("remeasured"), and the
# printed line carries the count.  Bounded: at most REMEASURE_CAP
# queries, worst offenders first.
REMEASURE_FACTOR = 2.0
REMEASURE_MIN_EXCESS = 0.3
REMEASURE_CAP = 40

# In-run drift instrumentation (VERDICT r12 item 5): the endpoints-only
# canary certifies box health but cannot see MONOTONE accumulation
# inside the run (r12: late-table queries measured 0.2-0.8 s higher
# in-run than solo on identical code).  Sample the same constant-work
# canary every N queries so the BENCH_DETAIL curve shows whether the
# session itself slows down (JVM code cache / GC / catalog growth) or
# the late queries are just scheduled into a degraded tail.
CANARY_SAMPLE_EVERY = 40

# A/B hygiene knob for drift experiments (default: off — the driver's
# contract run is unchanged): SPARK_GRAFT_BENCH_HYGIENE=
#   clearcache  -> spark.catalog.clearCache() + clean leftover persisted
#                  RDD blocks every CANARY_SAMPLE_EVERY queries
#   recycle     -> stop and rebuild the SparkSession (fresh JVM-side
#                  catalog/codegen state; same process) at each sample
_HYGIENE = os.environ.get("SPARK_GRAFT_BENCH_HYGIENE", "").lower()


def _canary_seconds(spark) -> float:
    """One fixed shuffle+agg over spark.range: data-independent work that
    exercises scheduling, shuffle, and codegen — the same fixed costs the
    per-query floor is made of.  Min of two runs (like the queries)."""
    from pyspark.sql import functions as F

    def run() -> float:
        start = time.perf_counter()
        (spark.range(0, 20_000_000, 1, 32)
         .groupBy((F.col("id") % 1024).alias("k"))
         .agg(F.sum("id").alias("s"))
         .select(F.sum("s")).count())
        return time.perf_counter() - start

    run()                                    # warm-up, untimed
    return min(run(), run())


def _compact_payload(total: float, n_queries: int, timings: dict, sf: float) -> dict:
    """Build the printed payload: fixed fields + as many of the slowest
    queries as fit in MAX_LINE_BYTES (slowest-first: they carry the
    performance signal; sub-100 ms queries are in BENCH_DETAIL.json)."""
    base = {
        "metric": "total_query_time",
        "value": round(total, 4),
        "unit": "sec",
        "queries": {},
        "n_queries": n_queries,
        "sf": sf,
        "detail": "BENCH_DETAIL.json",
    }
    by_cost = sorted(timings.items(), key=lambda kv: -kv[1])
    for name, secs in by_cost:
        base["queries"][name] = secs
        if len(json.dumps(base)) > MAX_LINE_BYTES:
            del base["queries"][name]
            break
    return base


def main():
    # `bench.py --scale N[,M,...]`: the replicated scale-up mode — builds
    # N×-key-shifted copies of the driver tables and checks that the
    # heaviest queries keep their plan shape and throughput (SCALE.md).
    # The no-argument form (the driver's contract) is unchanged.
    if len(sys.argv) > 1 and sys.argv[1] in ("--scale", "--scales"):
        from tools.scale_bench import main as scale_main
        scales = sys.argv[2] if len(sys.argv) > 2 else "1,10,50"
        raise SystemExit(scale_main(["--scales", scales] + sys.argv[3:]))

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from moonshot_spark.queries import QUERIES
    from moonshot_spark.session import get_spark

    spark = get_spark("moonshot_spark_bench")

    sf = 0.1
    base = os.path.basename(sf_dir.rstrip("/"))
    if base.startswith("sf"):
        try:
            sf = float(base[2:])
        except ValueError:
            pass

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    # committed per-query history for the outlier re-measure pass; only
    # comparable at the SAME core count (the driver also runs an 8-core
    # control, whose times are legitimately higher)
    hist: dict[str, float] = {}
    try:
        with open(os.path.join(HERE, "BENCH_DETAIL.json")) as f:
            _prev = json.load(f)
        if str(_prev.get("cpus")) == str(cpus) and _prev.get("sf") == sf:
            hist = {k: float(v) for k, v in _prev.get("queries", {}).items()}
    except Exception:
        hist = {}

    canary_first = round(_canary_seconds(spark), 4)

    def _hygiene(spark):
        """Apply the A/B hygiene arm between query groups (no-op by
        default).  Returns the (possibly new) session."""
        if _HYGIENE == "clearcache":
            spark.catalog.clearCache()
            try:
                for jrdd in list(
                        spark.sparkContext._jsc.getPersistentRDDs()
                        .values()):
                    jrdd.unpersist(False)
            except Exception:
                pass
        elif _HYGIENE == "recycle":
            spark.stop()
            spark = get_spark("moonshot_spark_bench")
        return spark

    timings: dict[str, float] = {}
    split: dict[str, dict[str, float]] = {}
    canary_samples: list[dict] = []
    total = 0.0
    n_done = 0
    for name, fn in QUERIES.items():
        if n_done and n_done % CANARY_SAMPLE_EVERY == 0:
            spark = _hygiene(spark)
            canary_samples.append(
                {"after": n_done, "sec": round(_canary_seconds(spark), 4)})
        fn(spark, sf_dir).count()  # warm-up: JIT, parquet footers, broadcasts
        # min of two timed runs, each on a FRESHLY constructed DataFrame:
        # re-count()ing the same DataFrame object lets Spark skip already-
        # computed shuffle map stages (MapOutputTracker reuse), which
        # under-measures shuffle-heavy queries by ~2x (PERF.md r9).  A
        # fresh plan per run times the real end-to-end execution
        # (planning included), matching how the DuckDB baseline is timed.
        # build = DataFrame construction (driver-only Py4J/analysis work,
        # plus any bounded validation actions a builder runs eagerly);
        # exec = count() on the fresh plan.  The split diagnoses fixed
        # driver overhead vs data-dependent execution (VERDICT r9 item 1).
        elapsed = float("inf")
        best_build = best_exec = float("inf")
        for _ in range(2):
            start = time.perf_counter()
            df = fn(spark, sf_dir)
            mid = time.perf_counter()
            df.count()
            end = time.perf_counter()
            if end - start < elapsed:
                elapsed = end - start
                best_build, best_exec = mid - start, end - mid
        timings[name] = round(elapsed, 4)
        split[name] = {"build": round(best_build, 4),
                       "exec": round(best_exec, 4)}
        total += elapsed
        n_done += 1

    # Outlier re-measure pass (see REMEASURE_* above): identical
    # measurement, one more time, for queries a contention spike
    # plausibly inflated; keep the min, record both.
    remeasured: dict[str, dict[str, float]] = {}
    if hist:
        flagged = [
            (name, timings[name] - hist[name])
            for name in timings
            if name in hist
            and timings[name] > REMEASURE_FACTOR * hist[name]
            and timings[name] > hist[name] + REMEASURE_MIN_EXCESS]
        flagged.sort(key=lambda kv: -kv[1])
        for name, _excess in flagged[:REMEASURE_CAP]:
            fn = QUERIES[name]
            fn(spark, sf_dir).count()          # same warm-up discipline
            second = float("inf")
            b2 = e2 = float("inf")
            for _ in range(2):
                start = time.perf_counter()
                df = fn(spark, sf_dir)
                mid = time.perf_counter()
                df.count()
                end = time.perf_counter()
                if end - start < second:
                    second = end - start
                    b2, e2 = mid - start, end - mid
            second = round(second, 4)
            remeasured[name] = {"first_pass": timings[name],
                                "second_pass": second,
                                "history": hist[name]}
            if second < timings[name]:
                total -= timings[name] - second
                timings[name] = second
                split[name] = {"build": round(b2, 4), "exec": round(e2, 4)}

    canary_last = round(_canary_seconds(spark), 4)
    # the LAST canary is expected to be a bit faster (deeper JIT after
    # the full suite); only a SLOWDOWN across the run (contention grew)
    # or an envelope breach (contended from the start) marks the box
    ratio = canary_last / max(canary_first, 1e-9)
    noisy = (ratio > CANARY_RATIO_LIMIT
             or max(canary_first, canary_last) > CANARY_ENVELOPE_SEC)
    canary = {
        "first_sec": canary_first,
        "last_sec": canary_last,
        "ratio": round(ratio, 3),
        "envelope_sec": CANARY_ENVELOPE_SEC,
        "noisy_box": noisy,
        "samples": canary_samples,
        "hygiene": _HYGIENE or "none",
    }

    with open(os.path.join(HERE, "BENCH_DETAIL.json"), "w") as f:
        json.dump(
            {
                "metric": "total_query_time",
                "value": round(total, 4),
                "unit": "sec",
                "queries": timings,
                "build_exec_split": split,
                "canary": canary,
                "remeasured": remeasured,
                "cpus": cpus,
                "sf": sf,
            },
            f,
            indent=1,
        )

    payload = _compact_payload(total, len(timings), timings, sf)
    if remeasured:
        payload["remeasured"] = len(remeasured)
    if noisy:
        # keep the flag in the harness-visible line too: a flagged run's
        # timings reflect the box, not the code
        payload["noisy_box"] = True
    line = json.dumps(payload)
    assert len(line) <= 2000, f"bench line too long: {len(line)}"
    print(line)


if __name__ == "__main__":
    main()
