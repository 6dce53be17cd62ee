#!/usr/bin/env python
"""Benchmark: run the headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) and print ONE JSON line with per-query wall-clock seconds.

Each query is executed once to warm the JVM/IO caches and once timed;
the timed run does a count-style action (collect row count via
``df.write.format("noop")``-free ``count()`` on a cached-free plan) so the
full plan executes without driver materialization of results.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
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

    timings: dict[str, float] = {}
    total = 0.0
    for name, fn in QUERIES.items():
        df = fn(spark, sf_dir)
        df.count()  # warm-up: JIT, parquet footer cache, broadcast build
        # min of two timed runs: the steady-state cost of the plan, robust
        # to one-off GC pauses / CPU contention on a shared box
        elapsed = float("inf")
        for _ in range(2):
            start = time.perf_counter()
            df.count()
            elapsed = min(elapsed, time.perf_counter() - start)
        timings[name] = round(elapsed, 4)
        total += elapsed

    print(json.dumps({
        "metric": "total_query_time",
        "value": round(total, 4),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
