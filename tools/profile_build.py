#!/usr/bin/env python
"""Per-query build/execute split profiler.

``build`` = wall time to construct the DataFrame (pure driver work:
Py4J round-trips, analysis, schema inference).  ``execute`` = wall time
for ``count()`` on the freshly built plan (scheduling + execution).
The split is the diagnostic for plan-construction overhead: build time
is a fixed, data-independent driver cost that dominates small-SF
benches and interactive latency (VERDICT r9 item 1).

Usage: python tools/profile_build.py [query ...]   (default: all)
Writes tools' stdout as a sorted-by-build table; bench.py embeds the
same split in BENCH_DETAIL.json.
"""
from __future__ import annotations

import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main(argv):
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from moonshot_spark.queries import QUERIES
    from moonshot_spark.session import get_spark

    spark = get_spark("moonshot_spark_profile")
    names = argv or list(QUERIES)
    rows = []
    for name in names:
        fn = QUERIES[name]
        fn(spark, sf_dir).count()  # warm up JIT / IO caches
        best_b, best_e = float("inf"), float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.count()
            t2 = time.perf_counter()
            best_b = min(best_b, t1 - t0)
            best_e = min(best_e, t2 - t1)
        rows.append((name, best_b, best_e))
        print(f"{name:45s} build={best_b:7.3f}s exec={best_e:7.3f}s",
              flush=True)
    rows.sort(key=lambda r: -r[1])
    print("\n== sorted by build time ==")
    for name, b, e in rows[:20]:
        print(f"{name:45s} build={b:7.3f}s exec={e:7.3f}s")
    print(f"\nTOTAL build={sum(r[1] for r in rows):.2f}s "
          f"exec={sum(r[2] for r in rows):.2f}s over {len(rows)} queries")


if __name__ == "__main__":
    main(sys.argv[1:])
