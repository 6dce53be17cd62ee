"""Bucketized interval (range-containment) join.

Spark has no native interval join: ``points JOIN intervals ON ts BETWEEN
start AND end`` plans as a broadcast-nested-loop or a sort-merge with a
residual range predicate — both degrade to per-key cross products at
scale.  The standard fix (used by every time-series/geo engine) is to
discretize time into fixed-width buckets: an interval is replicated to
each bucket it spans, a point belongs to exactly ONE bucket, and the
join becomes an equi-join on (keys..., bucket) with a cheap residual
``BETWEEN`` filter.  Equi-joins hash-partition, broadcast, and AQE-skew
-split like any other join — the quadratic blowup is gone.

Correctness: since a point lives in exactly one bucket and an interval
appears at most once per bucket, each (point, interval) match is emitted
exactly once — no post-join dedup needed.

Scale guard: an interval spanning the whole timeline would replicate
into every bucket (the same unbounded-edge failure mode as an LSH mega
-bucket).  ``max_buckets_per_interval`` caps the replication; intervals
over the cap are truncated with a driver-side warning (or raise with
``on_oversized="error"``) — never silently.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HOUR_NS = 3_600 * 1_000_000_000


def interval_join(points: DataFrame, intervals: DataFrame,
                  on: list[str], point_ts: str = "ts_ns",
                  start_col: str = "start_ns", end_col: str = "end_ns",
                  bucket_width: int = HOUR_NS,
                  max_buckets_per_interval: int = 10_000,
                  on_oversized: str = "warn") -> DataFrame:
    """Rows of ``points`` matched to every interval (same ``on`` keys)
    with ``start_col <= point_ts <= end_col``.  All three time columns
    are integer epochs in the same unit (exact arithmetic)."""
    b_start = F.floor(F.col(start_col) / bucket_width).cast("bigint")
    b_end = F.floor(F.col(end_col) / bucket_width).cast("bigint")
    capped_end = F.least(b_end, b_start + (max_buckets_per_interval - 1))

    if on_oversized in ("warn", "error"):
        n_over = (intervals
                  .where(b_end - b_start + 1 > max_buckets_per_interval)
                  .count())
        if n_over:
            msg = (f"interval_join: {n_over} interval(s) span more than "
                   f"{max_buckets_per_interval} buckets of {bucket_width}; "
                   f"matches beyond the cap are dropped")
            if on_oversized == "error":
                raise ValueError(msg)
            warnings.warn(msg)

    iv = intervals.withColumn(
        "__bucket", F.explode(F.sequence(b_start, capped_end)))
    pts = points.withColumn(
        "__bucket", F.floor(F.col(point_ts) / bucket_width).cast("bigint"))
    return (pts.join(iv, on + ["__bucket"])
            .where(F.col(point_ts).between(F.col(start_col),
                                           F.col(end_col)))
            .drop("__bucket"))
