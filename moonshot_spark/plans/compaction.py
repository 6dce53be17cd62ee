"""Small-files compaction: the standing ops problem of long-lived
partitioned sinks (daily appends leave thousands of KB-sized parquet
files; scans then pay a task per file).

``compaction_plan`` assigns every input file to an output bin by running
cumulative row counts through the same integer bin math as the sequence
packer (datapipe/packing.py): files ordered deterministically by name,
bin = cumulative_rows_before // target_rows — one tiny aggregate over
file names (from ``input_file_name()``, no filesystem listing API
needed), no driver-side loop over files.

``compact_parquet`` executes a plan-equivalent rewrite: one read of the
source, ``repartition(ceil(total/target))`` (round-robin — balanced
output sizes), one write.  At 100 TB this is the periodic maintenance
job; the read is the only full pass and it is embarrassingly parallel."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = ["compaction_plan", "compact_parquet"]


def compaction_plan(spark: SparkSession, path: str,
                    target_rows: int) -> DataFrame:
    """One row per input file: (file, n_rows, bin).  Files are walked in
    name order; a file opens a new bin when the running total before it
    crosses a multiple of ``target_rows`` (greedy next-fit — the same
    math as the token packer, so bins overfill by at most one file)."""
    df = spark.read.parquet(path)
    per_file = (df.select(F.input_file_name().alias("file"))
                .groupBy("file").agg(F.count("*").alias("n_rows")))
    w = (Window.orderBy("file")
         .rowsBetween(Window.unboundedPreceding, -1))
    cum_before = F.coalesce(F.sum("n_rows").over(w), F.lit(0))
    return per_file.select(
        "file", "n_rows",
        F.floor(cum_before / target_rows).cast("int").alias("bin"))


def compact_parquet(spark: SparkSession, src: str, dst: str,
                    target_rows: int) -> int:
    """Rewrite ``src`` into ``dst`` with ~``target_rows`` rows per file.
    Returns the number of output files requested.  Round-robin
    repartition balances file sizes regardless of input skew; callers
    that need an ordered layout should use plans/zorder.py instead."""
    df = spark.read.parquet(src)
    total = df.count()
    n_files = max(1, math.ceil(total / target_rows))
    df.repartition(n_files).write.mode("overwrite").parquet(dst)
    return n_files
