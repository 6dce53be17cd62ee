"""Bucketed panel storage for shuffle-free per-sid operations (SURVEY §4).

The backtest's dominant shuffle key is ``sid``.  Persisting the panel as a
bucketed table (`bucketBy(n, "sid")`, sorted by date) lets every subsequent
per-sid window stage and sid-keyed join read pre-partitioned data — the
Exchange disappears from the plan.  At 100 TB this converts the per-run
sid shuffle into a one-time write-side cost shared by all downstream jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_panel(panel: DataFrame, table_name: str,
                         num_buckets: int = 32) -> None:
    """Persist the panel bucketed by sid, sorted by (sid, date) within
    buckets, as a saved table (bucket metadata requires the catalog)."""
    (panel.write
     .bucketBy(num_buckets, "sid")
     .sortBy("sid", "date")
     .mode("overwrite")
     .format("parquet")
     .saveAsTable(table_name))


def read_bucketed_panel(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)
