"""get_prices — the S1 source surface (reference base.py:1183-1282).

The reference's ``get_prices`` passes sids/universes/date-range/time/field
filters to the history service so filtering happens server-side
(base.py:1238-1251).  Spark-native: every filter is a ``where``/``select``
on the parquet scan — Catalyst pushes them into the reader (partition
pruning + row-group skipping), which at 100 TB IS the server-side filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from moonshot_spark.strategies.base import MoonshotParameterError


def get_prices(spark: SparkSession, path: str,
               sids: list[str] | None = None,
               exclude_sids: list[str] | None = None,
               start_date: str | None = None,
               end_date: str | None = None,
               times: list[str] | None = None,
               fields: list[str] | None = None) -> DataFrame:
    """Load the price panel with source-level filters (S1).

    ``fields`` selects panel columns (projection pruning); the other
    arguments become pushed-down predicates.
    """
    df = spark.read.parquet(path)
    if sids:
        df = df.where(F.col("sid").isin(sids))
    if exclude_sids:
        df = df.where(~F.col("sid").isin(exclude_sids))
    if start_date:
        df = df.where(F.col("date") >= F.lit(start_date).cast("date"))
    if end_date:
        df = df.where(F.col("date") <= F.lit(end_date).cast("date"))
    if times and "time" in df.columns:
        df = df.where(F.col("time").isin(times))
    if fields:
        keys = [c for c in ("sid", "date", "time") if c in df.columns]
        missing = set(fields) - set(df.columns)
        if missing:
            raise MoonshotParameterError(
                f"fields not in panel: {sorted(missing)}")
        df = df.select(*keys, *fields)
    return df


def validate_timezones(master: DataFrame) -> str:
    """All securities must share one timezone (reference base.py:1116-1125:
    mixed-timezone panels are ambiguous for signal dates)."""
    tzs = [r["timezone"] for r in
           master.select("timezone").distinct().collect() if r["timezone"]]
    if len(tzs) > 1:
        raise MoonshotParameterError(
            "cannot infer timezone because multiple timezones are present "
            "in data, please specify TIMEZONE explicitly (timezones: {0})"
            .format(", ".join(sorted(tzs))))
    return tzs[0] if tzs else "UTC"
