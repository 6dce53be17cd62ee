"""Incremental panel maintenance: merge newly arrived ticks into an
existing daily OHLCV panel without recomputing history.

The daily rollup is made *mergeable* by carrying ``first_ts``/``last_ts``
alongside open/close: two partial aggregates of the same (sid, date) —
the stored panel row and the new ticks' aggregate — combine with pure
column logic (earlier first_ts wins open, later last_ts wins close,
min/max/sum for the rest).  At 100 TB this turns daily ingestion into
a shuffle over one day of ticks plus a broadcast-scale merge of touched
keys, instead of a full-history re-aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def aggregate_ticks(events: DataFrame) -> DataFrame:
    """Tick → mergeable daily OHLCV partial (sid, date, open, close, high,
    low, volume, first_ts, last_ts).  ``events`` needs (user_id, ts_ns,
    value) as produced by sources.parquet.load_table."""
    return (events
            .withColumn("sid", F.col("user_id").cast("string"))
            .withColumn("date", F.to_date("ts"))
            .groupBy("sid", "date")
            .agg(F.min_by("value", "ts_ns").alias("open"),
                 F.max_by("value", "ts_ns").alias("close"),
                 F.max("value").alias("high"),
                 F.min("value").alias("low"),
                 F.count("*").cast("double").alias("volume"),
                 F.min("ts_ns").alias("first_ts"),
                 F.max("ts_ns").alias("last_ts")))


def merge_panels(existing: DataFrame, delta: DataFrame) -> DataFrame:
    """Combine two mergeable panel partials on (sid, date).

    Full-outer join + column-wise combiners: the open comes from whichever
    side saw the earlier first_ts, the close from the later last_ts.
    Untouched keys pass through one side unchanged.
    """
    e = existing.alias("e")
    d = delta.alias("d")
    joined = e.join(d, ["sid", "date"], "full_outer")

    def pick(col_e, col_d, cond):
        """cond chooses the e-side; either side may be absent (NULL)."""
        return (F.when(F.col(col_e).isNull(), F.col(col_d))
                .when(F.col(col_d).isNull(), F.col(col_e))
                .when(cond, F.col(col_e)).otherwise(F.col(col_d)))

    e_first = F.col("e.first_ts")
    d_first = F.col("d.first_ts")
    e_last = F.col("e.last_ts")
    d_last = F.col("d.last_ts")
    return joined.select(
        "sid", "date",
        pick("e.open", "d.open", e_first <= d_first).alias("open"),
        pick("e.close", "d.close", e_last >= d_last).alias("close"),
        F.greatest("e.high", "d.high").alias("high"),
        F.least("e.low", "d.low").alias("low"),
        (F.coalesce("e.volume", F.lit(0.0))
         + F.coalesce("d.volume", F.lit(0.0))).alias("volume"),
        F.least(e_first, d_first).alias("first_ts"),
        F.greatest(e_last, d_last).alias("last_ts"))
