"""Periodic rebalancing (SURVEY §2.5 W10 — REBALANCE_INTERVAL convention).

Reference: base.py:95-97,1068-1084 — strategies that rebalance monthly or
quarterly compute weights at period boundaries and hold them constant in
between.  Spark form: pick the weight at each period's first observation,
null elsewhere, then forward-fill per sid.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_TRUNC_FMT = {"M": "month", "Q": "quarter", "W": "week", "Y": "year"}


def period_start_expr(date_col: str, interval: str) -> Column:
    try:
        fmt = _TRUNC_FMT[interval.upper()[0]]
    except KeyError:
        raise ValueError(f"unsupported rebalance interval: {interval!r}")
    return F.trunc(F.col(date_col), fmt)


def rebalance_weights(df: DataFrame, interval: str,
                      weight_col: str = "weight",
                      out_col: str | None = None,
                      date_col: str = "date") -> DataFrame:
    """Hold weights constant within each rebalance period: the weight from
    each (sid, period)'s first row applies to the whole period."""
    out_col = out_col or weight_col
    period = period_start_expr(date_col, interval)
    w_period = Window.partitionBy("sid", period).orderBy(date_col)
    first_in_period = F.row_number().over(w_period) == 1
    picked = F.when(first_in_period, F.col(weight_col))
    w_sid = Window.partitionBy("sid").orderBy(date_col) \
        .rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn(
        out_col, F.last(picked, ignorenulls=True).over(w_sid))
