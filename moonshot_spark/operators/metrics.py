"""Backtest performance metrics (the reference ecosystem's moonchart
analog): cumulative return, drawdown, Sharpe, CAGR over the results
``Return`` field.

All metrics are per-sid (or per-strategy after aggregating returns) window/
aggregate expressions: cumulative compounding via running log-sums,
drawdown via running max — exact, order-deterministic operations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_cum_return(df: DataFrame, return_col: str = "return",
                    out_col: str = "cum_return") -> DataFrame:
    """Compounded cumulative return per sid: Π(1+r) − 1 via running
    Σlog(1+r) (valid while r > −1, which percentage returns satisfy)."""
    w = (Window.partitionBy("sid").orderBy("date")
         .rowsBetween(Window.unboundedPreceding, 0))
    log_growth = F.log1p(F.coalesce(F.col(return_col), F.lit(0.0)))
    return df.withColumn(out_col, F.expm1(F.sum(log_growth).over(w)))


def with_drawdown(df: DataFrame, cum_col: str = "cum_return",
                  out_col: str = "drawdown") -> DataFrame:
    """Drawdown from the running peak of the cumulative-return curve."""
    w = (Window.partitionBy("sid").orderBy("date")
         .rowsBetween(Window.unboundedPreceding, 0))
    peak = F.max(F.col(cum_col)).over(w)
    return df.withColumn(
        out_col, (1 + F.col(cum_col)) / (1 + peak) - 1)


def summary_metrics(df: DataFrame, return_col: str = "return",
                    periods_per_year: int = 252) -> DataFrame:
    """Per-sid summary: total compounded return, annualized Sharpe, CAGR,
    max drawdown, observation count."""
    curve = with_drawdown(with_cum_return(df, return_col))
    r = F.coalesce(F.col(return_col), F.lit(0.0))
    agg = (curve.groupBy("sid").agg(
        F.count("*").alias("n_periods"),
        F.max_by("cum_return", "date").alias("total_return"),
        F.avg(r).alias("__mean"),
        F.stddev_samp(r).alias("__std"),
        F.min("drawdown").alias("max_drawdown")))
    ann = float(periods_per_year)
    sharpe = F.when(F.col("__std") > 0,
                    F.col("__mean") / F.col("__std")
                    * F.sqrt(F.lit(ann)))
    years = F.col("n_periods") / F.lit(ann)
    cagr = F.when(years > 0,
                  F.pow(1 + F.col("total_return"), 1.0 / years) - 1)
    return agg.select("sid", "n_periods", "total_return",
                      sharpe.alias("sharpe"), cagr.alias("cagr"),
                      "max_drawdown")
