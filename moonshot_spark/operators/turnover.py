"""Turnover operator (SURVEY.md §2.9 D6).

Reference: moonshot/strategies/base.py:701-714 (_positions_to_turnover):
``turnover = positions.fillna(0).diff().abs()`` — or ``abs(positions * 2)``
when POSITIONS_CLOSED_DAILY (each day's position opened and closed same day).
The first row's diff is NaN in pandas; the reference keeps it (commissions
then fillna it downstream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, WindowSpec
from pyspark.sql import functions as F

from pyspark.sql import Column

from moonshot_spark.functions.window import sid_window


def turnover_expr(position_col: str = "position",
                  positions_closed_daily: bool = False,
                  w: WindowSpec | None = None) -> Column:
    """The turnover column expression — single source of truth shared by
    the DataFrame operator below and the Moonshot engine."""
    if positions_closed_daily:
        return F.abs(F.col(position_col) * 2)
    w = w if w is not None else sid_window()
    filled = F.coalesce(F.col(position_col), F.lit(0.0))
    prev = F.lag(filled, 1).over(w)
    return F.abs(filled - prev)


def positions_to_turnover(df: DataFrame, position_col: str = "position",
                          turnover_col: str = "turnover",
                          positions_closed_daily: bool = False,
                          w: WindowSpec | None = None) -> DataFrame:
    return df.withColumn(
        turnover_col, turnover_expr(position_col, positions_closed_daily, w))
