"""Borrow-fee slippage for short positions (SURVEY.md §2.9 D13).

Reference: moonshot/slippage/borrowfee.py:19-59 (IBKRBorrowFees):
``abs(short positions) × 1.02 × (annual_fee% / 100 / 360) × days_held``
where days_held between consecutive panel rows covers weekends (×3).

The reference pulls fees from the quantrocket fundamental service; here the
fee panel is any DataFrame ``(sid, date, borrow_fee)`` (annualized percent),
joined onto the panel — broadcast when small, sort-merge on (sid, date)
otherwise.  The join happens at panel-build time (``fee_col`` already on the
panel), so the expr itself stays pure arithmetic + one lag window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from moonshot_spark.functions.window import sid_window
from moonshot_spark.slippage.base import Slippage


class BorrowFees(Slippage):

    COLLATERAL_RATIO = 1.02   # industry convention: collateral = 102% of borrow
    DAYS_PER_YEAR = 360       # industry convention divisor

    def __init__(self, fee_col: str = "borrow_fee", date_col: str = "date"):
        self.fee_col = fee_col
        self.date_col = date_col

    def slippage_expr(self, df: DataFrame, turnover: Column,
                      position: Column) -> Column:
        daily_rate = F.col(self.fee_col) / 100 / self.DAYS_PER_YEAR
        w = sid_window("sid", self.date_col)
        prev_date = F.lag(F.col(self.date_col), 1).over(w)
        days_held = F.coalesce(F.datediff(F.col(self.date_col), prev_date), F.lit(1))
        short_exposure = F.abs(F.when(position < 0, position).otherwise(F.lit(0.0)))
        return short_exposure * F.lit(self.COLLATERAL_RATIO) * daily_rate * days_held
