"""Fixed percentage slippage (SURVEY.md §2.9 D12).

Reference: moonshot/slippage/fixed.py:18-64 — slippage = turnover ×
one_way_slippage (default 5 bps).  The strategy-level SLIPPAGE_BPS shortcut
(base.py:916-917) instantiates this with bps/10000.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from moonshot_spark.slippage.base import Slippage


class FixedSlippage(Slippage):

    ONE_WAY_SLIPPAGE = 0.0005

    def __init__(self, one_way_slippage: float | None = None):
        self.one_way_slippage = (self.ONE_WAY_SLIPPAGE if one_way_slippage is None
                                 else one_way_slippage)

    def slippage_expr(self, df: DataFrame, turnover: Column,
                      position: Column) -> Column:
        return turnover * F.lit(self.one_way_slippage)
