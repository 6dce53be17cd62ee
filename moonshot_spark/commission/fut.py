"""Futures commission model (SURVEY.md §2.9 D10).

Reference: moonshot/commission/fut.py:19-80 (FuturesCommission):
(broker + exchange + carrying) per contract / contract value × turnover.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from moonshot_spark.commission.base import Commission


class FuturesCommission(Commission):

    BROKER_COMMISSION_PER_CONTRACT: float = 0
    EXCHANGE_FEE_PER_CONTRACT: float = 0
    CARRYING_FEE_PER_CONTRACT: float = 0

    @classmethod
    def commission_expr(cls, contract_value: Column, turnover: Column,
                        nlv: Column | None = None) -> Column:
        cost = (cls.BROKER_COMMISSION_PER_CONTRACT
                + cls.EXCHANGE_FEE_PER_CONTRACT
                + cls.CARRYING_FEE_PER_CONTRACT)
        return (F.lit(float(cost)) / contract_value) * turnover
