"""Futures commission model (SURVEY.md §2.9 D10).

Reference: moonshot/commission/fut.py:19-80 (FuturesCommission):
(broker + exchange + carrying) per contract / contract value × turnover.
Demo config subclasses: reference fut.py:82-122.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from moonshot_spark.commission.base import Commission, PercentageCommission


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


# ------------------------------------------------------------------ #
# ready-made demo config instances (reference fut.py:82-122)          #
# ------------------------------------------------------------------ #

class DemoCMEEquityEMiniFixedCommission(FuturesCommission):
    """Fixed commission for CME Equity E-Minis (reference fut.py:82-88)."""

    BROKER_COMMISSION_PER_CONTRACT: float = 0.85
    EXCHANGE_FEE_PER_CONTRACT: float = 1.18
    CARRYING_FEE_PER_CONTRACT: float = 0


class DemoCanadaCADFuturesTieredCommission(FuturesCommission):
    """Tiered/Cost-Plus commission for Canada futures denominated in CAD,
    for US customers (reference fut.py:90-102)."""

    BROKER_COMMISSION_PER_CONTRACT: float = 0.85
    EXCHANGE_FEE_PER_CONTRACT: float = (
        1.12    # exchange fee
        + 0.03  # regulatory fee
        + 0.01  # NFA assessment fee
    )
    CARRYING_FEE_PER_CONTRACT: float = 0


class DemoKoreaFuturesCommission(PercentageCommission):
    """Fixed rate commission for Korea futures excluding stock futures
    (reference fut.py:104-112): 0.4 bps fixed rate."""

    BROKER_COMMISSION_RATE: float = 0.00004
    EXCHANGE_FEE_RATE: float = 0
    MIN_COMMISSION: float = 0


class DemoKoreaStockFuturesCommission(PercentageCommission):
    """Fixed rate commission for Korea stock futures (reference
    fut.py:114-122): 4 bps fixed rate."""

    BROKER_COMMISSION_RATE: float = 0.0004
    EXCHANGE_FEE_RATE: float = 0
    MIN_COMMISSION: float = 0
