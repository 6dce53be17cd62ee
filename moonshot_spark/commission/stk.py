"""Per-share commission model (SURVEY.md §2.9 D9).

Reference semantics: moonshot/commission/stk.py:18-188 (PerShareCommission):
maker/taker-blended and tier-blended per-share costs are converted to a
percentage of trade value by dividing by |contract value|, then multiplied
by turnover; plus value-based and commission-based fees; min floor.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from moonshot_spark.commission.base import Commission, PercentageCommission


class PerShareCommission(Commission):

    BROKER_COMMISSION_PER_SHARE: float | None = None
    BROKER_COMMISSION_PER_SHARE_TIER_2: float | None = None
    TIER_2_RATIO: float = 0
    EXCHANGE_FEE_PER_SHARE: float = 0
    MAKER_FEE_PER_SHARE: float = 0
    TAKER_FEE_PER_SHARE: float = 0
    MAKER_RATIO: float = 0
    PERCENTAGE_FEE_RATE: float = 0
    COMMISSION_PERCENTAGE_FEE_RATE: float = 0
    MIN_COMMISSION: float = 0

    @classmethod
    def commission_expr(cls, contract_value: Column, turnover: Column,
                        nlv: Column | None = None) -> Column:
        taker_ratio = 1 - cls.MAKER_RATIO
        exchange_fee_per_share = (cls.EXCHANGE_FEE_PER_SHARE
                                  + cls.MAKER_RATIO * cls.MAKER_FEE_PER_SHARE
                                  + taker_ratio * cls.TAKER_FEE_PER_SHARE)
        if cls.TIER_2_RATIO:
            per_share = ((1 - cls.TIER_2_RATIO) * cls.BROKER_COMMISSION_PER_SHARE
                         + cls.TIER_2_RATIO * cls.BROKER_COMMISSION_PER_SHARE_TIER_2)
        else:
            per_share = cls.BROKER_COMMISSION_PER_SHARE

        # abs() because combo contracts can have negative prices (stk.py:174);
        # the NULL-where-zero guard reproduces pandas' NaN-on-zero division.
        safe_cv = F.abs(F.when(contract_value != 0, contract_value))
        broker = (F.lit(float(per_share)) / safe_cv) * turnover
        if nlv is not None and cls.MIN_COMMISSION:
            broker = cls._enforce_min_commissions(broker, nlv)

        share_fees = (F.lit(exchange_fee_per_share) / safe_cv) * turnover
        value_fees = F.lit(cls.PERCENTAGE_FEE_RATE) * turnover
        commission_fees = F.lit(cls.COMMISSION_PERCENTAGE_FEE_RATE) * broker
        return broker + share_fees + value_fees + commission_fees


# ------------------------------------------------------------------ #
# ready-made demo config instances (reference stk.py:190-273)          #
# ------------------------------------------------------------------ #

class DemoUSStockCommission(PerShareCommission):
    """Reference stk.py:190-193."""

    BROKER_COMMISSION_PER_SHARE: float = 0.005
    MIN_COMMISSION: float = 1.00


class DemoCostPlusUSStockCommission(PerShareCommission):
    """Cost-plus US stock commission (reference stk.py:195-206)."""

    BROKER_COMMISSION_PER_SHARE: float = 0.0035
    EXCHANGE_FEE_PER_SHARE: float = (
        0.0002           # clearing fee per share
        + (0.000119 / 2))  # FINRA activity fee (per share sold)
    MAKER_FEE_PER_SHARE: float = -0.002   # exchange rebate (varies)
    TAKER_FEE_PER_SHARE: float = 0.00118  # exchange fee (varies)
    MAKER_RATIO: float = 0
    COMMISSION_PERCENTAGE_FEE_RATE: float = (
        0.000175    # NYSE pass-through (% of broker commission)
        + 0.00056)  # FINRA pass-through (% of broker commission)
    PERCENTAGE_FEE_RATE: float = 0.0000231  # transaction fees
    MIN_COMMISSION: float = 0.35


class DemoCostPlusCanadaStockCommission(PerShareCommission):
    """Cost-plus Canada stock commission (reference stk.py:209-220).
    TRANSACTION_FEE_RATE is carried for attribute parity with the
    reference demo class, which defines but never reads it."""

    BROKER_COMMISSION_PER_SHARE: float = 0.008
    EXCHANGE_FEE_PER_SHARE: float = (
        0.00017     # clearing fee per share
        + 0.00011)  # transaction fee per share
    MAKER_FEE_PER_SHARE: float = -0.0019  # varies
    TAKER_FEE_PER_SHARE: float = 0.003    # varies
    MAKER_RATIO: float = 0
    MIN_COMMISSION: float = 1.00
    TRANSACTION_FEE_RATE: float = 0


class DemoAustraliaStockCommission(PercentageCommission):
    """Reference stk.py:222-226."""

    BROKER_COMMISSION_RATE: float = 0.0008
    EXCHANGE_FEE_RATE: float = 0
    MIN_COMMISSION: float = 5.00


class DemoFranceStockCommission(PercentageCommission):
    """Reference stk.py:228-232."""

    BROKER_COMMISSION_RATE: float = 0.0008
    EXCHANGE_FEE_RATE: float = 0.000095  # 0.95 bps exchange fee
    MIN_COMMISSION: float = 1.25  # EUR


class DemoGermanyStockCommission(PercentageCommission):
    """Reference stk.py:234-238."""

    BROKER_COMMISSION_RATE: float = 0.0008
    EXCHANGE_FEE_RATE: float = 0.000048 + 0.00001  # exchange + clearing
    MIN_COMMISSION: float = 1.25  # EUR


class DemoHongKongStockCommission(PercentageCommission):
    """Reference stk.py:240-249."""

    BROKER_COMMISSION_RATE: float = 0.0008
    EXCHANGE_FEE_RATE: float = (
        0.00005      # exchange fee
        + 0.00002    # clearing fee (2 HKD min)
        + 0.001      # stamp duty
        + 0.000027)  # SFC transaction levy
    MIN_COMMISSION: float = 18.00  # HKD


class DemoJapanStockCommission(PercentageCommission):
    """Reference stk.py:251-255."""

    BROKER_COMMISSION_RATE: float = 0.0005
    EXCHANGE_FEE_RATE: float = 0.000004
    MIN_COMMISSION: float = 80.00  # JPY


class DemoMexicoStockCommission(PercentageCommission):
    """Reference stk.py:257-261."""

    BROKER_COMMISSION_RATE: float = 0.0010
    EXCHANGE_FEE_RATE: float = 0
    MIN_COMMISSION: float = 60.00  # MXN


class DemoSingaporeStockCommission(PercentageCommission):
    """Reference stk.py:263-267."""

    BROKER_COMMISSION_RATE: float = 0.0008
    EXCHANGE_FEE_RATE: float = 0.00034775 + 0.00008025  # transaction + access
    MIN_COMMISSION: float = 2.50  # SGD


class DemoUKStockCommission(PercentageCommission):
    """Reference stk.py:269-273."""

    BROKER_COMMISSION_RATE: float = 0.0008
    EXCHANGE_FEE_RATE: float = 0.000045 + 0.0025  # 0.45 bps + stamp tax
    MIN_COMMISSION: float = 1.00  # GBP
