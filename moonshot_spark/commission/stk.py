"""Per-share commission model (SURVEY.md §2.9 D9).

Reference semantics: moonshot/commission/stk.py:18-188 (PerShareCommission):
maker/taker-blended and tier-blended per-share costs are converted to a
percentage of trade value by dividing by |contract value|, then multiplied
by turnover; plus value-based and commission-based fees; min floor.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from moonshot_spark.commission.base import Commission


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
