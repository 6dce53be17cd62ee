"""Commission base classes (SURVEY.md §2.9 D8).

Reference semantics: moonshot/commission/base.py:16-171.  Commissions are
expressed as a percentage of account equity: rate × turnover, with an
optional min-commission floor enforced against NLV.

Spark design: each class exposes ``commission_expr(contract_value, turnover,
nlv)`` returning a Column — pure arithmetic that fuses into the surrounding
whole-stage-codegen span.  No joins, no shuffles, no UDFs: at 100 TB the
commission stage adds zero exchanges to the plan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


class Commission:
    """Base class.  Subclasses define rate parameters as class attributes
    (same configuration surface as the reference, commission/base.py:16-66).
    """

    MIN_COMMISSION: float = 0

    @classmethod
    def commission_expr(cls, contract_value: Column, turnover: Column,
                        nlv: Column | None = None) -> Column:
        raise NotImplementedError

    @classmethod
    def _enforce_min_commissions(cls, commissions: Column, nlv: Column) -> Column:
        """Floor positive commissions below the minimum at MIN_COMMISSION/NLV.

        Reference: commission/base.py:57-66 — the floor is expressed as a
        fraction of account equity; only rows with 0 < commission < floor
        are raised.
        """
        min_commissions = F.lit(cls.MIN_COMMISSION) / nlv
        must_pay_min = (commissions > 0) & (commissions < min_commissions)
        return F.when(must_pay_min, min_commissions).otherwise(commissions)


class PercentageCommission(Commission):
    """Commission as a fixed percentage of trade value, with optional
    volume-tier blending and exchange fee.  Reference: commission/base.py:68-171.
    """

    BROKER_COMMISSION_RATE: float = 0
    BROKER_COMMISSION_RATE_TIER_2: float | None = None
    TIER_2_RATIO: float | None = None
    EXCHANGE_FEE_RATE: float = 0
    MIN_COMMISSION: float = 0

    @classmethod
    def commission_expr(cls, contract_value: Column, turnover: Column,
                        nlv: Column | None = None) -> Column:
        if cls.TIER_2_RATIO:
            rate = ((1 - cls.TIER_2_RATIO) * cls.BROKER_COMMISSION_RATE
                    + cls.TIER_2_RATIO * cls.BROKER_COMMISSION_RATE_TIER_2)
        else:
            rate = cls.BROKER_COMMISSION_RATE
        broker = turnover * F.lit(rate)
        if nlv is not None and cls.MIN_COMMISSION:
            broker = cls._enforce_min_commissions(broker, nlv)
        return broker + turnover * F.lit(cls.EXCHANGE_FEE_RATE)


class NoCommission(PercentageCommission):
    """Zero-cost commission class.  Reference: commission/base.py:173-186."""

    BROKER_COMMISSION_RATE = 0
    EXCHANGE_FEE_RATE = 0
    MIN_COMMISSION = 0
