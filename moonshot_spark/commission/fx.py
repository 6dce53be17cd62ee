"""Spot-FX commission model (SURVEY.md §2.9 D11).

Reference: moonshot/commission/fx.py:17-52 — a PercentageCommission at
0.2 bps with no min commission (FX min commissions are USD-denominated and
deliberately not modeled).
"""

from moonshot_spark.commission.base import PercentageCommission


class SpotFXCommission(PercentageCommission):

    BROKER_COMMISSION_RATE = 0.00002  # 0.2 bps
    EXCHANGE_FEE_RATE = 0
    MIN_COMMISSION = 0
