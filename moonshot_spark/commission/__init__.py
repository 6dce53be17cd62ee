"""Commission cost models (SURVEY.md §2.9 D8–D11, D14)."""

from moonshot_spark.commission.base import Commission, PercentageCommission, NoCommission
from moonshot_spark.commission.stk import PerShareCommission
from moonshot_spark.commission.fut import FuturesCommission
from moonshot_spark.commission.fx import SpotFXCommission

__all__ = [
    "Commission", "PercentageCommission", "NoCommission",
    "PerShareCommission", "FuturesCommission", "SpotFXCommission",
]
