"""Commission cost models (SURVEY.md §2.9 D8–D11, D14) plus the
reference's ready-made demo config subclasses (stk.py:190-273,
fut.py:82-122)."""

from moonshot_spark.commission.base import Commission, PercentageCommission, NoCommission
from moonshot_spark.commission.stk import (
    PerShareCommission,
    DemoUSStockCommission,
    DemoCostPlusUSStockCommission,
    DemoCostPlusCanadaStockCommission,
    DemoAustraliaStockCommission,
    DemoFranceStockCommission,
    DemoGermanyStockCommission,
    DemoHongKongStockCommission,
    DemoJapanStockCommission,
    DemoMexicoStockCommission,
    DemoSingaporeStockCommission,
    DemoUKStockCommission,
)
from moonshot_spark.commission.fut import (
    FuturesCommission,
    DemoCMEEquityEMiniFixedCommission,
    DemoCanadaCADFuturesTieredCommission,
    DemoKoreaFuturesCommission,
    DemoKoreaStockFuturesCommission,
)
from moonshot_spark.commission.fx import SpotFXCommission

# Back-compat long name, matching the reference's alias
# (moonshot/commission/__init__.py:54).
SpotForexCommission = SpotFXCommission

__all__ = [
    "Commission", "PercentageCommission", "NoCommission",
    "PerShareCommission", "FuturesCommission", "SpotFXCommission",
    "SpotForexCommission",
    "DemoUSStockCommission", "DemoCostPlusUSStockCommission",
    "DemoCostPlusCanadaStockCommission", "DemoAustraliaStockCommission",
    "DemoFranceStockCommission", "DemoGermanyStockCommission",
    "DemoHongKongStockCommission", "DemoJapanStockCommission",
    "DemoMexicoStockCommission", "DemoSingaporeStockCommission",
    "DemoUKStockCommission", "DemoCMEEquityEMiniFixedCommission",
    "DemoCanadaCADFuturesTieredCommission", "DemoKoreaFuturesCommission",
    "DemoKoreaStockFuturesCommission",
]
