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

__all__ = [
    "Commission", "PercentageCommission", "NoCommission",
    "PerShareCommission", "FuturesCommission", "SpotFXCommission",
    "DemoUSStockCommission", "DemoCostPlusUSStockCommission",
    "DemoCostPlusCanadaStockCommission", "DemoAustraliaStockCommission",
    "DemoFranceStockCommission", "DemoGermanyStockCommission",
    "DemoHongKongStockCommission", "DemoJapanStockCommission",
    "DemoMexicoStockCommission", "DemoSingaporeStockCommission",
    "DemoUKStockCommission", "DemoCMEEquityEMiniFixedCommission",
    "DemoCanadaCADFuturesTieredCommission", "DemoKoreaFuturesCommission",
    "DemoKoreaStockFuturesCommission",
]
