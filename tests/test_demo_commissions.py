"""Demo commission config classes (reference commission/stk.py:190-273,
fut.py:82-122): each class's commission_expr must reproduce the
reference's pandas arithmetic for a pinned (contract_value, turnover,
nlv) point — the expected numbers are hand-derived from the reference
formulas, not from the implementation under test."""

import math

import pytest
from pyspark.sql import functions as F

from moonshot_spark.commission import (
    DemoAustraliaStockCommission,
    DemoCMEEquityEMiniFixedCommission,
    DemoCanadaCADFuturesTieredCommission,
    DemoCostPlusCanadaStockCommission,
    DemoCostPlusUSStockCommission,
    DemoFranceStockCommission,
    DemoGermanyStockCommission,
    DemoHongKongStockCommission,
    DemoJapanStockCommission,
    DemoKoreaFuturesCommission,
    DemoKoreaStockFuturesCommission,
    DemoMexicoStockCommission,
    DemoSingaporeStockCommission,
    DemoUKStockCommission,
    DemoUSStockCommission,
)

CV, TURNOVER, NLV = 50.0, 0.02, 100000.0


def _evaluate(spark, cls, cv=CV, turnover=TURNOVER, nlv=NLV):
    df = spark.createDataFrame(
        [(cv, turnover, nlv)], "cv double, turnover double, nlv double")
    expr = cls.commission_expr(F.col("cv"), F.col("turnover"), F.col("nlv"))
    return df.select(expr.alias("c")).collect()[0]["c"]


def _pct_expected(cls, turnover=TURNOVER, nlv=NLV):
    """Reference PercentageCommission.get_commissions (base.py:138-171)."""
    broker = turnover * cls.BROKER_COMMISSION_RATE
    floor = cls.MIN_COMMISSION / nlv
    if cls.MIN_COMMISSION and 0 < broker < floor:
        broker = floor
    return broker + turnover * cls.EXCHANGE_FEE_RATE


def _per_share_expected(cls, cv=CV, turnover=TURNOVER, nlv=NLV):
    """Reference PerShareCommission.get_commissions (stk.py:105-188)."""
    taker_ratio = 1 - cls.MAKER_RATIO
    exch_per_share = (cls.EXCHANGE_FEE_PER_SHARE
                      + cls.MAKER_RATIO * cls.MAKER_FEE_PER_SHARE
                      + taker_ratio * cls.TAKER_FEE_PER_SHARE)
    broker = cls.BROKER_COMMISSION_PER_SHARE / cv * turnover
    floor = cls.MIN_COMMISSION / nlv
    if cls.MIN_COMMISSION and 0 < broker < floor:
        broker = floor
    return (broker
            + exch_per_share / cv * turnover
            + cls.PERCENTAGE_FEE_RATE * turnover
            + cls.COMMISSION_PERCENTAGE_FEE_RATE * broker)


def _futures_expected(cls, cv=CV, turnover=TURNOVER):
    """Reference FuturesCommission.get_commissions (fut.py:62-80)."""
    cost = (cls.BROKER_COMMISSION_PER_CONTRACT
            + cls.EXCHANGE_FEE_PER_CONTRACT
            + cls.CARRYING_FEE_PER_CONTRACT)
    return cost / cv * turnover


PCT_CLASSES = [
    DemoAustraliaStockCommission, DemoFranceStockCommission,
    DemoGermanyStockCommission, DemoHongKongStockCommission,
    DemoJapanStockCommission, DemoMexicoStockCommission,
    DemoSingaporeStockCommission, DemoUKStockCommission,
    DemoKoreaFuturesCommission, DemoKoreaStockFuturesCommission,
]

PER_SHARE_CLASSES = [
    DemoUSStockCommission, DemoCostPlusUSStockCommission,
    DemoCostPlusCanadaStockCommission,
]

FUTURES_CLASSES = [
    DemoCMEEquityEMiniFixedCommission,
    DemoCanadaCADFuturesTieredCommission,
]


@pytest.mark.parametrize("cls", PCT_CLASSES, ids=lambda c: c.__name__)
def test_demo_percentage_commissions(spark, cls):
    got = _evaluate(spark, cls)
    assert math.isclose(got, _pct_expected(cls), rel_tol=1e-12)


@pytest.mark.parametrize("cls", PER_SHARE_CLASSES, ids=lambda c: c.__name__)
def test_demo_per_share_commissions(spark, cls):
    got = _evaluate(spark, cls)
    assert math.isclose(got, _per_share_expected(cls), rel_tol=1e-12)


@pytest.mark.parametrize("cls", FUTURES_CLASSES, ids=lambda c: c.__name__)
def test_demo_futures_commissions(spark, cls):
    got = _evaluate(spark, cls)
    assert math.isclose(got, _futures_expected(cls), rel_tol=1e-12)


def test_demo_spot_values_pinned(spark):
    """Literal spot values, derived by hand from the reference numbers.

    DemoUSStockCommission at cv=50, turnover=0.02, nlv=100000:
      broker = 0.005/50*0.02 = 2e-06; floor = 1.00/1e5 = 1e-05 → floored
      total = 1e-05.
    DemoCMEEquityEMini at the same point:
      (0.85+1.18)/50*0.02 = 2.03/50*0.02 = 8.12e-04.
    DemoJapanStockCommission:
      broker = 0.0005*0.02 = 1e-05; floor = 80/1e5 = 8e-04 → floored
      total = 8e-04 + 0.000004*0.02 = 8.0008e-04.
    """
    assert math.isclose(_evaluate(spark, DemoUSStockCommission),
                        1e-05, rel_tol=1e-12)
    assert math.isclose(_evaluate(spark, DemoCMEEquityEMiniFixedCommission),
                        8.12e-04, rel_tol=1e-12)
    assert math.isclose(_evaluate(spark, DemoJapanStockCommission),
                        8.0008e-04, rel_tol=1e-12)


def test_demo_min_commission_not_applied_without_nlv(spark):
    """Reference base.py:158-160: min commission only enforced when NLVs
    are provided."""
    df = spark.createDataFrame([(50.0, 0.02)], "cv double, turnover double")
    expr = DemoUSStockCommission.commission_expr(
        F.col("cv"), F.col("turnover"), None)
    got = df.select(expr.alias("c")).collect()[0]["c"]
    assert math.isclose(got, 0.005 / 50.0 * 0.02, rel_tol=1e-12)  # unfloored
