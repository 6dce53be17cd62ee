"""Golden-output backtest tests, ported from the reference's test strategy
(reference: moonshot/_tests/test_backtest.py:108-402 test_basic_long_only_strategy,
and :404+ long-short).  Same fixture data, same expected values — these encode
the exact pandas semantics (NaN placement, equal-weight allocation, shift
timing) our Spark pipeline must reproduce.
"""

import datetime
import math

import pytest
from pyspark.sql import functions as F

from moonshot_spark import Moonshot

DATES = [datetime.date(2018, 5, d) for d in (1, 2, 3, 4)]


@pytest.fixture(scope="module")
def prices(spark):
    # fixture values from reference _tests/test_backtest.py:125-158
    rows = []
    closes = {"FI12345": [9, 11, 10.50, 9.99], "FI23456": [9.89, 11, 8.50, 10.50]}
    volumes = {"FI12345": [5000, 16000, 8800, 9900],
               "FI23456": [15000, 14000, 28800, 17000]}
    for sid in closes:
        for i, d in enumerate(DATES):
            rows.append((sid, d, float(closes[sid][i]), float(volumes[sid][i])))
    return spark.createDataFrame(rows, "sid string, date date, close double, volume double")


class BuyBelow10(Moonshot):
    """Buys below 10 — reference test_backtest.py:114-121."""

    def prices_to_signals(self, prices):
        return prices.withColumn("signal", (F.col("close") < 10).cast("int"))


class ShortAbove10(Moonshot):
    """Shorts above 10 — reference test_backtest.py:404+ long-short variant."""

    def prices_to_signals(self, prices):
        return prices.withColumn(
            "signal", F.when(F.col("close") > 10, -1).otherwise(1))


def field_dict(results, field):
    rows = results.where(F.col("field") == field).collect()
    out = {}
    for r in rows:
        out.setdefault(r["sid"], {})[r["date"]] = (
            None if r["value"] is None or (isinstance(r["value"], float)
                                           and math.isnan(r["value"]))
            else round(r["value"], 7))
    return {sid: [vals[d] for d in DATES] for sid, vals in out.items()}


@pytest.fixture(scope="module")
def results(prices):
    return BuyBelow10().backtest(prices).cache()


def test_result_fields(results):
    fields = {r["field"] for r in results.select("field").distinct().collect()}
    assert fields == {"Commission", "AbsExposure", "Signal", "Return", "Slippage",
                      "NetExposure", "TotalHoldings", "Turnover", "AbsWeight",
                      "Weight"}


def test_signals(results):
    assert field_dict(results, "Signal") == {
        "FI12345": [1.0, 0.0, 0.0, 1.0],
        "FI23456": [1.0, 0.0, 1.0, 0.0]}


def test_weights(results):
    assert field_dict(results, "Weight") == {
        "FI12345": [0.5, 0.0, 0.0, 1.0],
        "FI23456": [0.5, 0.0, 1.0, 0.0]}


def test_net_exposure(results):
    assert field_dict(results, "NetExposure") == {
        "FI12345": [None, 0.5, 0.0, 0.0],
        "FI23456": [None, 0.5, 0.0, 1.0]}


def test_total_holdings(results):
    assert field_dict(results, "TotalHoldings") == {
        "FI12345": [0.0, 1.0, 0.0, 0.0],
        "FI23456": [0.0, 1.0, 0.0, 1.0]}


def test_turnover(results):
    assert field_dict(results, "Turnover") == {
        "FI12345": [None, 0.5, 0.5, 0.0],
        "FI23456": [None, 0.5, 0.5, 1.0]}


def test_commissions_and_slippage_zero(results):
    assert field_dict(results, "Commission") == {
        "FI12345": [0.0, 0.0, 0.0, 0.0], "FI23456": [0.0, 0.0, 0.0, 0.0]}
    assert field_dict(results, "Slippage") == {
        "FI12345": [0.0, 0.0, 0.0, 0.0], "FI23456": [0.0, 0.0, 0.0, 0.0]}


def test_returns(results):
    # reference test_backtest.py:385-402: (10.50-11)/11 * 0.5, (8.50-11)/11 * 0.5
    assert field_dict(results, "Return") == {
        "FI12345": [0.0, 0.0, -0.0227273, 0.0],
        "FI23456": [0.0, 0.0, -0.1136364, 0.0]}


def test_long_short_returns(prices):
    """Long-short variant — reference test_backtest.py:404+ expected values."""
    results = ShortAbove10().backtest(prices)
    # signals: FI12345 [1,-1,-1,1]; FI23456 [1,-1,1,-1]
    assert field_dict(results, "Signal") == {
        "FI12345": [1.0, -1.0, -1.0, 1.0],
        "FI23456": [1.0, -1.0, 1.0, -1.0]}
    # equal-weight: each gets 1/2
    assert field_dict(results, "Weight") == {
        "FI12345": [0.5, -0.5, -0.5, 0.5],
        "FI23456": [0.5, -0.5, 0.5, -0.5]}
    # positions = weights.shift(); gross = pct_change(close) * positions.shift()
    # day3 gross: FI12345 (10.5-11)/11*0.5 ; day4: (9.99-10.5)/10.5*(-0.5)
    ret = field_dict(results, "Return")
    assert ret["FI12345"][2] == round((10.50 - 11) / 11 * 0.5, 7)
    assert ret["FI12345"][3] == round((9.99 - 10.50) / 10.50 * -0.5, 7)
    assert ret["FI23456"][2] == round((8.50 - 11) / 11 * 0.5, 7)
    assert ret["FI23456"][3] == round((10.50 - 8.50) / 8.50 * -0.5, 7)


def test_start_date_truncation(prices):
    results = BuyBelow10().backtest(prices, start_date="2018-05-03")
    dates = {r["date"] for r in results.select("date").distinct().collect()}
    assert dates == {datetime.date(2018, 5, 3), datetime.date(2018, 5, 4)}


def test_allocation(prices):
    results = BuyBelow10().backtest(prices, allocation=0.5)
    assert field_dict(results, "Weight") == {
        "FI12345": [0.25, 0.0, 0.0, 0.5],
        "FI23456": [0.25, 0.0, 0.5, 0.0]}


def test_label_sids(spark, prices):
    master = spark.createDataFrame(
        [("FI12345", "ABC", "STK", "USD", "NYSE", "America/New_York", None, None),
         ("FI23456", "DEF", "STK", "USD", "NYSE", "America/New_York", None, None)],
        "sid string, symbol string, sec_type string, currency string, "
        "exchange string, timezone string, price_magnifier double, multiplier double")
    results = BuyBelow10().backtest(prices, master=master, label_sids=True)
    sids = {r["sid"] for r in results.select("sid").distinct().collect()}
    assert sids == {"ABC(FI12345)", "DEF(FI23456)"}


def test_end_date_truncation(prices):
    results = BuyBelow10().backtest(prices, end_date="2018-05-02")
    dates = {r["date"] for r in results.select("date").distinct().collect()}
    assert dates == {datetime.date(2018, 5, 1), datetime.date(2018, 5, 2)}


def test_append_fx_nlv_based_on_symbol(spark, prices):
    """FX NLV keys on the quote currency from the CASH symbol, not the
    settlement currency (reference _tests/test_prices.py:1086+: CASH
    'EUR'/USD gets the EUR NLV, the STK sibling gets USD)."""
    master = spark.createDataFrame(
        [("FI12345", "EUR", "CASH", "USD", "America/New_York", None, None),
         ("FI23456", "EUR", "STK", "USD", "America/New_York", None, None)],
        "sid string, symbol string, sec_type string, currency string, "
        "timezone string, price_magnifier double, multiplier double")

    class SaveNlv(BuyBelow10):
        def prices_to_signals(self, p):
            self.save_to_results("Nlv", "nlv")
            return super().prices_to_signals(p)

    results = SaveNlv().backtest(
        prices, master=master, nlv={"USD": 50000, "EUR": 40000})
    nlvs = field_dict(results, "Nlv")
    assert nlvs["FI12345"] == [40000.0] * 4      # CASH → EUR
    assert nlvs["FI23456"] == [50000.0] * 4      # STK → USD


def test_nlv_missing_currency_raises(spark, prices):
    """reference base.py:1136-1140: every required (quote) currency must
    have an NLV entry."""
    from moonshot_spark.strategies.base import MoonshotParameterError

    master = spark.createDataFrame(
        [("FI12345", "EUR", "CASH", "USD", "America/New_York", None, None),
         ("FI23456", "EUR", "STK", "USD", "America/New_York", None, None)],
        "sid string, symbol string, sec_type string, currency string, "
        "timezone string, price_magnifier double, multiplier double")
    with pytest.raises(MoonshotParameterError,
                       match="missing values for required currencies: EUR"):
        BuyBelow10().backtest(prices, master=master, nlv={"USD": 50000})


def test_complain_if_prices_to_signals_not_implemented(prices):
    """reference test_backtest.py:34: the abstract hook errors clearly."""
    with pytest.raises(NotImplementedError, match="prices_to_signals"):
        Moonshot().backtest(prices)


def test_reference_import_surface():
    # a user switching from the reference keeps their imports:
    # Moonshot/MoonshotML at top level, commission/slippage modules,
    # exceptions at moonshot.exceptions (ref __init__.py:36-44)
    import moonshot_spark
    from moonshot_spark.exceptions import (
        MoonshotError, MoonshotParameterError)

    assert issubclass(MoonshotParameterError, MoonshotError)
    assert {"Moonshot", "MoonshotML", "commission", "slippage",
            "exceptions"} <= set(moonshot_spark.__all__)
    assert hasattr(moonshot_spark.commission, "PerShareCommission")
    assert hasattr(moonshot_spark.slippage, "FixedSlippage")
