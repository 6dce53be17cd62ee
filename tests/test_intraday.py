"""Intraday backtests (time column), goldens ported from the reference
(_tests/test_backtest.py:1322 continuous, :1026 once-a-day)."""

import datetime
import math

import pytest
from pyspark.sql import functions as F

from moonshot_spark import Moonshot

DATES = [datetime.date(2018, 5, 1), datetime.date(2018, 5, 2)]
TIMES = ["10:00:00", "11:00:00", "12:00:00"]


@pytest.fixture(scope="module")
def intraday_prices(spark):
    # reference _tests/test_backtest.py:1342-1369
    closes = {
        "FI12345": [9.6, 10.45, 10.12, 15.45, 8.67, 12.30],
        "FI23456": [10.56, 12.01, 10.50, 9.80, 13.40, 7.50],
    }
    rows = []
    for sid, vals in closes.items():
        i = 0
        for d in DATES:
            for t in TIMES:
                rows.append((sid, d, t, float(vals[i])))
                i += 1
    return spark.createDataFrame(rows, "sid string, date date, time string, close double")


class LongShortIntraday(Moonshot):
    """Buys ≤10, shorts >10 — reference test_backtest.py:1329-1337."""

    def prices_to_signals(self, prices):
        return prices.withColumn(
            "signal", F.when(F.col("close") <= 10, 1).otherwise(-1))


def field_dict(results, field):
    rows = results.where(F.col("field") == field).collect()
    out = {}
    for r in rows:
        v = r["value"]
        out.setdefault(r["sid"], {})[(r["date"], r["time"])] = (
            None if v is None or (isinstance(v, float) and math.isnan(v))
            else round(v, 7))
    keys = [(d, t) for d in DATES for t in TIMES]
    return {sid: [vals[k] for k in keys] for sid, vals in out.items()}


def test_continuous_intraday_returns(intraday_prices):
    results = LongShortIntraday().backtest(intraday_prices)
    # reference goldens at _tests/test_backtest.py:1703-1735
    assert field_dict(results, "Return") == {
        "FI12345": [0.0, 0.0, -0.0157895, -0.2633399, 0.2194175, -0.2093426],
        "FI23456": [0.0, 0.0, 0.0628643, 0.0333333, -0.1836735, -0.2201493]}


def test_continuous_intraday_positions(intraday_prices):
    results = LongShortIntraday().backtest(intraday_prices)
    # positions = weights.shift() over (date,time) per sid
    assert field_dict(results, "NetExposure") == {
        "FI12345": [None, 0.5, -0.5, -0.5, -0.5, 0.5],
        "FI23456": [None, -0.5, -0.5, -0.5, 0.5, -0.5]}


def test_once_a_day_intraday(spark, intraday_prices):
    """Once-a-day: signals from one time slice → daily frame downstream
    (reference test_backtest.py:1026 pattern: .xs a time slice)."""

    class OnceADay(Moonshot):
        def prices_to_signals(self, prices):
            sliced = prices.where(F.col("time") == "11:00:00").drop("time")
            return sliced.withColumn(
                "signal", (F.col("close") < 11).cast("int"))

    results = OnceADay().backtest(intraday_prices)
    assert "time" not in results.columns
    sig = {(r["sid"], r["date"]): r["value"]
           for r in results.where(F.col("field") == "Signal").collect()}
    # 11:00 closes: FI12345 [10.45, 8.67] → [1, 1]; FI23456 [12.01, 13.40] → [0, 0]
    assert sig[("FI12345", DATES[0])] == 1.0
    assert sig[("FI12345", DATES[1])] == 1.0
    assert sig[("FI23456", DATES[0])] == 0.0
    # returns on the daily (11:00) closes: day2 = (8.67-10.45)/10.45 * weight
    # shifted... position day2 = weight day1 = 1.0; gross = pct_change *
    # position.shift() → day2 uses position day1 (NULL→0 after fillna)
    ret = {(r["sid"], r["date"]): round(r["value"], 7)
           for r in results.where(F.col("field") == "Return").collect()}
    assert ret[("FI12345", DATES[1])] == 0.0   # position.shift() is null on day2
