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


def test_short_only_once_a_day_intraday_goldens(spark):
    """reference test_backtest.py:1026-1320 full golden matrix: short-only
    once-a-day intraday strategy (signals from the 09:30 Open, entry at
    the 09:30 Close, exit at the 15:30 Close, POSITIONS_CLOSED_DAILY)."""
    dates = [datetime.date(2018, 5, d) for d in (1, 2, 3)]
    times2 = ["09:30:00", "15:30:00"]
    closes = {"FI12345": [9.6, 10.45, 10.12, 15.45, 8.67, 12.30],
              "FI23456": [10.56, 12.01, 10.50, 9.80, 13.40, 14.50]}
    opens = {"FI12345": [9.88, 10.34, 10.23, 16.45, 8.90, 11.30],
             "FI23456": [9.89, 11.0, 8.50, 10.50, 14.10, 15.0]}
    rows = []
    for sid in closes:
        i = 0
        for d in dates:
            for t in times2:
                rows.append((sid, d, t, closes[sid][i], opens[sid][i]))
                i += 1
    prices = spark.createDataFrame(
        rows, "sid string, date date, time string, close double, open double")

    class ShortAbove10Intraday(Moonshot):
        POSITIONS_CLOSED_DAILY = True

        def prices_to_signals(self, p):
            morning = (p.where(F.col("time") == "09:30:00")
                       .select("sid", "date",
                               F.col("open").alias("open0930"),
                               F.col("close").alias("close0930")))
            late = (p.where(F.col("time") == "15:30:00")
                    .select("sid", "date", F.col("close").alias("close1530")))
            return (morning.join(late, ["sid", "date"])
                    .withColumn("signal",
                                -(F.col("open0930") > 10).cast("int")))

        def signals_to_target_weights(self, signals):
            return self.allocate_fixed_weights(signals, 0.25)

        def target_weights_to_positions(self, weights):
            # enter same day
            return weights.withColumn("position", F.col("weight"))

        def positions_to_gross_returns(self, positions):
            # hold 09:30 -> 15:30
            pct = ((F.col("close1530") - F.col("close0930"))
                   / F.col("close0930"))
            return positions.withColumn("gross_return",
                                        pct * F.col("position"))

    results = ShortAbove10Intraday().backtest(prices)
    assert "time" not in results.columns

    def grid(field):
        got = {}
        for r in results.where(F.col("field") == field).collect():
            v = r["value"]
            got.setdefault(r["sid"], {})[r["date"]] = (
                None if v is None or (isinstance(v, float) and math.isnan(v))
                else round(v, 7))
        return {sid: [vals[d] for d in dates] for sid, vals in got.items()}

    # goldens at reference :1160-1320 (nan -> 0 fill happens upstream in
    # the reference via fillna on weights of no-signal rows)
    assert grid("Signal") == {"FI12345": [0.0, -1.0, 0.0],
                              "FI23456": [0.0, 0.0, -1.0]}
    assert grid("Weight") == {"FI12345": [0.0, -0.25, 0.0],
                              "FI23456": [0.0, 0.0, -0.25]}
    assert grid("AbsWeight") == {"FI12345": [0.0, 0.25, 0.0],
                                 "FI23456": [0.0, 0.0, 0.25]}
    assert grid("NetExposure") == {"FI12345": [0.0, -0.25, 0.0],
                                   "FI23456": [0.0, 0.0, -0.25]}
    assert grid("AbsExposure") == {"FI12345": [0.0, 0.25, 0.0],
                                   "FI23456": [0.0, 0.0, 0.25]}
    assert grid("TotalHoldings") == {"FI12345": [0.0, 1.0, 0.0],
                                     "FI23456": [0.0, 0.0, 1.0]}
    assert grid("Turnover") == {"FI12345": [0.0, 0.5, 0.0],
                                "FI23456": [0.0, 0.0, 0.5]}
    assert grid("Return") == {
        "FI12345": [0.0, -0.13167, 0.0],       # (15.45-10.12)/10.12 * -0.25
        "FI23456": [0.0, 0.0, -0.0205224]}     # (14.50-13.40)/13.40 * -0.25


def test_continuous_intraday_commissions_goldens(intraday_prices):
    """reference test_commissions.py:1767-2060: per-bar percentage
    commission on a continuous intraday strategy; MIN_COMMISSION is
    ignored when no NLV is provided (set absurdly high to prove it)."""
    from moonshot_spark.commission.base import PercentageCommission

    class TestCommission(PercentageCommission):
        BROKER_COMMISSION_RATE = 0.0001    # 1 bps
        EXCHANGE_FEE_RATE = 0
        MIN_COMMISSION = 800000000         # high: must be ignored w/o NLV

    class WithCosts(LongShortIntraday):
        COMMISSION_CLASS = TestCommission

    results = WithCosts().backtest(intraday_prices)
    # commissions = turnover * 1bps per bar; first bar NULL (null turnover)
    assert field_dict(results, "Commission") == {
        "FI12345": [None, 0.00005, 0.0001, 0.0, 0.0, 0.0001],
        "FI23456": [None, 0.00005, 0.0, 0.0, 0.0001, 0.0001]}


def test_once_a_day_caps_and_commissions_price_at_first_bar(spark):
    """reference base.py:943-949 (.xs(earliest_time)) and :852-854
    (groupby(Date).first()): when a once-a-day strategy slices a LATER
    bar for signals, position caps and per-share commissions must still
    price at the day's EARLIEST bar — not the sliced bar (found porting
    the trade goldens; the backtest paths shared the same frame-grain
    bug)."""
    from moonshot_spark.commission.stk import PerShareCommission

    dates = [datetime.date(2018, 5, 1), datetime.date(2018, 5, 2)]
    rows = [("S1", dates[0], "09:30:00", 10.0),
            ("S1", dates[0], "15:30:00", 20.0),
            ("S1", dates[1], "09:30:00", 12.0),
            ("S1", dates[1], "15:30:00", 24.0)]
    prices = spark.createDataFrame(
        rows, "sid string, date date, time string, close double")
    master = spark.createDataFrame(
        [("S1", "AAA", "STK", "USD", "America/New_York", None, None)],
        "sid string, symbol string, sec_type string, currency string, "
        "timezone string, price_magnifier double, multiplier double")

    class PerShare(PerShareCommission):
        BROKER_COMMISSION_PER_SHARE = 0.01

    class LateSlice(Moonshot):
        NLV = {"USD": 100000.0}
        COMMISSION_CLASS = PerShare

        def prices_to_signals(self, p):
            late = p.where(F.col("time") == "15:30:00").drop("time")
            return late.withColumn("signal", F.lit(1))

        def signals_to_target_weights(self, signals):
            return self.allocate_fixed_weights(signals, 0.5)

        def limit_position_sizes(self, p):
            caps = p.sparkSession.createDataFrame(
                [("S1", d, 100) for d in dates],
                "sid string, date date, max_quantity long")
            return caps, None

    results = LateSlice().backtest(prices, master=master)
    got = {(r["field"], r["date"]): r["value"] for r in results.collect()}
    # caps priced at the 09:30 close: 100*10/100K and 100*12/100K —
    # NOT the sliced 15:30 closes (which would give 0.02 / 0.024)
    assert got[("Weight", dates[0])] == pytest.approx(0.01)
    assert got[("Weight", dates[1])] == pytest.approx(0.012)
    # commission day2: position enters at day-1 weight (0.01), turnover
    # |0.01|; per-share at the 09:30 cv=12: 0.01/12 * 0.01
    assert got[("Commission", dates[1])] == pytest.approx(0.01 / 12 * 0.01)


def test_once_a_day_min_commission_floor_with_nlv(spark):
    """reference test_commissions.py:1276-1525: once-a-day intraday with
    NLV — the MIN_COMMISSION floor binds (500/50K = 0.01 per entry day,
    vs 0.5 turnover * 1bps = 0.00005 unfloored)."""
    from moonshot_spark.commission.base import PercentageCommission

    dates = [datetime.date(2018, 5, d) for d in (1, 2, 3)]
    closes = {"FI12345": [9.6, 10.45, 10.12, 15.45, 8.67, 12.30],
              "FI23456": [10.56, 12.01, 10.50, 9.80, 13.40, 14.50]}
    opens = {"FI12345": [9.88, 10.34, 10.23, 16.45, 8.90, 11.30],
             "FI23456": [9.89, 11.0, 8.50, 10.50, 14.10, 15.0]}
    rows = []
    for sid in closes:
        i = 0
        for d in dates:
            for t in ["09:30:00", "15:30:00"]:
                rows.append((sid, d, t, closes[sid][i], opens[sid][i]))
                i += 1
    prices = spark.createDataFrame(
        rows, "sid string, date date, time string, close double, open double")
    master = spark.createDataFrame(
        [("FI12345", "ABC", "STK", "USD", "America/New_York", None, None),
         ("FI23456", "DEF", "STK", "USD", "America/New_York", None, None)],
        "sid string, symbol string, sec_type string, currency string, "
        "timezone string, price_magnifier double, multiplier double")

    class TestCommission(PercentageCommission):
        BROKER_COMMISSION_RATE = 0.0001
        EXCHANGE_FEE_RATE = 0
        MIN_COMMISSION = 500

    class ShortAbove10Intraday(Moonshot):
        POSITIONS_CLOSED_DAILY = True
        COMMISSION_CLASS = TestCommission
        NLV = {"USD": 50000.0}

        def prices_to_signals(self, p):
            morning = p.where(F.col("time") == "09:30:00").drop("time")
            return morning.withColumn(
                "signal", -(F.col("open") > 10).cast("int"))

        def signals_to_target_weights(self, signals):
            return self.allocate_fixed_weights(signals, 0.25)

        def target_weights_to_positions(self, weights):
            return weights.withColumn("position", F.col("weight"))

    results = ShortAbove10Intraday().backtest(prices, master=master)
    got = {}
    for r in results.where(F.col("field") == "Commission").collect():
        got.setdefault(r["sid"], {})[r["date"]] = round(r["value"] or 0, 9)
    got = {sid: [v[d] for d in dates] for sid, v in got.items()}
    # reference golden :1496-1506: the floored 0.01 on each entry day
    assert got == {"FI12345": [0.0, 0.01, 0.0],
                   "FI23456": [0.0, 0.0, 0.01]}


def test_once_a_day_commission_dispatch_by_group(spark):
    """reference test_commissions.py:1525-1767: per-(sectype, exchange,
    currency) commission dispatch on a once-a-day intraday strategy —
    the TSEJ stock pays 1 bps, the OSE future 2 bps, each on its own
    entry day."""
    from moonshot_spark.commission.base import PercentageCommission

    dates = [datetime.date(2018, 5, d) for d in (1, 2, 3)]
    closes = {"FI12345": [9.6, 10.45, 10.12, 15.45, 8.67, 12.30],
              "FI23456": [10.56, 12.01, 10.50, 9.80, 13.40, 14.50]}
    opens = {"FI12345": [9.88, 10.34, 10.23, 16.45, 8.90, 11.30],
             "FI23456": [9.89, 11.0, 8.50, 10.50, 14.10, 15.0]}
    rows = []
    for sid in closes:
        i = 0
        for d in dates:
            for t in ["09:30:00", "15:30:00"]:
                rows.append((sid, d, t, closes[sid][i], opens[sid][i]))
                i += 1
    prices = spark.createDataFrame(
        rows, "sid string, date date, time string, close double, open double")
    master = spark.createDataFrame(
        [("FI12345", "ABC", "STK", "JPY", "TSEJ", "Asia/Tokyo", 1.0, 1.0),
         ("FI23456", "DEF", "FUT", "JPY", "OSE", "Asia/Tokyo", None, None)],
        "sid string, symbol string, sec_type string, currency string, "
        "exchange string, timezone string, price_magnifier double, "
        "multiplier double")

    class TsejCommission(PercentageCommission):
        BROKER_COMMISSION_RATE = 0.0001

    class OseCommission(PercentageCommission):
        BROKER_COMMISSION_RATE = 0.0002

    class ShortAbove10Intraday(Moonshot):
        POSITIONS_CLOSED_DAILY = True
        COMMISSION_CLASS = {
            ("STK", "TSEJ", "JPY"): TsejCommission,
            ("FUT", "OSE", "JPY"): OseCommission,
        }

        def prices_to_signals(self, p):
            morning = p.where(F.col("time") == "09:30:00").drop("time")
            return morning.withColumn(
                "signal", -(F.col("open") > 10).cast("int"))

        def signals_to_target_weights(self, signals):
            return self.allocate_fixed_weights(signals, 0.25)

        def target_weights_to_positions(self, weights):
            return weights.withColumn("position", F.col("weight"))

    results = ShortAbove10Intraday().backtest(prices, master=master)
    got = {}
    for r in results.where(F.col("field") == "Commission").collect():
        got.setdefault(r["sid"], {})[r["date"]] = round(r["value"] or 0, 9)
    got = {sid: [v[d] for d in dates] for sid, v in got.items()}
    # goldens :1737-1747
    assert got == {"FI12345": [0.0, 0.00005, 0.0],
                   "FI23456": [0.0, 0.0, 0.0001]}


def test_continuous_intraday_min_commission_floor_with_nlv(spark, intraday_prices):
    """reference test_commissions.py:2061-2355: continuous intraday with
    NLV — the 500/25K = 0.02 floor binds on every bar with turnover."""
    from moonshot_spark.commission.base import PercentageCommission

    master = spark.createDataFrame(
        [("FI12345", "ABC", "STK", "USD", "America/New_York", None, None),
         ("FI23456", "DEF", "STK", "USD", "America/New_York", None, None)],
        "sid string, symbol string, sec_type string, currency string, "
        "timezone string, price_magnifier double, multiplier double")

    class TestCommission(PercentageCommission):
        BROKER_COMMISSION_RATE = 0.0001
        EXCHANGE_FEE_RATE = 0
        MIN_COMMISSION = 500

    class WithFloor(LongShortIntraday):
        COMMISSION_CLASS = TestCommission
        NLV = {"USD": 25000.0}

    results = WithFloor().backtest(intraday_prices, master=master)
    assert field_dict(results, "Commission") == {
        "FI12345": [None, 0.02, 0.02, 0.0, 0.0, 0.02],
        "FI23456": [None, 0.02, 0.0, 0.0, 0.02, 0.02]}


def test_eod_futures_commission_with_multiplier(spark):
    """reference test_commissions.py:2657-2800: per-contract futures
    commission over contract value = price * multiplier."""
    from moonshot_spark.commission.fut import FuturesCommission

    dates = [datetime.date(2018, 5, d) for d in (1, 2, 3, 4)]
    closes = [900.0, 1100.0, 1050.0, 999.0]
    rows = [(sid, d, c) for sid in ("FI12345", "FI23456")
            for d, c in zip(dates, closes, strict=True)]
    prices = spark.createDataFrame(rows, "sid string, date date, close double")
    master = spark.createDataFrame(
        [("FI12345", "HE", "FUT", "USD", "America/Chicago", 1.0, 10.0),
         ("FI23456", "HE", "FUT", "USD", "America/Chicago", None, 20.0)],
        "sid string, symbol string, sec_type string, currency string, "
        "timezone string, price_magnifier double, multiplier double")

    class TestFuturesCommission(FuturesCommission):
        BROKER_COMMISSION_PER_CONTRACT = 2

    class LongShort1000(Moonshot):
        COMMISSION_CLASS = TestFuturesCommission

        def prices_to_signals(self, p):
            return p.withColumn(
                "signal", F.when(F.col("close") <= 1000, 1).otherwise(-1))

    results = LongShort1000().backtest(prices, master=master)
    got = {}
    for r in results.where(F.col("field") == "Commission").collect():
        v = r["value"]
        got.setdefault(r["sid"], {})[r["date"]] = (
            None if v is None or (isinstance(v, float) and math.isnan(v))
            else round(v, 7))
    got = {sid: [v[d] for d in dates] for sid, v in got.items()}
    # goldens :2790-2800: per-contract 2 / (price * multiplier) * turnover;
    # FI23456's doubled multiplier halves the rate
    assert got == {
        "FI12345": [None, 0.0000909, 0.0001905, 0.0],
        "FI23456": [None, 0.0000455, 0.0000952, 0.0]}


def test_caps_vs_commission_first_bar_divergence(spark):
    """The reference prices caps and commissions from DIFFERENT daily
    frames (base.py:943-949 vs :852-854): caps use the cross-day-ffilled
    value at the panel-GLOBAL earliest time; commissions use each day's
    first NON-NULL value with no ffill.  With day 2's 09:30 close NULL,
    caps see yesterday's 15:30 close (20, ffilled) while commissions see
    day 2's 15:30 close (24, first non-null) — a single shared frame
    cannot produce both."""
    from moonshot_spark.commission.stk import PerShareCommission

    dates = [datetime.date(2018, 5, 1), datetime.date(2018, 5, 2)]
    rows = [("S1", dates[0], "09:30:00", 10.0),
            ("S1", dates[0], "15:30:00", 20.0),
            ("S1", dates[1], "09:30:00", None),
            ("S1", dates[1], "15:30:00", 24.0)]
    prices = spark.createDataFrame(
        rows, "sid string, date date, time string, close double")
    master = spark.createDataFrame(
        [("S1", "AAA", "STK", "USD", "America/New_York", None, None)],
        "sid string, symbol string, sec_type string, currency string, "
        "timezone string, price_magnifier double, multiplier double")

    class PerShare(PerShareCommission):
        BROKER_COMMISSION_PER_SHARE = 0.01

    class Diverge(Moonshot):
        NLV = {"USD": 100000.0}
        COMMISSION_CLASS = PerShare

        def prices_to_signals(self, p):
            late = p.where(F.col("time") == "15:30:00").drop("time")
            return late.withColumn("signal", F.lit(1))

        def signals_to_target_weights(self, signals):
            return self.allocate_fixed_weights(signals, 0.5)

        def limit_position_sizes(self, p):
            caps = p.sparkSession.createDataFrame(
                [("S1", d, 100) for d in dates],
                "sid string, date date, max_quantity long")
            return caps, None

    results = Diverge().backtest(prices, master=master)
    got = {(r["field"], r["date"]): r["value"] for r in results.collect()}
    # caps: ffilled cv at the global earliest bar — day2 09:30 is NULL so
    # the ffill carries day1's 15:30 close (20): 100*20/100K
    assert got[("Weight", dates[0])] == pytest.approx(0.01)
    assert got[("Weight", dates[1])] == pytest.approx(0.02)
    # commission day2: turnover |0.01| priced at day2's first NON-NULL
    # close (24, no ffill — NOT the caps frame's 20)
    assert got[("Commission", dates[1])] == pytest.approx(0.01 / 24 * 0.01)
