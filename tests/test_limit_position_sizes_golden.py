"""The reference's full limit-position-sizes golden matrix, ported case
by case from /root/reference/moonshot/_tests/test_limit_position_sizes.py
(16 test methods: 9 backtest-path, 7 trade-path).  Every expected number
below is the reference's own assertDictEqual golden, reproduced against
the Spark engine (strategies/base.py:321 _constrain_weights)."""

import datetime
import math

import pytest
from pyspark.sql import functions as F

from moonshot_spark import Moonshot
from moonshot_spark.exceptions import MoonshotParameterError

DATES = [datetime.date(2018, 5, d) for d in (1, 2, 3)]


class LongShort10(Moonshot):
    """Buys <=10, shorts >10 (reference's BuyBelow10ShortAbove10Overnight)."""
    CODE = "long-short-10"

    def prices_to_signals(self, prices):
        return prices.withColumn(
            "signal", F.when(F.col("close") <= 10, 1).otherwise(-1))


@pytest.fixture(scope="module")
def cv_prices(spark):
    """Close+Volume panel (reference :274-303)."""
    data = {"FI12345": ([9.0, 11.0, 10.50], [100000, 150000, 125000]),
            "FI23456": ([9.89, 11.0, 8.50], [50000, 60000, 70000000])}
    rows = [(sid, d, c, float(v)) for sid, (cs, vs) in data.items()
            for d, c, v in zip(DATES, cs, vs, strict=True)]
    return spark.createDataFrame(
        rows, "sid string, date date, close double, volume double")


@pytest.fixture(scope="module")
def stk_master(spark):
    return spark.createDataFrame(
        [("FI12345", "ABC", "STK", "USD", "America/New_York", None, None),
         ("FI23456", "DEF", "STK", "USD", "America/New_York", None, None)],
        "sid string, symbol string, sec_type string, currency string, "
        "timezone string, price_magnifier double, multiplier double")


def weight_lists(results, field="Weight", ndp=9):
    rows = results.where(F.col("field") == field).collect()
    out = {}
    for r in rows:
        v = r["value"]
        out.setdefault(r["sid"], {})[r["date"]] = (
            None if v is None or (isinstance(v, float) and math.isnan(v))
            else round(v, ndp))
    return {sid: [vals[d] for d in DATES] for sid, vals in out.items()}


def caps_df(spark, per_sid, dates=DATES):
    rows = [(sid, d, q) for sid, qs in per_sid.items()
            for d, q in zip(dates, qs, strict=True)]
    return spark.createDataFrame(
        rows, "sid string, date date, max_quantity long")


# --------------------------------------------------------------------- #
# backtest-path cases (reference :36-1303)                              #
# --------------------------------------------------------------------- #

def test_complain_if_limit_position_sizes_no_nlv(cv_prices):
    """reference :36-121: caps implemented but no NLV -> error."""
    class Limited(LongShort10):
        def limit_position_sizes(self, prices):
            spark = prices.sparkSession
            caps = caps_df(spark, {"FI12345": [100] * 3, "FI23456": [100] * 3})
            return caps, caps

    with pytest.raises(MoonshotParameterError,
                       match="must provide NLVs if using limit_position_sizes"):
        Limited().backtest(cv_prices)


def test_no_limit_position_sizes_backtest(cv_prices):
    """reference :123-247: without caps, equal weights +/-0.5 pass through."""
    results = LongShort10().backtest(cv_prices)
    assert weight_lists(results) == {
        "FI12345": [0.5, -0.5, -0.5],
        "FI23456": [0.5, -0.5, 0.5]}


def test_limit_position_sizes_by_volume(cv_prices, stk_master):
    """reference :247-389: caps = round(volume * 1%), NLV 50K."""
    class Limited(LongShort10):
        NLV = {"USD": 50000.0}

        def limit_position_sizes(self, prices):
            caps = (prices.select(
                "sid", "date",
                F.round(F.col("volume") * 0.01).cast("long")
                .alias("max_quantity")))
            return caps, caps

    results = Limited().backtest(cv_prices, master=stk_master)
    sig = weight_lists(results, "Signal")
    assert sig == {"FI12345": [1.0, -1.0, -1.0], "FI23456": [1.0, -1.0, 1.0]}
    # golden weights at reference :367-388
    assert weight_lists(results) == {
        "FI12345": [0.18,       # 100K * 1% * 9 / 50K
                    -0.33,      # 150K * 1% * 11 / 50K
                    -0.2625],   # 125K * 1% * 10.50 / 50K
        "FI23456": [0.0989,     # 50K * 1% * 9.89 / 50K
                    -0.132,     # 60K * 1% * 11 / 50K
                    0.49997]}   # uncapped: round(25K/8.50)*8.50/50K


def test_limit_position_sizes_once_a_day_intraday(spark, stk_master):
    """reference :389-550: daily cap frames sliced from the 09:30 bar,
    longs 300 / shorts 600, NLV 100K."""
    closes = {"FI12345": [9.6, 10.45, 10.12, 15.45, 8.67, 12.30],
              "FI23456": [10.56, 12.01, 8.50, 9.80, 13.40, 14.50]}
    times = ["09:30:00", "15:30:00"]
    rows = []
    for sid, vals in closes.items():
        i = 0
        for d in DATES:
            for t in times:
                rows.append((sid, d, t, float(vals[i])))
                i += 1
    prices = spark.createDataFrame(
        rows, "sid string, date date, time string, close double")

    class OnceADay(Moonshot):
        NLV = {"USD": 100000.0}

        def prices_to_signals(self, p):
            morning = p.where(F.col("time") == "09:30:00").drop("time")
            return morning.withColumn(
                "signal", F.when(F.col("close") < 10, 1).otherwise(-1))

        def signals_to_target_weights(self, signals):
            return self.allocate_fixed_weights(signals, 0.5)

        def limit_position_sizes(self, p):
            morning = p.where(F.col("time") == "09:30:00")
            longs = morning.select(
                "sid", "date", F.lit(300).cast("long").alias("max_quantity"))
            shorts = morning.select(
                "sid", "date", F.lit(600).cast("long").alias("max_quantity"))
            return longs, shorts

    results = OnceADay().backtest(prices, master=stk_master)
    assert weight_lists(results, "Signal") == {
        "FI12345": [1.0, -1.0, 1.0], "FI23456": [-1.0, 1.0, -1.0]}
    # golden weights at reference :526-549
    assert weight_lists(results) == {
        "FI12345": [0.0288,                  # 300 * 9.6 / 100K
                    -0.06072,                # 600 * 10.12 / 100K
                                             # (ref golden -0.06071999..., 9dp)
                    0.02601],                # 300 * 8.67 / 100K
        "FI23456": [-0.06336,                # 600 * 10.56 / 100K
                    0.0255,                  # 300 * 8.5 / 100K
                    -0.0804]}                # 600 * 13.40 / 100K


def test_limit_position_sizes_continuous_intraday(spark, stk_master):
    """reference :550-690: caps per (date, time) bar, NLV 100K."""
    dates2 = DATES[:2]
    times = ["10:00:00", "11:00:00", "12:00:00"]
    closes = {"FI12345": [9.6, 10.45, 10.12, 15.45, 8.67, 12.30],
              "FI23456": [10.56, 12.01, 10.50, 9.80, 13.40, 7.50]}
    rows = []
    for sid, vals in closes.items():
        i = 0
        for d in dates2:
            for t in times:
                rows.append((sid, d, t, float(vals[i])))
                i += 1
    prices = spark.createDataFrame(
        rows, "sid string, date date, time string, close double")

    class ContIntraday(LongShort10):
        NLV = {"USD": 100000.0}

        def limit_position_sizes(self, p):
            longs = p.select("sid", "date", "time",
                             F.lit(300).cast("long").alias("max_quantity"))
            shorts = p.select("sid", "date", "time",
                              F.lit(600).cast("long").alias("max_quantity"))
            return longs, shorts

    results = ContIntraday().backtest(prices, master=stk_master)
    got = {}
    for r in results.where(F.col("field") == "Weight").collect():
        got.setdefault(r["sid"], {})[(r["date"], r["time"])] = round(
            r["value"], 7)
    keys = [(d, t) for d in dates2 for t in times]
    got = {sid: [vals[k] for k in keys] for sid, vals in got.items()}
    # golden weights at reference :661-689 (rounded to 7dp as reference does)
    assert got == {
        "FI12345": [0.0288, -0.0627, -0.06072, -0.0927, 0.02601, -0.0738],
        "FI23456": [-0.06336, -0.07206, -0.063, 0.0294, -0.0804, 0.0225]}


def test_limit_short_position_sizes_only(cv_prices, stk_master):
    """reference :690-832: shorts capped by volume, longs unconstrained."""
    class Limited(LongShort10):
        NLV = {"USD": 50000.0}

        def limit_position_sizes(self, prices):
            shorts = (prices.select(
                "sid", "date",
                F.round(F.col("volume") * 0.01).cast("long")
                .alias("max_quantity")))
            return None, shorts

    results = Limited().backtest(cv_prices, master=stk_master)
    # golden weights at reference :808-831
    assert weight_lists(results) == {
        "FI12345": [0.50004,     # uncapped long: round(25K/9)*9/50K
                    -0.33,       # 150K * 1% * 11 / 50K
                    -0.2625],    # 125K * 1% * 10.50 / 50K
        "FI23456": [0.5000384,   # uncapped long: round(25K/9.89)*9.89/50K
                    -0.132,      # 60K * 1% * 11 / 50K
                    0.49997]}    # uncapped long


def test_ignore_nans(cv_prices, stk_master):
    """reference :832-986: NaN/None caps = no limit that day."""
    class Limited(LongShort10):
        NLV = {"USD": 50000.0}

        def limit_position_sizes(self, prices):
            spark = prices.sparkSession
            caps = caps_df(spark, {"FI12345": [300, None, None],
                                   "FI23456": [None, 400, None]})
            return caps, caps

    results = Limited().backtest(cv_prices, master=stk_master)
    # golden weights at reference :959-985
    assert weight_lists(results) == {
        "FI12345": [0.054,       # 300 * 9 / 50K
                    -0.50006,    # no cap: round(25K/11)*11/50K
                    -0.50001],   # no cap: round(25K/10.5)*10.5/50K
        "FI23456": [0.5000384,   # no cap
                    -0.088,      # 400 * 11 / 50K
                    0.49997]}    # no cap


def test_limit_position_sizes_fx(cv_prices, spark):
    """reference :986-1147: CASH contract value is 1 and caps consume the
    NLV of the pair's BASE currency (EUR for EUR.USD), not the
    settlement currency."""
    fx_master = spark.createDataFrame(
        [("FI12345", "EUR", "CASH", "USD", "America/New_York", None, None),
         ("FI23456", "ABC", "STK", "USD", "America/New_York", None, None)],
        "sid string, symbol string, sec_type string, currency string, "
        "timezone string, price_magnifier double, multiplier double")

    class Limited(LongShort10):
        NLV = {"USD": 50000.0, "EUR": 35000.0}

        def limit_position_sizes(self, prices):
            spark_ = prices.sparkSession
            caps = caps_df(spark_, {"FI12345": [300, 400, 500],
                                    "FI23456": [300, 400, 500]})
            return caps, caps

    results = Limited().backtest(cv_prices, master=fx_master)
    # golden weights at reference :1122-1146
    assert weight_lists(results) == {
        "FI12345": [round(300 / 35000, 9),     # 300 EUR / 35K EUR
                    round(-400 / 35000, 9),
                    round(-500 / 35000, 9)],
        "FI23456": [0.05934,                   # 300 * 9.89 / 50K USD
                    -0.088,                    # 400 * 11 / 50K
                    0.085]}                    # 500 * 8.5 / 50K


def test_price_magnifier_and_multiplier(cv_prices, spark):
    """reference :1147-1303: caps respect contract value =
    price / magnifier * multiplier."""
    fut_master = spark.createDataFrame(
        [("FI12345", "ABC", "FUT", "USD", "America/Chicago", None, 20.0),
         ("FI23456", "DEF", "FUT", "USD", "America/Chicago", 10.0, 50.0)],
        "sid string, symbol string, sec_type string, currency string, "
        "timezone string, price_magnifier double, multiplier double")

    class Limited(LongShort10):
        NLV = {"USD": 500000.0}

        def limit_position_sizes(self, prices):
            spark_ = prices.sparkSession
            caps = caps_df(spark_, {"FI12345": [30, 40, 50],
                                    "FI23456": [30, 40, 50]})
            return caps, caps

    results = Limited().backtest(cv_prices, master=fut_master)
    # golden weights at reference :1277-1302
    assert weight_lists(results) == {
        "FI12345": [0.0108,                    # 30 * 20 * 9 / 500K
                    -0.0176,                   # 40 * 20 * 11 / 500K
                    -0.021],                   # 50 * 20 * 10.50 / 500K
        "FI23456": [0.002967,                  # 30 * 50/10 * 9.89 / 500K
                    round(-0.004400000000000001, 9),
                    0.00425]}                  # 50 * 50/10 * 8.5 / 500K


# --------------------------------------------------------------------- #
# trade-path cases (reference :1303-2368)                               #
# --------------------------------------------------------------------- #

TRADE_DATES = [datetime.date(2024, 6, d) for d in (3, 4, 5)]


class LongShort10Trade(LongShort10):
    def _now(self, tz):
        import pandas as pd
        return pd.Timestamp("2024-06-05 16:00:00", tz=tz)


@pytest.fixture(scope="module")
def trade_prices(spark):
    closes = {"FI12345": [9.0, 11.0, 10.50], "FI23456": [9.89, 11.0, 8.50]}
    rows = [(sid, d, c) for sid, cs in closes.items()
            for d, c in zip(TRADE_DATES, cs, strict=True)]
    return spark.createDataFrame(rows, "sid string, date date, close double")


@pytest.fixture(scope="module")
def trade_master(spark):
    return spark.createDataFrame(
        [("FI12345", "ABC", "STK", "USD", "America/New_York", None, None),
         ("FI23456", "DEF", "STK", "USD", "America/New_York", None, None)],
        "sid string, symbol string, sec_type string, currency string, "
        "timezone string, price_magnifier double, multiplier double")


@pytest.fixture(scope="module")
def balances60(spark):
    return spark.createDataFrame(
        [("U123", "USD", 60000.0)],
        "account string, currency string, net_liquidation double")


def order_map(orders):
    return {r["sid"]: (r["action"], r["total_quantity"])
            for r in orders.collect()}


def trade_caps(spark, per_sid, dates=TRADE_DATES):
    rows = [(sid, d, q) for sid, qs in per_sid.items()
            for d, q in zip(dates, qs, strict=True)]
    return spark.createDataFrame(
        rows, "sid string, date date, max_quantity long")


def test_trade_no_limit_position_sizes(trade_prices, trade_master, balances60):
    """reference :1303-1436: uncapped orders SELL 2857 / BUY 3529."""
    orders = LongShort10Trade().trade(
        trade_prices, {"U123": 1.0}, balances60, master=trade_master)
    assert order_map(orders) == {
        "FI12345": ("SELL", 2857),   # 0.5 * 60K / 10.50
        "FI23456": ("BUY", 3529)}    # 0.5 * 60K / 8.50


def test_trade_limit_position_sizes(trade_prices, trade_master, balances60):
    """reference :1436-1584: signal-date caps bind -> SELL 1350 / BUY 2199."""
    class Limited(LongShort10Trade):
        def limit_position_sizes(self, p):
            caps = trade_caps(p.sparkSession,
                              {"FI12345": [1200, 1200, 1350],
                               "FI23456": [2300, 2300, 2199]})
            return caps, caps

    orders = Limited().trade(
        trade_prices, {"U123": 1.0}, balances60, master=trade_master)
    assert order_map(orders) == {
        "FI12345": ("SELL", 1350), "FI23456": ("BUY", 2199)}


def test_trade_limit_short_position_sizes_only(trade_prices, trade_master,
                                               balances60):
    """reference :1584-1732: short capped 1350, long uncapped 3529."""
    class Limited(LongShort10Trade):
        def limit_position_sizes(self, p):
            caps = trade_caps(p.sparkSession,
                              {"FI12345": [1200, 1200, 1350],
                               "FI23456": [2300, 2300, 2199]})
            return None, caps

    orders = Limited().trade(
        trade_prices, {"U123": 1.0}, balances60, master=trade_master)
    assert order_map(orders) == {
        "FI12345": ("SELL", 1350), "FI23456": ("BUY", 3529)}


def test_trade_ignore_nans(spark, balances60):
    """reference :1732-1910: NaN/None caps on the signal date = no limit."""
    closes = {"FI12345": [9.0, 11.0, 10.50], "FI23456": [9.89, 11.0, 8.50],
              "FI34567": [9.99, 10.0, 10.50]}
    rows = [(sid, d, c) for sid, cs in closes.items()
            for d, c in zip(TRADE_DATES, cs, strict=True)]
    prices = spark.createDataFrame(rows, "sid string, date date, close double")
    master = spark.createDataFrame(
        [("FI12345", "ABC", "STK", "USD", "America/New_York", None, None),
         ("FI23456", "DEF", "STK", "USD", "America/New_York", None, None),
         ("FI34567", "GHI", "STK", "USD", "America/New_York", None, None)],
        "sid string, symbol string, sec_type string, currency string, "
        "timezone string, price_magnifier double, multiplier double")

    class Limited(LongShort10Trade):
        def limit_position_sizes(self, p):
            caps = trade_caps(p.sparkSession,
                              {"FI12345": [1200, 1200, 1450],
                               "FI23456": [2300, 2300, None],
                               "FI34567": [None, 500, None]})
            return caps, caps

    orders = Limited().trade(prices, {"U123": 1.0}, balances60, master=master)
    # goldens at reference :1875-1909
    assert order_map(orders) == {
        "FI12345": ("SELL", 1450),   # limited
        "FI23456": ("BUY", 2353),    # 1/3 * 60K / 8.50, no cap
        "FI34567": ("SELL", 1905)}   # 1/3 * 60K / 10.50, NaN = no cap


def test_trade_limit_with_existing_position(spark, trade_prices, trade_master,
                                            balances60):
    """reference :1910-2069: cap applies to the TARGET position, the
    order is target - existing (2199 - 400 = 1799)."""
    class Limited(LongShort10Trade):
        def limit_position_sizes(self, p):
            caps = trade_caps(p.sparkSession,
                              {"FI12345": [1200, 1200, 1350],
                               "FI23456": [2300, 2300, 2199]})
            return caps, caps

    positions = spark.createDataFrame(
        [("FI23456", "U123", 400)],
        "sid string, account string, quantity long")
    orders = Limited().trade(trade_prices, {"U123": 1.0}, balances60,
                             positions=positions, master=trade_master)
    assert order_map(orders) == {
        "FI12345": ("SELL", 1350), "FI23456": ("BUY", 1799)}


def test_trade_once_a_day_intraday(spark, trade_master, balances60):
    """reference :2069-2221: signals+caps from the 09:30 slice ->
    BUY 300 / SELL 600 on the review day."""
    closes = {"FI12345": [9.6, 10.45, 10.12, 15.45, 8.67, 12.30],
              "FI23456": [10.56, 12.01, 8.50, 9.80, 13.40, 14.50]}
    times = ["09:30:00", "15:30:00"]
    rows = []
    for sid, vals in closes.items():
        i = 0
        for d in TRADE_DATES:
            for t in times:
                rows.append((sid, d, t, float(vals[i])))
                i += 1
    prices = spark.createDataFrame(
        rows, "sid string, date date, time string, close double")

    class OnceADay(Moonshot):
        CODE = "long-short-10"

        def prices_to_signals(self, p):
            morning = p.where(F.col("time") == "09:30:00").drop("time")
            return morning.withColumn(
                "signal", F.when(F.col("close") < 10, 1).otherwise(-1))

        def signals_to_target_weights(self, signals):
            return self.allocate_fixed_weights(signals, 0.5)

        def limit_position_sizes(self, p):
            morning = p.where(F.col("time") == "09:30:00")
            longs = morning.select(
                "sid", "date", F.lit(300).cast("long").alias("max_quantity"))
            shorts = morning.select(
                "sid", "date", F.lit(600).cast("long").alias("max_quantity"))
            return longs, shorts

    orders = OnceADay().trade(prices, {"U123": 1.0}, balances60,
                              master=trade_master,
                              review_date="2024-06-05 10:00:00")
    # day-3 09:30 closes: FI12345 8.67 -> long, FI23456 13.40 -> short
    assert order_map(orders) == {
        "FI12345": ("BUY", 300), "FI23456": ("SELL", 600)}


def test_trade_continuous_intraday(spark, trade_master, balances60):
    """reference :2221-2368: review 12:05 -> the 12:00 bar's signals and
    caps -> SELL 600 / BUY 300."""
    dates2 = TRADE_DATES[:2]
    times = ["10:00:00", "11:00:00", "12:00:00"]
    closes = {"FI12345": [9.6, 10.45, 10.12, 15.45, 8.67, 12.30],
              "FI23456": [10.56, 12.01, 10.50, 9.80, 13.40, 7.50]}
    rows = []
    for sid, vals in closes.items():
        i = 0
        for d in dates2:
            for t in times:
                rows.append((sid, d, t, float(vals[i])))
                i += 1
    prices = spark.createDataFrame(
        rows, "sid string, date date, time string, close double")

    class ContIntraday(LongShort10):
        def limit_position_sizes(self, p):
            longs = p.select("sid", "date", "time",
                             F.lit(300).cast("long").alias("max_quantity"))
            shorts = p.select("sid", "date", "time",
                              F.lit(600).cast("long").alias("max_quantity"))
            return longs, shorts

    orders = ContIntraday().trade(prices, {"U123": 1.0}, balances60,
                                  master=trade_master,
                                  review_date="2024-06-04 12:05:00")
    # day-2 12:00 closes: FI12345 12.30 -> short, FI23456 7.50 -> long
    assert order_map(orders) == {
        "FI12345": ("SELL", 600), "FI23456": ("BUY", 300)}
