"""Commission and slippage model tests, golden semantics from the reference
(_tests/test_commissions.py, _tests/test_slippage.py)."""

import datetime
import math

import pytest
from pyspark.sql import functions as F

from moonshot_spark import Moonshot
from moonshot_spark.commission.base import PercentageCommission
from moonshot_spark.commission.fut import FuturesCommission
from moonshot_spark.commission.stk import PerShareCommission
from moonshot_spark.slippage.borrowfee import BorrowFees
from moonshot_spark.slippage.fixed import FixedSlippage

DATES = [datetime.date(2018, 5, d) for d in (1, 2, 3, 4)]


class BuyBelow10(Moonshot):
    def prices_to_signals(self, prices):
        return prices.withColumn("signal", (F.col("close") < 10).cast("int"))


@pytest.fixture(scope="module")
def prices(spark):
    closes = {"FI12345": [9, 11, 10.50, 9.99], "FI23456": [9.89, 11, 8.50, 10.50]}
    rows = [(sid, d, float(c)) for sid, cs in closes.items()
            for d, c in zip(DATES, cs, strict=True)]
    return spark.createDataFrame(rows, "sid string, date date, close double")


def field_map(results, field):
    rows = results.where(F.col("field") == field).collect()
    out = {}
    for r in rows:
        v = r["value"]
        out[(r["sid"], r["date"])] = (None if v is None or
                                      (isinstance(v, float) and math.isnan(v))
                                      else round(v, 9))
    return out


def test_percentage_commission(prices):
    class TestCommission(PercentageCommission):
        BROKER_COMMISSION_RATE = 0.001
        EXCHANGE_FEE_RATE = 0.0001

    class Strategy(BuyBelow10):
        COMMISSION_CLASS = TestCommission

    results = Strategy().backtest(prices)
    commissions = field_map(results, "Commission")
    turnovers = field_map(results, "Turnover")
    for key, t in turnovers.items():
        expected = None if t is None else round(t * 0.0011, 9)
        assert commissions[key] == expected


def test_tiered_percentage_commission(prices):
    """Tier blending: (1-r2)·rate + r2·rate2 (commission/base.py:157-163)."""
    class Tiered(PercentageCommission):
        BROKER_COMMISSION_RATE = 0.001
        BROKER_COMMISSION_RATE_TIER_2 = 0.0005
        TIER_2_RATIO = 0.4

    class Strategy(BuyBelow10):
        COMMISSION_CLASS = Tiered

    results = Strategy().backtest(prices)
    commissions = field_map(results, "Commission")
    turnovers = field_map(results, "Turnover")
    rate = 0.6 * 0.001 + 0.4 * 0.0005
    for key, t in turnovers.items():
        expected = None if t is None else round(t * rate, 9)
        assert commissions[key] == expected


def test_min_commission_floor(spark, prices):
    """MIN_COMMISSION floor as fraction of NLV (commission/base.py:57-66)."""
    class WithMin(PercentageCommission):
        BROKER_COMMISSION_RATE = 0.0001
        MIN_COMMISSION = 100.0

    class Strategy(BuyBelow10):
        COMMISSION_CLASS = WithMin
        NLV = {"USD": 100000.0}

    master = spark.createDataFrame(
        [("FI12345", "ABC", "STK", "USD", "NYSE", "UTC", None, None),
         ("FI23456", "DEF", "STK", "USD", "NYSE", "UTC", None, None)],
        "sid string, symbol string, sec_type string, currency string, "
        "exchange string, timezone string, price_magnifier double, multiplier double")
    results = Strategy().backtest(prices, master=master)
    commissions = field_map(results, "Commission")
    turnovers = field_map(results, "Turnover")
    floor = 100.0 / 100000.0
    for key, t in turnovers.items():
        if t is None:
            assert commissions[key] is None
        elif t > 0:
            raw = t * 0.0001
            assert commissions[key] == round(max(raw, floor), 9)
        else:
            assert commissions[key] == 0.0


def test_per_share_commission(spark, prices):
    """PerShare: rate = per-share / |contract value| (stk.py:170-176)."""
    class PerShare(PerShareCommission):
        BROKER_COMMISSION_PER_SHARE = 0.005

    class Strategy(BuyBelow10):
        COMMISSION_CLASS = PerShare

    results = Strategy().backtest(prices)
    commissions = field_map(results, "Commission")
    turnovers = field_map(results, "Turnover")
    closes = {("FI12345", DATES[i]): c for i, c in enumerate([9, 11, 10.50, 9.99])}
    closes |= {("FI23456", DATES[i]): c for i, c in enumerate([9.89, 11, 8.50, 10.50])}
    for key, t in turnovers.items():
        expected = None if t is None else round(0.005 / closes[key] * t, 9)
        assert commissions[key] == expected


def test_futures_commission(spark, prices):
    class Fut(FuturesCommission):
        BROKER_COMMISSION_PER_CONTRACT = 0.85
        EXCHANGE_FEE_PER_CONTRACT = 1.18

    class Strategy(BuyBelow10):
        COMMISSION_CLASS = Fut

    master = spark.createDataFrame(
        [("FI12345", "ABC", "FUT", "USD", "CME", "UTC", None, 50.0),
         ("FI23456", "DEF", "FUT", "USD", "CME", "UTC", None, 50.0)],
        "sid string, symbol string, sec_type string, currency string, "
        "exchange string, timezone string, price_magnifier double, multiplier double")
    results = Strategy().backtest(prices, master=master)
    commissions = field_map(results, "Commission")
    turnovers = field_map(results, "Turnover")
    closes = {("FI12345", DATES[i]): c for i, c in enumerate([9, 11, 10.50, 9.99])}
    closes |= {("FI23456", DATES[i]): c for i, c in enumerate([9.89, 11, 8.50, 10.50])}
    for key, t in turnovers.items():
        expected = None if t is None else round(2.03 / (closes[key] * 50) * t, 9)
        assert commissions[key] == expected


def test_commission_dispatch_by_sec_group(spark, prices):
    """D14: per-(sectype,exchange,currency) commission dispatch."""
    class RateA(PercentageCommission):
        BROKER_COMMISSION_RATE = 0.001

    class RateB(PercentageCommission):
        BROKER_COMMISSION_RATE = 0.01

    class Strategy(BuyBelow10):
        COMMISSION_CLASS = {
            ("STK", "NYSE", "USD"): RateA,
            ("STK", "TSE", "JPY"): RateB,
        }

    master = spark.createDataFrame(
        [("FI12345", "ABC", "STK", "USD", "NYSE", "UTC", None, None),
         ("FI23456", "DEF", "STK", "JPY", "TSE", "UTC", None, None)],
        "sid string, symbol string, sec_type string, currency string, "
        "exchange string, timezone string, price_magnifier double, multiplier double")
    results = Strategy().backtest(prices, master=master)
    commissions = field_map(results, "Commission")
    turnovers = field_map(results, "Turnover")
    for (sid, d), t in turnovers.items():
        rate = 0.001 if sid == "FI12345" else 0.01
        expected = None if t is None else round(t * rate, 9)
        assert commissions[(sid, d)] == expected


def test_commission_dispatch_missing_group_raises(spark, prices):
    from moonshot_spark.strategies.base import MoonshotParameterError

    class RateA(PercentageCommission):
        BROKER_COMMISSION_RATE = 0.001

    class Strategy(BuyBelow10):
        COMMISSION_CLASS = {("STK", "NYSE", "USD"): RateA}

    master = spark.createDataFrame(
        [("FI12345", "ABC", "STK", "USD", "NYSE", "UTC", None, None),
         ("FI23456", "DEF", "STK", "JPY", "TSE", "UTC", None, None)],
        "sid string, symbol string, sec_type string, currency string, "
        "exchange string, timezone string, price_magnifier double, multiplier double")
    with pytest.raises(MoonshotParameterError, match="TSE"):
        Strategy().backtest(prices, master=master).collect()


def test_slippage_bps(prices):
    class Strategy(BuyBelow10):
        SLIPPAGE_BPS = 5

    results = Strategy().backtest(prices)
    slippages = field_map(results, "Slippage")
    turnovers = field_map(results, "Turnover")
    for key, t in turnovers.items():
        # _get_slippage fillna(0) (base.py:919): NULL turnover → 0 slippage
        expected = 0.0 if t is None else round(t * 0.0005, 9)
        assert slippages[key] == expected


def test_slippage_classes_combine(prices):
    class Half(FixedSlippage):
        ONE_WAY_SLIPPAGE = 0.0001

    class Strategy(BuyBelow10):
        SLIPPAGE_CLASSES = (Half,)
        SLIPPAGE_BPS = 1

    results = Strategy().backtest(prices)
    slippages = field_map(results, "Slippage")
    turnovers = field_map(results, "Turnover")
    for key, t in turnovers.items():
        expected = 0.0 if t is None else round(t * 0.0002, 9)
        assert slippages[key] == expected


def test_borrow_fees(spark):
    """D13: short positions pay fee × 1.02 × days/360 (borrowfee.py:37-59)."""
    class ShortAll(Moonshot):
        SLIPPAGE_CLASSES = (BorrowFees(),)

        def prices_to_signals(self, prices):
            return prices.withColumn("signal", F.lit(-1))

    rows = [("S1", d, 100.0, 6.0) for d in DATES]
    prices = spark.createDataFrame(
        rows, "sid string, date date, close double, borrow_fee double")
    results = ShortAll().backtest(prices)
    slippages = field_map(results, "Slippage")
    # position = -1 from day 2 (shift); fee = 1 * 1.02 * (6/100/360) * 1 day
    daily = 1.02 * 6.0 / 100 / 360
    assert slippages[("S1", DATES[0])] == 0.0
    assert slippages[("S1", DATES[1])] == round(daily, 9)
    assert slippages[("S1", DATES[2])] == round(daily, 9)


def test_positions_closed_daily(prices):
    """D6 variant: turnover = |2×positions| (base.py:708-711)."""
    class Strategy(BuyBelow10):
        POSITIONS_CLOSED_DAILY = True

    results = Strategy().backtest(prices)
    turnovers = field_map(results, "Turnover")
    positions = field_map(results, "NetExposure")
    for key, p in positions.items():
        expected = None if p is None else round(abs(p * 2), 9)
        assert turnovers[key] == expected


def test_limit_position_sizes(spark, prices):
    """D16: weights→quantities→cap→weights round trip (base.py:921-972)."""
    class Limited(BuyBelow10):
        NLV = {"USD": 100000.0}

        def limit_position_sizes(self, prices):
            spark_ = prices.sparkSession
            max_longs = spark_.createDataFrame(
                [("FI23456", d, 100) for d in DATES]
                + [("FI12345", d, None) for d in DATES],
                "sid string, date date, max_quantity long")
            return max_longs, None

    master = spark.createDataFrame(
        [("FI12345", "ABC", "STK", "USD", "NYSE", "UTC", None, None),
         ("FI23456", "DEF", "STK", "USD", "NYSE", "UTC", None, None)],
        "sid string, symbol string, sec_type string, currency string, "
        "exchange string, timezone string, price_magnifier double, multiplier double")
    results = Limited().backtest(prices, master=master)
    weights = field_map(results, "Weight")
    # day 3: FI23456 signal 1.0 → weight 1.0 → qty 100000/8.50 = 11765
    # capped at 100 → weight = 100*8.50/100000 = 0.0085
    assert weights[("FI23456", DATES[2])] == pytest.approx(100 * 8.50 / 100000)
    # FI12345 has NULL cap (no limit): day 4 weight 1.0 → qty 10010 uncapped
    # → weight = round(100000/9.99)*9.99/100000
    q = round(100000 / 9.99)
    assert weights[("FI12345", DATES[3])] == pytest.approx(q * 9.99 / 100000)


def test_save_to_results(prices):
    class Strategy(BuyBelow10):
        def prices_to_signals(self, p):
            p = p.withColumn("mavg", F.col("close") * 2)
            self.save_to_results("Mavg", "mavg")
            return p.withColumn("signal", (F.col("close") < 10).cast("int"))

    results = Strategy().backtest(prices)
    mavg = field_map(results, "Mavg")
    assert mavg[("FI12345", DATES[0])] == 18.0


def test_save_to_results_reserved_name_raises(prices):
    from moonshot_spark.strategies.base import MoonshotParameterError

    class Strategy(BuyBelow10):
        def prices_to_signals(self, p):
            self.save_to_results("Signal", "close")
            return p.withColumn("signal", F.lit(1))

    with pytest.raises(MoonshotParameterError, match="reserved"):
        Strategy().backtest(prices)


def test_benchmark_field(prices):
    class Strategy(BuyBelow10):
        BENCHMARK = "FI12345"

    results = Strategy().backtest(prices)
    bench = field_map(results, "Benchmark")
    assert bench[("FI12345", DATES[1])] == round((11 - 9) / 9, 9)
    # reference base.py:1500: ffill().pct_change().fillna(0) — first
    # benchmark return is 0.0, not NaN
    assert bench[("FI12345", DATES[0])] == 0.0


def test_external_benchmark_prices(spark, prices):
    """BENCHMARK from a separate price source (reference BENCHMARK_DB,
    base.py:1402-1500)."""
    class Strategy(BuyBelow10):
        BENCHMARK = "SPY"

    bench_prices = spark.createDataFrame(
        [("SPY", d, float(100 + i)) for i, d in enumerate(DATES)],
        "sid string, date date, close double")
    results = Strategy().backtest(prices, benchmark_prices=bench_prices)
    bench = field_map(results, "Benchmark")
    assert bench[("SPY", DATES[1])] == round(1 / 100, 9)
    assert bench[("SPY", DATES[0])] == 0.0   # fillna(0), base.py:1500


class RefStockCommission(PerShareCommission):
    """reference _tests/commission/test_commissions.py:54-62 fixture."""
    BROKER_COMMISSION_PER_SHARE = 0.0035
    EXCHANGE_FEE_PER_SHARE = 0.0003
    MAKER_FEE_PER_SHARE = -0.002
    TAKER_FEE_PER_SHARE = 0.00118
    MAKER_RATIO = 0.4
    MIN_COMMISSION = 0.35
    COMMISSION_PERCENTAGE_FEE_RATE = 0.056
    PERCENTAGE_FEE_RATE = 0.00002


def _eval_commission(spark, cls, cv, turnover, nlv):
    df = spark.createDataFrame([(float(cv), float(turnover), float(nlv))],
                               "cv double, t double, nlv double")
    return df.select(cls.commission_expr(
        F.col("cv"), F.col("t"), F.col("nlv")).alias("c")).first()["c"]


def test_maker_commissions(spark):
    """reference test_maker_commissions golden: 0.000004218."""
    class Maker(RefStockCommission):
        MAKER_RATIO = 1

    c = _eval_commission(spark, Maker, 90, 0.1, 500000)
    assert round(c, 9) == 0.000004218


def test_taker_commissions(spark):
    """reference test_taker_commissions golden: 0.000007751."""
    class Taker(RefStockCommission):
        MAKER_RATIO = 0

    c = _eval_commission(spark, Taker, 90, 0.1, 500000)
    assert round(c, 9) == 0.000007751


def test_maker_taker_commissions(spark):
    """reference test_maker_taker_commissions golden: 0.000005631."""
    class MakerTaker(RefStockCommission):
        MAKER_RATIO = 0.60

    c = _eval_commission(spark, MakerTaker, 90, 0.1, 500000)
    assert round(c, 9) == 0.000005631


def test_per_share_min_commission_with_fees(spark):
    """reference test_min_commission golden: broker min floor plus
    exchange/percentage/commission-based fees = 0.000002864."""
    turnover = 50 * 250 / 220000
    c = _eval_commission(spark, RefStockCommission, 250.0, turnover, 220000)
    assert round(c, 9) == 0.000002864


def test_benchmark_sid_missing_raises(prices):
    """reference base.py:1480-1484: unknown BENCHMARK sid errors."""
    from moonshot_spark.strategies.base import MoonshotError

    class Bad(BuyBelow10):
        BENCHMARK = "NOPE"

    with pytest.raises(MoonshotError, match="BENCHMARK Sid NOPE is not in"):
        Bad().backtest(prices).collect()


def test_benchmark_time_slices_intraday(spark):
    """reference base.py:1491-1499: BENCHMARK_TIME extracts the daily
    benchmark from an intraday panel; missing time errors."""
    from moonshot_spark.strategies.base import MoonshotError

    rows = [("FI1", datetime.date(2018, 5, d), t, float(c))
            for d, cs in ((1, (10.0, 12.0)), (2, (13.0, 11.0)))
            for t, c in zip(("10:00:00", "15:00:00"), cs, strict=True)]
    prices = spark.createDataFrame(
        rows, "sid string, date date, time string, close double")

    class WithBench(BuyBelow10):
        BENCHMARK = "FI1"
        BENCHMARK_TIME = "15:00:00"

        # once-a-day: daily results frame — BENCHMARK_TIME only applies
        # when results are daily (reference daily=not results_are_intraday)
        def prices_to_signals(self, p):
            sliced = p.where(F.col("time") == "10:00:00").drop("time")
            return sliced.withColumn(
                "signal", (F.col("close") < 10).cast("int"))

    results = WithBench().backtest(prices)
    bench = {str(r["date"]): r["value"] for r in
             results.where(F.col("field") == "Benchmark").collect()}
    # daily benchmark from the 15:00 closes: 12 → 11
    assert bench["2018-05-02"] == pytest.approx((11.0 - 12.0) / 12.0)

    class BadTime(WithBench):
        BENCHMARK_TIME = "11:11:11"

    with pytest.raises(MoonshotError, match="BENCHMARK_TIME 11:11:11"):
        BadTime().backtest(prices).collect()


def test_benchmark_db_must_be_eod(spark, prices):
    """reference base.py:1440-1443: intraday BENCHMARK_DB rejected."""
    from moonshot_spark.strategies.base import MoonshotParameterError

    intraday = spark.createDataFrame(
        [("SPY", datetime.date(2018, 5, 1), "10:00:00", 100.0)],
        "sid string, date date, time string, close double")

    class WithDb(BuyBelow10):
        BENCHMARK = "SPY"

    with pytest.raises(MoonshotParameterError, match="end-of-day"):
        WithDb().backtest(prices, benchmark_prices=intraday).collect()


def test_save_to_results_missing_column_raises(prices):
    """reference test_save_custom_dataframe: a saved name that doesn't
    align with the results frame errors clearly, not with an opaque
    analysis exception."""
    from moonshot_spark.strategies.base import MoonshotParameterError

    class Strategy(BuyBelow10):
        def prices_to_signals(self, p):
            self.save_to_results("Custom", "nonexistent_col")
            return p.withColumn("signal", (F.col("close") < 10).cast("int"))

    with pytest.raises(MoonshotParameterError, match="nonexistent_col"):
        Strategy().backtest(prices)


def test_daily_benchmark_broadcasts_across_intraday_bars(spark, prices):
    """reference base.py:1453-1455: a daily BENCHMARK_DB reindexes across
    the intraday bars — 0 within-day benchmark return, the daily move on
    each day's first bar."""
    intraday = spark.createDataFrame(
        [("FI12345", datetime.date(2018, 5, d), t, 9.0)
         for d in (1, 2) for t in ("10:00:00", "15:00:00")],
        "sid string, date date, time string, close double")
    daily_bench = spark.createDataFrame(
        [("SPY", datetime.date(2018, 5, 1), 100.0),
         ("SPY", datetime.date(2018, 5, 2), 110.0)],
        "sid string, date date, close double")

    class WithBench(BuyBelow10):
        BENCHMARK = "SPY"

    results = WithBench().backtest(intraday, benchmark_prices=daily_bench)
    bench = {(str(r["date"]), r["time"]): r["value"] for r in
             results.where(F.col("field") == "Benchmark").collect()}
    assert bench[("2018-05-01", "15:00:00")] == 0.0          # within day
    assert bench[("2018-05-02", "10:00:00")] == pytest.approx(0.10)
    assert bench[("2018-05-02", "15:00:00")] == 0.0


def test_daily_benchmark_gap_date_keeps_bars(spark):
    """A panel date the daily benchmark source lacks (its exchange's
    holiday) keeps its bars with a 0 benchmark return — reindex+ffill,
    not a silent gap."""
    intraday = spark.createDataFrame(
        [("FI12345", datetime.date(2018, 5, d), t, 9.0)
         for d in (1, 2, 3) for t in ("10:00:00", "15:00:00")],
        "sid string, date date, time string, close double")
    daily_bench = spark.createDataFrame(
        [("SPY", datetime.date(2018, 5, 1), 100.0),
         ("SPY", datetime.date(2018, 5, 3), 110.0)],   # May 2 missing
        "sid string, date date, close double")

    class WithBench(BuyBelow10):
        BENCHMARK = "SPY"

    results = WithBench().backtest(intraday, benchmark_prices=daily_bench)
    bench = {(str(r["date"]), r["time"]): r["value"] for r in
             results.where(F.col("field") == "Benchmark").collect()}
    assert bench[("2018-05-02", "10:00:00")] == 0.0    # ffilled holiday
    assert bench[("2018-05-02", "15:00:00")] == 0.0
    assert bench[("2018-05-03", "10:00:00")] == pytest.approx(0.10)
