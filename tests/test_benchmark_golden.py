"""The reference's benchmark golden matrix, ported from
/root/reference/moonshot/_tests/test_benchmark.py (15 test methods; the
three that only assert quantrocket HTTP mock call-args — :343, :475,
:1553 — have no analog here because prices arrive as DataFrames, and the
DB-query-error passthrough :1133 likewise; their engine-side semantics
are covered by test_prices_source.py's BENCHMARK-sid universe tests).
Every expected number below is the reference's own golden."""

import datetime
import math

import pytest
from pyspark.sql import functions as F

from moonshot_spark import Moonshot
from moonshot_spark.exceptions import MoonshotError, MoonshotParameterError

DATES4 = [datetime.date(2018, 5, d) for d in (1, 2, 3, 4)]
DATES3 = DATES4[:3]


class BuyBelow10(Moonshot):
    def prices_to_signals(self, prices):
        return prices.withColumn("signal", (F.col("close") < 10).cast("int"))


@pytest.fixture(scope="module")
def eod_prices(spark):
    """reference :240-262: Close+Volume, 4 dates."""
    data = {"FI12345": ([9.0, 11.0, 10.50, 9.99], [5000, 16000, 8800, 9900]),
            "FI23456": ([9.89, 11.0, 8.50, 10.50], [15000, 14000, 28800, 17000])}
    rows = [(sid, d, c, float(v)) for sid, (cs, vs) in data.items()
            for d, c, v in zip(DATES4, cs, vs, strict=True)]
    return spark.createDataFrame(
        rows, "sid string, date date, close double, volume double")


@pytest.fixture(scope="module")
def intraday_2t(spark):
    """reference :1298-1334: 3 dates x (09:30, 15:30)."""
    closes = {"FI12345": [9.6, 10.45, 10.12, 15.45, 8.67, 12.30],
              "FI23456": [10.56, 12.01, 10.50, 9.80, 13.40, 14.50]}
    times = ["09:30:00", "15:30:00"]
    rows = []
    for sid, vals in closes.items():
        i = 0
        for d in DATES3:
            for t in times:
                rows.append((sid, d, t, float(vals[i])))
                i += 1
    return spark.createDataFrame(
        rows, "sid string, date date, time string, close double")


@pytest.fixture(scope="module")
def intraday_3t(spark):
    """reference :1685-1707: 2 dates x (10:00, 11:00, 12:00)."""
    closes = {"FI12345": [9.6, 10.45, 10.12, 15.45, 8.67, 12.30],
              "FI23456": [10.56, 12.01, 10.50, 9.80, 13.40, 7.50]}
    times = ["10:00:00", "11:00:00", "12:00:00"]
    rows = []
    for sid, vals in closes.items():
        i = 0
        for d in DATES3[:2]:
            for t in times:
                rows.append((sid, d, t, float(vals[i])))
                i += 1
    return spark.createDataFrame(
        rows, "sid string, date date, time string, close double")


@pytest.fixture(scope="module")
def etf_prices(spark):
    """reference :654-676: external daily benchmark source, 3 dates."""
    closes = [199.6, 210.45, 210.12]
    rows = [("FI34567", d, c) for d, c in zip(DATES3, closes, strict=True)]
    return spark.createDataFrame(rows, "sid string, date date, close double")


def bench_series(results, ndp=7):
    rows = (results.where(F.col("field") == "Benchmark")
            .orderBy("date").collect())
    return [None if r["value"] is None or math.isnan(r["value"])
            else round(r["value"], ndp) for r in rows]


def test_complain_if_no_price_fields_for_benchmark(spark):
    """reference :40-123: a volume-only panel cannot supply a benchmark."""
    rows = [("FI12345", d, float(v))
            for d, v in zip(DATES3, [5000, 16000, 8800], strict=True)]
    prices = spark.createDataFrame(rows, "sid string, date date, volume double")

    class VolOnly(Moonshot):
        BENCHMARK = "FI12345"
        CONTRACT_VALUE_REFERENCE_FIELD = "volume"

        def prices_to_signals(self, p):
            return p.withColumn("signal", F.lit(1))

        # reference overrides this too — no close column to pct_change
        def positions_to_gross_returns(self, positions):
            return positions.withColumn("gross_return", F.lit(0.0))

    with pytest.raises(MoonshotParameterError,
                       match="Cannot extract BENCHMARK FI12345"):
        VolOnly().backtest(prices).collect()


def test_complain_if_benchmark_sid_missing(eod_prices):
    """reference :124-216."""
    class Bad(BuyBelow10):
        BENCHMARK = "FI99999"

    with pytest.raises(MoonshotError, match="BENCHMARK Sid FI99999 is not in"):
        Bad().backtest(eod_prices).collect()


def test_benchmark_eod(eod_prices):
    """reference :216-343 golden: FI23456 closes 9.89 -> 11 -> 8.50 -> 10.50."""
    class Strategy(BuyBelow10):
        BENCHMARK = "FI23456"

    results = Strategy().backtest(eod_prices)
    assert bench_series(results) == [0.0, 0.1122346, -0.2272727, 0.2352941]


def test_benchmark_eod_with_benchmark_db(eod_prices, etf_prices):
    """reference :592-743 golden: external source has 3 of the panel's 4
    dates — the missing last date ffills to a 0.0 return."""
    class Strategy(BuyBelow10):
        BENCHMARK = "FI34567"

    results = Strategy().backtest(eod_prices, benchmark_prices=etf_prices)
    assert bench_series(results) == [0.0, 0.0543587, -0.0015681, 0.0]


def test_complain_if_once_a_day_intraday_and_no_benchmark_time(intraday_2t):
    """reference :743-865: daily results from an intraday panel need
    BENCHMARK_TIME."""
    class OnceADay(Moonshot):
        BENCHMARK = "FI12345"

        def prices_to_signals(self, p):
            morning = p.where(F.col("time") == "09:30:00").drop("time")
            return morning.withColumn(
                "signal", (F.col("close") < 10).cast("int"))

    with pytest.raises(
            MoonshotParameterError,
            match="prices contains intraday prices but no BENCHMARK_TIME"):
        OnceADay().backtest(intraday_2t).collect()


def test_complain_if_benchmark_time_not_in_data(intraday_2t):
    """reference :865-987."""
    class OnceADay(Moonshot):
        BENCHMARK = "FI12345"
        BENCHMARK_TIME = "15:00:00"

        def prices_to_signals(self, p):
            morning = p.where(F.col("time") == "09:30:00").drop("time")
            return morning.withColumn(
                "signal", (F.col("close") < 10).cast("int"))

    with pytest.raises(MoonshotError,
                       match="BENCHMARK_TIME 15:00:00 is not in"):
        OnceADay().backtest(intraday_2t).collect()


def test_complain_if_intraday_benchmark_db(spark, eod_prices):
    """reference :987-1133: external benchmark source must be daily."""
    rows = [("SPY", DATES3[0], "09:30:00", 100.0),
            ("SPY", DATES3[0], "15:30:00", 101.0)]
    intraday_bench = spark.createDataFrame(
        rows, "sid string, date date, time string, close double")

    class Strategy(BuyBelow10):
        BENCHMARK = "SPY"

    with pytest.raises(MoonshotParameterError,
                       match="only end-of-day databases are supported"):
        Strategy().backtest(
            eod_prices, benchmark_prices=intraday_bench).collect()


def test_benchmark_once_a_day_intraday(intraday_2t):
    """reference :1258-1394 golden: BENCHMARK_TIME=15:30 daily closes
    10.45 -> 15.45 -> 12.30."""
    class OnceADay(Moonshot):
        BENCHMARK = "FI12345"
        BENCHMARK_TIME = "15:30:00"

        def prices_to_signals(self, p):
            morning = p.where(F.col("time") == "09:30:00").drop("time")
            return morning.withColumn(
                "signal", (F.col("close") < 10).cast("int"))

    results = OnceADay().backtest(intraday_2t)
    assert "time" not in results.columns
    assert bench_series(results) == [0.0, 0.4784689, -0.2038835]


def test_benchmark_once_a_day_intraday_with_benchmark_db(intraday_2t,
                                                         etf_prices):
    """reference :1394-1553 golden: daily external source + daily results
    -> daily benchmark, no BENCHMARK_TIME needed."""
    class OnceADay(Moonshot):
        BENCHMARK = "FI34567"

        def prices_to_signals(self, p):
            morning = p.where(F.col("time") == "09:30:00").drop("time")
            return morning.withColumn(
                "signal", (F.col("close") < 10).cast("int"))

    results = OnceADay().backtest(intraday_2t, benchmark_prices=etf_prices)
    assert bench_series(results) == [0.0, 0.0543587, -0.0015681]


def test_benchmark_continuous_intraday(intraday_3t):
    """reference :1661-1781 golden: per-bar benchmark returns from
    FI23456's own bars."""
    class ContIntraday(BuyBelow10):
        BENCHMARK = "FI23456"

    results = ContIntraday().backtest(intraday_3t)
    rows = (results.where(F.col("field") == "Benchmark")
            .orderBy("date", "time").collect())
    got = [round(r["value"], 7) for r in rows]
    assert got == [0.0, 0.1373106, -0.1257286, -0.0666667, 0.3673469,
                   -0.4402985]


def test_benchmark_continuous_intraday_with_benchmark_db(spark, intraday_3t):
    """reference :1781-1921 golden: daily external prices broadcast across
    the day's bars — the first bar of day 2 carries the daily move."""
    closes = [199.6, 210.45]
    etf2 = spark.createDataFrame(
        [("FI34567", d, c) for d, c in zip(DATES3[:2], closes, strict=True)],
        "sid string, date date, close double")

    class ContIntraday(BuyBelow10):
        BENCHMARK = "FI34567"

    results = ContIntraday().backtest(intraday_3t, benchmark_prices=etf2)
    rows = (results.where(F.col("field") == "Benchmark")
            .orderBy("date", "time").collect())
    got = [round(r["value"], 7) for r in rows]
    assert got == [0.0, 0.0, 0.0, 0.0543587, 0.0, 0.0]
