"""Signal-date resolution and staleness validation (D19/S8), behaviors
ported from the reference _tests/test_trade_date_validation.py (stale
dates, CALENDAR suggestion, timezone/calendar "today", intraday trade-time
selection and stale-time errors)."""

import datetime

import pandas as pd
import pytest
from pyspark.sql import functions as F

from moonshot_spark import Moonshot
from moonshot_spark.sources.calendars import make_calendar_service
from moonshot_spark.strategies.base import MoonshotError, MoonshotParameterError

DATES = [datetime.date(2024, 6, d) for d in (3, 4, 5)]


class BuyBelow10(Moonshot):
    CODE = "buy-below-10"

    def prices_to_signals(self, prices):
        return prices.withColumn("signal", (F.col("close") < 10).cast("int"))


def clock(ts):
    """Strategy subclass whose wall clock is pinned to ``ts`` (tz-localized
    to whatever timezone the resolution chain supplies)."""
    class Pinned(BuyBelow10):
        def _now(self, tz):
            return pd.Timestamp(ts, tz=tz)
    return Pinned


@pytest.fixture(scope="module")
def prices(spark):
    closes = {"FI12345": [9, 11, 10.50], "FI23456": [9.89, 11, 8.50]}
    rows = [(sid, d, float(c)) for sid, cs in closes.items()
            for d, c in zip(DATES, cs, strict=True)]
    return spark.createDataFrame(rows, "sid string, date date, close double")


@pytest.fixture(scope="module")
def intraday_prices(spark):
    rows = []
    for sid, closes in {"FI12345": [9.0, 11.0, 9.5, 10.0],
                        "FI23456": [9.5, 8.0, 10.5, 7.5]}.items():
        i = 0
        for d in DATES[1:]:
            for t in ("10:00:00", "15:00:00"):
                rows.append((sid, d, t, closes[i]))
                i += 1
    return spark.createDataFrame(
        rows, "sid string, date date, time string, close double")


@pytest.fixture(scope="module")
def master(spark):
    return spark.createDataFrame(
        [("FI12345", "ABC", "STK", "USD", "NYSE", "America/New_York", None, None),
         ("FI23456", "DEF", "STK", "USD", "NYSE", "America/New_York", None, None)],
        "sid string, symbol string, sec_type string, currency string, "
        "exchange string, timezone string, price_magnifier double, multiplier double")


@pytest.fixture(scope="module")
def balances(spark):
    return spark.createDataFrame(
        [("U123", "USD", 55000.0)],
        "account string, currency string, net_liquidation double")


# --------------------------------------------------------------------- #
# stale-date errors (ref test_complain_if_stale_date*)                  #
# --------------------------------------------------------------------- #

def test_complain_if_stale_date(prices, master, balances):
    with pytest.raises(MoonshotError, match="expected signal date 2024-06-09"
                       r".*max date is 2024-06-05") as exc:
        clock("2024-06-09 10:00:00")().trade(
            prices, {"U123": 1.0}, balances, master=master)
    assert "CALENDAR" not in str(exc.value)   # gap > 1 day: no suggestion


def test_complain_if_stale_date_and_suggest_calendar(prices, master, balances):
    # ref test_complain_if_stale_date_and_suggest_CALENDAR: a one-day gap
    # usually means trading before the open without a calendar
    with pytest.raises(MoonshotError, match="try setting CALENDAR"):
        clock("2024-06-06 08:00:00")().trade(
            prices, {"U123": 1.0}, balances, master=master)


def test_stale_date_intraday_no_calendar_suggestion(intraday_prices, master,
                                                    balances):
    with pytest.raises(MoonshotError,
                       match="expected signal date 2024-06-06") as exc:
        clock("2024-06-06 11:00:00")().trade(
            intraday_prices, {"U123": 1.0}, balances, master=master)
    assert "CALENDAR" not in str(exc.value)


# --------------------------------------------------------------------- #
# signal date from timezone / inferred timezone                         #
# --------------------------------------------------------------------- #

def test_signal_date_from_timezone(prices, balances):
    # ref test_signal_date_from_timezone: no master timezone available;
    # TIMEZONE drives "today"
    class TzStrategy(clock("2024-06-05 16:00:00")):
        TIMEZONE = "America/New_York"

    strat = TzStrategy()
    orders = strat.trade(prices, {"U123": 1.0}, balances)
    assert strat._signal_date == datetime.date(2024, 6, 5)
    got = {r["sid"]: r for r in orders.collect()}
    assert set(got) == {"FI23456"}          # only close 8.50 < 10 on 06-05
    assert got["FI23456"]["total_quantity"] == round(55000 / 8.50)


def test_signal_date_from_inferred_timezone(prices, master, balances):
    # ref test_signal_date_from_inferred_timezone: tz comes from the master
    strat = clock("2024-06-05 16:00:00")()
    strat.trade(prices, {"U123": 1.0}, balances, master=master)
    assert strat._signal_date == datetime.date(2024, 6, 5)


def test_multiple_timezones_require_explicit(spark, prices, balances):
    master2 = spark.createDataFrame(
        [("FI12345", "ABC", "STK", "USD", "NYSE", "America/New_York", None, None),
         ("FI23456", "DEF", "STK", "JPY", "TSE", "Asia/Tokyo", None, None)],
        "sid string, symbol string, sec_type string, currency string, "
        "exchange string, timezone string, price_magnifier double, multiplier double")
    with pytest.raises(MoonshotParameterError, match="multiple timezones"):
        clock("2024-06-05 16:00:00")().trade(
            prices, {"U123": 1.0}, balances, master=master2)


def test_batch_fallback_without_clock_context(prices, balances):
    # documented divergence: no review_date/CALENDAR/TIMEZONE/master tz →
    # the panel's max date is today's analog
    strat = BuyBelow10()
    orders = strat.trade(prices, {"U123": 1.0}, balances)
    assert strat._signal_date == datetime.date(2024, 6, 5)
    assert orders.count() == 1


# --------------------------------------------------------------------- #
# signal date from exchange calendar (ref test_signal_date_from_calendar*)
# --------------------------------------------------------------------- #

def test_signal_date_from_calendar_timezone_if_open(prices, master, balances):
    class CalStrategy(clock("2024-06-05 16:00:00")):
        CALENDAR = "NYSE"
        calendar_service = staticmethod(make_calendar_service(
            {"NYSE": {"status": "open", "since": "2024-06-05T09:30:00",
                      "timezone": "America/New_York"}}))

    strat = CalStrategy()
    strat.trade(prices, {"U123": 1.0}, balances, master=master)
    assert strat._signal_date == datetime.date(2024, 6, 5)


def test_signal_date_from_calendar_since_if_closed(prices, master, balances):
    # exchange closed → signals correspond to the date it was last open,
    # NOT today (the pinned clock is a day later)
    class CalStrategy(clock("2024-06-05 08:00:00")):
        CALENDAR = "NYSE"
        calendar_service = staticmethod(make_calendar_service(
            {"NYSE": {"status": "closed", "since": "2024-06-04T16:00:00",
                      "timezone": "America/New_York"}}))

    strat = CalStrategy()
    orders = strat.trade(prices, {"U123": 1.0}, balances, master=master)
    assert strat._signal_date == datetime.date(2024, 6, 4)
    assert orders is None    # no closes < 10 on 06-04


def test_calendar_requires_service(prices, master, balances):
    class NoService(BuyBelow10):
        CALENDAR = "NYSE"

    with pytest.raises(MoonshotParameterError, match="calendar_service"):
        NoService().trade(prices, {"U123": 1.0}, balances, master=master)


def test_calendar_service_from_spine_table(spark, prices, master, balances):
    cal = spark.createDataFrame(
        [("NYSE", "closed", "2024-06-04T16:00:00", "America/New_York")],
        "exchange string, status string, since string, timezone string")

    class CalStrategy(clock("2024-06-05 08:00:00")):
        CALENDAR = "NYSE"
        calendar_service = staticmethod(make_calendar_service(cal))

    strat = CalStrategy()
    strat.trade(prices, {"U123": 1.0}, balances, master=master)
    assert strat._signal_date == datetime.date(2024, 6, 4)


# --------------------------------------------------------------------- #
# intraday trade-time selection + stale-time validation                 #
# --------------------------------------------------------------------- #

def test_intraday_trade_time_picks_latest_earlier_time(intraday_prices,
                                                       master, balances):
    # at 12:06 only the 10:00 bar is earlier → FI23456 close 10.5 (no
    # signal), FI12345 close 9.5 (signal)
    strat = clock("2024-06-05 12:06:00")()
    orders = strat.trade(intraday_prices, {"U123": 1.0}, balances,
                         master=master)
    assert strat._signal_time == "10:00:00"
    got = {r["sid"]: r for r in orders.collect()}
    assert set(got) == {"FI12345"}
    assert got["FI12345"]["total_quantity"] == round(55000 / 9.5)


def test_complain_if_no_times_before_trade_time(intraday_prices, master,
                                                balances):
    with pytest.raises(MoonshotError,
                       match="no times earlier than trade time 09:00:00") as exc:
        clock("2024-06-05 09:00:00")().trade(
            intraday_prices, {"U123": 1.0}, balances, master=master)
    assert "review_date" not in str(exc.value)


def test_no_times_suggests_adjusting_review_date(intraday_prices, master,
                                                 balances):
    # ref ..._and_suggest_review_date: same error names the review_date as
    # the knob when one was given
    with pytest.raises(MoonshotError, match="please adjust the review_date"):
        BuyBelow10().trade(intraday_prices, {"U123": 1.0}, balances,
                           master=master, review_date="2024-06-05 09:00:00")


def test_review_date_with_time_intraday(intraday_prices, master, balances):
    strat = BuyBelow10()
    orders = strat.trade(intraday_prices, {"U123": 1.0}, balances,
                         master=master, review_date="2024-06-05 15:30:00")
    assert strat._signal_time == "15:00:00"
    got = {r["sid"]: r for r in orders.collect()}
    assert set(got) == {"FI23456"}          # 15:00 close 7.5 < 10
    assert got["FI23456"]["total_quantity"] == round(55000 / 7.5)


def test_complain_if_stale_time(spark, master, balances):
    # ref test_complain_if_stale_time_continuous_intraday: the 15:00 bar
    # exists in the weights frame (spine-filled) but every price field is
    # null at 15:00 on the signal date → the data is stale, error
    rows = []
    for sid in ("FI12345", "FI23456"):
        rows += [(sid, DATES[1], "10:00:00", 9.0),
                 (sid, DATES[1], "15:00:00", 9.1),
                 (sid, DATES[2], "10:00:00", 9.2),
                 (sid, DATES[2], "15:00:00", None)]
    prices = spark.createDataFrame(
        rows, "sid string, date date, time string, close double")
    with pytest.raises(MoonshotError,
                       match=r"no 15:00:00 data found in prices DataFrame "
                             r"for signal date 2024-06-05.*max time for "
                             r"2024-06-05 is 10:00:00"):
        clock("2024-06-05 16:00:00")().trade(
            prices, {"U123": 1.0}, balances, master=master)
