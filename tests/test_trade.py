"""Trade-path tests, golden values ported from the reference
(moonshot/_tests/test_trade.py:26-151 basic, :1271+ multi-account,
:1761+ existing positions, :2165+ positions+orders, :2632+ magnifier,
:2802+ FX)."""

import datetime

import pytest
from pyspark.sql import functions as F

from moonshot_spark import Moonshot

DATES = [datetime.date(2024, 6, d) for d in (3, 4, 5)]


class BuyBelow10(Moonshot):
    CODE = "buy-below-10"

    # pin the clock: the master fixture carries a timezone, so without a
    # review_date the signal date resolves from "now" in that tz
    # (reference mocks pd.Timestamp.now the same way)
    def _now(self, tz):
        import pandas as pd
        return pd.Timestamp("2024-06-05 16:00:00", tz=tz)

    def prices_to_signals(self, prices):
        return prices.withColumn("signal", (F.col("close") < 10).cast("int"))


@pytest.fixture(scope="module")
def prices(spark):
    # reference test_trade.py:43-65: closes FI12345 [9, 11, 10.50],
    # FI23456 [9.89, 11, 8.50]
    closes = {"FI12345": [9, 11, 10.50], "FI23456": [9.89, 11, 8.50]}
    rows = [(sid, d, float(c)) for sid, cs in closes.items()
            for d, c in zip(DATES, cs, strict=True)]
    return spark.createDataFrame(rows, "sid string, date date, close double")


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


def orders_list(orders):
    return sorted([r.asDict() for r in orders.collect()],
                  key=lambda r: (r["sid"], r["account"]))


def test_basic_long_only(prices, master, balances):
    """reference test_trade.py:137-151: 1.0 * 1.0 * 55K / 8.50 = 6471 BUY."""
    orders = BuyBelow10().trade(prices, {"U123": 1.0}, balances, master=master)
    got = orders_list(orders)
    assert got == [{
        "sid": "FI23456", "account": "U123", "action": "BUY",
        "order_ref": "buy-below-10", "total_quantity": 6471,
        "order_type": "MKT", "tif": "DAY"}]


def test_no_orders(prices, master, balances):
    """No signals on signal date → None (reference test_trade.py:152+)."""
    class NeverBuy(BuyBelow10):
        def prices_to_signals(self, p):
            return p.withColumn("signal", F.lit(0))

    assert NeverBuy().trade(prices, {"U123": 1.0}, balances, master=master) is None


def test_multiple_accounts(spark, prices, master):
    """reference test_trade.py:1271+: per-account NLV scaling."""
    balances = spark.createDataFrame(
        [("U123", "USD", 85000.0), ("DU234", "USD", 450000.0)],
        "account string, currency string, net_liquidation double")
    orders = BuyBelow10().trade(prices, {"U123": 0.5, "DU234": 0.3},
                                balances, master=master)
    got = {(r["sid"], r["account"]): r["total_quantity"]
           for r in orders.collect()}
    # weight 1.0 (single active signal), qty = alloc * nlv / 8.50
    assert got[("FI23456", "U123")] == round(0.5 * 85000 / 8.50)
    assert got[("FI23456", "DU234")] == round(0.3 * 450000 / 8.50)


def test_existing_positions_netting(spark, prices, master, balances):
    """reference test_trade.py:1761+: net = target − existing."""
    positions = spark.createDataFrame(
        [("FI23456", "U123", 1000)], "sid string, account string, quantity long")
    orders = BuyBelow10().trade(prices, {"U123": 1.0}, balances,
                                positions=positions, master=master)
    got = orders_list(orders)
    assert got[0]["total_quantity"] == 6471 - 1000
    assert got[0]["action"] == "BUY"


def test_positions_and_open_orders_combined(spark, prices, master, balances):
    """reference test_trade.py:2165+: positions + open orders sum."""
    positions = spark.createDataFrame(
        [("FI23456", "U123", 4000)], "sid string, account string, quantity long")
    open_orders = spark.createDataFrame(
        [("FI23456", "U123", 3000)], "sid string, account string, quantity long")
    orders = BuyBelow10().trade(prices, {"U123": 1.0}, balances,
                                positions=positions, open_orders=open_orders,
                                master=master)
    got = orders_list(orders)
    # target 6471 − (4000+3000) = −529 → SELL 529
    assert got[0]["action"] == "SELL" and got[0]["total_quantity"] == 529


def test_sell_existing_when_no_signal(spark, prices, master, balances):
    """A position in a sid with zero target → full exit order."""
    positions = spark.createDataFrame(
        [("FI12345", "U123", 500)], "sid string, account string, quantity long")
    orders = BuyBelow10().trade(prices, {"U123": 1.0}, balances,
                                positions=positions, master=master)
    got = {(r["sid"], r["action"]): r["total_quantity"] for r in orders.collect()}
    assert got[("FI12345", "SELL")] == 500
    assert got[("FI23456", "BUY")] == 6471


def test_allow_rebalance_false(spark, prices, master, balances):
    """reference base.py:1784-1787: same-side rebalance suppressed."""
    class NoRebalance(BuyBelow10):
        ALLOW_REBALANCE = False

    positions = spark.createDataFrame(
        [("FI23456", "U123", 1000)], "sid string, account string, quantity long")
    orders = NoRebalance().trade(prices, {"U123": 1.0}, balances,
                                 positions=positions, master=master)
    assert orders is None


def test_allow_rebalance_threshold(spark, prices, master, balances):
    """reference base.py:1788-1798: rebalance only if |Δ/existing| ≥ pct."""
    class SmallRebalance(BuyBelow10):
        ALLOW_REBALANCE = 0.25

    # existing 6000, target 6471 → Δ=471, 7.8% < 25% → suppressed
    positions = spark.createDataFrame(
        [("FI23456", "U123", 6000)], "sid string, account string, quantity long")
    assert SmallRebalance().trade(prices, {"U123": 1.0}, balances,
                                  positions=positions, master=master) is None
    # existing 1000 → Δ=5471, 547% ≥ 25% → allowed
    positions = spark.createDataFrame(
        [("FI23456", "U123", 1000)], "sid string, account string, quantity long")
    orders = SmallRebalance().trade(prices, {"U123": 1.0}, balances,
                                    positions=positions, master=master)
    assert orders_list(orders)[0]["total_quantity"] == 5471


def test_price_magnifier_and_multiplier(spark, prices, balances):
    """reference test_trade.py:2632+: contract value = price/magnifier×mult."""
    master = spark.createDataFrame(
        [("FI12345", "ABC", "FUT", "USD", "CME", "America/New_York", 2.0, 20.0),
         ("FI23456", "DEF", "FUT", "USD", "CME", "America/New_York", 2.0, 20.0)],
        "sid string, symbol string, sec_type string, currency string, "
        "exchange string, timezone string, price_magnifier double, multiplier double")
    orders = BuyBelow10().trade(prices, {"U123": 1.0}, balances, master=master)
    got = orders_list(orders)
    # contract value = 8.50 / 2 * 20 = 85 → 55000/85 = 647
    assert got[0]["total_quantity"] == round(55000 / 85.0)


def test_exchange_rates(spark, prices, balances):
    """reference test_trade.py:2802+: EUR-base account buys USD stock."""
    master = spark.createDataFrame(
        [("FI12345", "ABC", "STK", "USD", "NYSE", "UTC", None, None),
         ("FI23456", "DEF", "STK", "USD", "NYSE", "UTC", None, None)],
        "sid string, symbol string, sec_type string, currency string, "
        "exchange string, timezone string, price_magnifier double, multiplier double")
    balances_eur = spark.createDataFrame(
        [("U123", "EUR", 55000.0)],
        "account string, currency string, net_liquidation double")
    rates = spark.createDataFrame(
        [("EUR", "USD", 1.10)],
        "base_currency string, quote_currency string, rate double")
    orders = BuyBelow10().trade(prices, {"U123": 1.0}, balances_eur,
                                exchange_rates=rates, master=master)
    got = orders_list(orders)
    # 55000 EUR * 1.10 = 60500 USD / 8.50 = 7118
    assert got[0]["total_quantity"] == round(55000 * 1.10 / 8.50)


def test_review_date(spark, prices, master, balances):
    """review_date selects an earlier signal date (reference D19)."""
    orders = BuyBelow10().trade(prices, {"U123": 1.0}, balances, master=master,
                                review_date="2024-06-03")
    got = {r["sid"]: r for r in orders.collect()}
    # on 6/3 both sids signal (9 < 10, 9.89 < 10): weight 0.5 each
    assert got["FI12345"]["total_quantity"] == round(0.5 * 55000 / 9.0)
    assert got["FI23456"]["total_quantity"] == round(0.5 * 55000 / 9.89)


def test_child_orders(spark, prices, master, balances):
    orders = BuyBelow10().trade(prices, {"U123": 1.0}, balances, master=master)
    child = BuyBelow10().orders_to_child_orders(
        orders.withColumn("order_id", F.lit("0")))
    rows = child.collect()
    assert rows[0]["action"] == "SELL" and rows[0]["parent_id"] == "0"


def test_stale_review_date_raises(prices, master, balances):
    """D19 staleness validation: review_date beyond max data date errors
    (reference base.py:790-830)."""
    from moonshot_spark.strategies.base import MoonshotError

    with pytest.raises(MoonshotError, match="max date is 2024-06-05"):
        BuyBelow10().trade(prices, {"U123": 1.0}, balances, master=master,
                           review_date="2024-07-01")


def test_intraday_trade_asof_pick(spark, master, balances):
    """Intraday trade: the as-of pick selects the LATEST time of the signal
    date (J7 — reference base.py:790-795,831)."""
    rows = []
    for sid, closes in {"FI12345": [9.0, 11.0], "FI23456": [9.5, 8.0]}.items():
        for t, c in zip(["10:00:00", "15:00:00"], closes, strict=True):
            rows.append((sid, datetime.date(2024, 6, 5), t, c))
    prices = spark.createDataFrame(
        rows, "sid string, date date, time string, close double")
    orders = BuyBelow10().trade(prices, {"U123": 1.0}, balances, master=master)
    got = orders_list(orders)
    # at 15:00: FI12345 close 11 (no signal), FI23456 close 8.0 (signal) →
    # weight 1.0, qty = 55000/8.0
    assert len(got) == 1
    assert got[0]["sid"] == "FI23456"
    assert got[0]["total_quantity"] == round(55000 / 8.0)


def test_reindex_like_orders(spark, prices, master, balances):
    """J1: order_stubs_to_orders override attaches panel values by sid."""
    class WithLimits(BuyBelow10):
        def order_stubs_to_orders(self, orders, prices_df):
            latest = (prices_df.where(F.col("date") == self._signal_date)
                      .select("sid", F.col("close").alias("lmt_price")))
            orders = self.reindex_like_orders(orders, latest)
            return (orders.withColumn("order_type", F.lit("LMT"))
                    .withColumn("tif", F.lit("DAY")))

    orders = WithLimits().trade(prices, {"U123": 1.0}, balances, master=master)
    got = orders_list(orders)
    assert got[0]["order_type"] == "LMT"
    assert got[0]["lmt_price"] == 8.50


def test_review_date_absent_in_range_raises(spark, master, balances):
    """Regression: a review_date inside the range but missing from the
    panel (holiday) must raise, not silently return None."""
    from moonshot_spark.strategies.base import MoonshotError

    rows = [("FI12345", datetime.date(2024, 6, 3), 9.0),
            ("FI12345", datetime.date(2024, 6, 5), 9.5)]
    gappy = spark.createDataFrame(rows, "sid string, date date, close double")
    with pytest.raises(MoonshotError, match="2024-06-04"):
        BuyBelow10().trade(gappy, {"U123": 1.0}, balances, master=master,
                           review_date="2024-06-04")


def test_missing_fx_rate_raises(spark, prices, balances):
    """Regression: cross-currency weight without an FX rate must error,
    not silently emit zero orders."""
    master = spark.createDataFrame(
        [("FI12345", "ABC", "STK", "JPY", "TSE", "UTC", None, None),
         ("FI23456", "DEF", "STK", "JPY", "TSE", "UTC", None, None)],
        "sid string, symbol string, sec_type string, currency string, "
        "exchange string, timezone string, price_magnifier double, multiplier double")
    with pytest.raises(Exception, match="no exchange rate provided"):
        BuyBelow10().trade(prices, {"U123": 1.0}, balances, master=master)


def test_contract_value_reference_field(spark, master, balances):
    """CONTRACT_VALUE_REFERENCE_FIELD overrides the close-price default
    (reference test_trade.py:982+, base.py:1864-1867)."""
    class UseOpen(BuyBelow10):
        CONTRACT_VALUE_REFERENCE_FIELD = "open"

    rows = [("FI23456", DATES[i], c, o) for i, (c, o) in
            enumerate([(9.89, 20.0), (11.0, 22.0), (8.50, 17.0)])]
    prices = spark.createDataFrame(
        rows, "sid string, date date, close double, open double")
    orders = UseOpen().trade(prices, {"U123": 1.0}, balances, master=master)
    got = orders_list(orders)
    # quantity uses OPEN (17.0), not close (8.50)
    assert got[0]["total_quantity"] == round(55000 / 17.0)


def test_account_balance_field_least(spark, prices, master):
    """Multiple balance fields → least per account (A5, reference
    test_trade.py:1589+, base.py:1671)."""
    class LesserEquity(BuyBelow10):
        ACCOUNT_BALANCE_FIELD = ["net_liquidation", "previous_equity"]

    balances = spark.createDataFrame(
        [("U123", "USD", 60000.0, 48000.0)],
        "account string, currency string, net_liquidation double, "
        "previous_equity double")
    orders = LesserEquity().trade(prices, {"U123": 1.0}, balances,
                                  master=master)
    got = orders_list(orders)
    assert got[0]["total_quantity"] == round(48000 / 8.50)


def test_reindex_like_orders_slices_date_automatically(spark, prices, master,
                                                       balances):
    """Reference base.py:592: reindex_like_orders slices a date-indexed
    frame to the signal date itself — no pre-filtering required."""
    class WithLimits(BuyBelow10):
        def order_stubs_to_orders(self, orders, prices_df):
            latest = prices_df.select("sid", "date",
                                      F.col("close").alias("lmt_price"))
            return (self.reindex_like_orders(orders, latest)
                    .withColumn("order_type", F.lit("LMT")))

    orders = WithLimits().trade(prices, {"U123": 1.0}, balances, master=master)
    got = orders_list(orders)
    assert got[0]["lmt_price"] == 8.50          # the 2024-06-05 close


def test_reindex_like_orders_time_col_once_a_day_raises(spark, master,
                                                        balances):
    """Reference test_orders.py:213: passing a time-level frame on a
    once-a-day (batch-fallback) intraday strategy errors — there is no
    signal time to slice by."""
    from moonshot_spark.strategies.base import MoonshotError

    rows = [(sid, datetime.date(2024, 6, 5), t, c)
            for sid in ("FI12345", "FI23456")
            for t, c in (("10:00:00", 9.0), ("15:00:00", 8.0))]
    prices = spark.createDataFrame(
        rows, "sid string, date date, time string, close double")

    class Bad(BuyBelow10):
        def _now(self, tz):      # batch fallback: no trade time
            raise AssertionError("unused")

        def order_stubs_to_orders(self, orders, prices_df):
            timed = prices_df.select("sid", "time",
                                     F.col("close").alias("lmt_price"))
            return self.reindex_like_orders(orders, timed)

    class NoTz(Bad):
        pass

    with pytest.raises(MoonshotError, match="take a cross-section"):
        NoTz().trade(prices, {"U123": 1.0}, balances)


def test_intraday_position_caps_slice_signal_time(spark, master, balances):
    """reference test_limit_position_sizes.py:2221+: intraday cap frames
    slice to the signal time, not the whole day."""
    rows = [(sid, datetime.date(2024, 6, 5), t, c)
            for sid, closes in {"FI23456": [9.5, 8.0]}.items()
            for t, c in zip(["10:00:00", "15:00:00"], closes, strict=True)]
    prices = spark.createDataFrame(
        rows, "sid string, date date, time string, close double")

    class Capped(BuyBelow10):
        def limit_position_sizes(self, p):
            spark_ = p.sparkSession
            # cap 100 at 10:00, 500 at 15:00 — the 12:06 trade must pick
            # the 10:00 cap
            ml = spark_.createDataFrame(
                [("FI23456", datetime.date(2024, 6, 5), "10:00:00", 100),
                 ("FI23456", datetime.date(2024, 6, 5), "15:00:00", 500)],
                "sid string, date date, time string, max_quantity long")
            return ml, None

        def _now(self, tz):
            import pandas as pd
            return pd.Timestamp("2024-06-05 12:06:00", tz=tz)

    orders = Capped().trade(prices, {"U123": 1.0}, balances, master=master)
    got = orders_list(orders)
    assert got[0]["total_quantity"] == 100    # 10:00 cap, not 500


def test_instance_reuse_resets_signal_time(spark, master, balances):
    """A reused strategy instance must not inherit the previous trade's
    signal time (stale-state regression from the round-3 review)."""
    rows = [(sid, datetime.date(2024, 6, 5), t, c)
            for sid, closes in {"FI23456": [9.5, 8.0]}.items()
            for t, c in zip(["10:00:00", "15:00:00"], closes, strict=True)]
    intraday = spark.createDataFrame(
        rows, "sid string, date date, time string, close double")

    strat = BuyBelow10()
    strat.trade(intraday, {"U123": 1.0}, balances, master=master,
                review_date="2024-06-05 12:06:00")
    assert strat._signal_time == "10:00:00"
    # second call on the SAME instance, daily panel: no signal time at all
    daily = spark.createDataFrame(
        [("FI23456", datetime.date(2024, 6, 5), 8.5)],
        "sid string, date date, close double")
    strat.trade(daily, {"U123": 1.0}, balances, master=master,
                review_date="2024-06-05")
    assert strat._signal_time is None


def test_allow_rebalance_not_float_raises(spark, prices, master, balances):
    """reference test_allow_rebalance.py:516+: a non-numeric
    ALLOW_REBALANCE errors with the reference's message."""
    from moonshot_spark.exceptions import MoonshotParameterError

    class Bad(BuyBelow10):
        ALLOW_REBALANCE = "always"

    positions = spark.createDataFrame(
        [("FI23456", "U123", 100)],
        "sid string, account string, quantity long")
    with pytest.raises(MoonshotParameterError,
                       match="invalid value for ALLOW_REBALANCE"):
        Bad().trade(prices, {"U123": 1.0}, balances,
                    positions=positions, master=master)


def test_no_contract_value_reference_field_raises(spark, master, balances):
    """reference test_trade.py:872+: a panel with no price-like field and
    no CONTRACT_VALUE_REFERENCE_FIELD errors with guidance."""
    from moonshot_spark.exceptions import MoonshotParameterError

    rows = [("FI23456", d, float(v))
            for d, v in zip(DATES, [5000, 6000, 7000], strict=True)]
    vol_only = spark.createDataFrame(
        rows, "sid string, date date, volume double")

    class VolStrat(BuyBelow10):
        def prices_to_signals(self, p):
            return p.withColumn("signal", F.lit(1))

    with pytest.raises(MoonshotParameterError,
                       match="Can't identify a suitable field"):
        VolStrat().trade(vol_only, {"U123": 1.0}, balances, master=master)


def test_integer_account_numbers(spark, prices, master):
    """reference test_trade.py:2398+: integer account identifiers flow
    through allocations/balances/positions and come back on the orders."""
    balances = spark.createDataFrame(
        [(12345, "USD", 60000.0)],
        "account long, currency string, net_liquidation double")
    positions = spark.createDataFrame(
        [("FI23456", 12345, 400)],
        "sid string, account long, quantity long")
    orders = BuyBelow10().trade(prices, {12345: 1.0}, balances,
                                positions=positions, master=master)
    got = orders_list(orders)
    assert got[0]["account"] == 12345
    # day-3 signal: FI23456 close 8.50 < 10 -> target 60000/8.50=7059,
    # minus existing 400 -> 6659 BUY
    assert got[0]["total_quantity"] == round(60000 / 8.50) - 400
    assert got[0]["action"] == "BUY"


def test_long_short_override_methods_goldens(spark, prices, master):
    """reference test_trade.py:430-581: custom order_stubs_to_orders adds
    exchange/LMT/GTC fields; quantities from fixed 0.25 weights."""
    balances = spark.createDataFrame(
        [("U123", "USD", 60000.0)],
        "account string, currency string, net_liquidation double")

    class Custom(BuyBelow10):
        CODE = "long-short-10"

        def prices_to_signals(self, p):
            return p.withColumn(
                "signal", F.when(F.col("close") <= 10, 1).otherwise(-1))

        def signals_to_target_weights(self, signals):
            return self.allocate_fixed_weights(signals, 0.25)

        def order_stubs_to_orders(self, orders, p):
            return (orders.withColumn("exchange", F.lit("NYSE"))
                    .withColumn("order_type", F.lit("LMT"))
                    .withColumn("lmt_price", F.lit(10.00))
                    .withColumn("tif", F.lit("GTC")))

    orders = Custom().trade(prices, {"U123": 1.0}, balances, master=master)
    got = orders_list(orders)
    assert [(r["sid"], r["action"], r["total_quantity"], r["order_type"],
             r["tif"], r["exchange"], r["lmt_price"]) for r in got] == [
        ("FI12345", "SELL", 1429, "LMT", "GTC", "NYSE", 10.0),  # .25*60K/10.50
        ("FI23456", "BUY", 1765, "LMT", "GTC", "NYSE", 10.0)]   # .25*60K/8.50


def test_short_only_once_a_day_intraday_trade_goldens(spark, master):
    """reference test_trade.py:581-730: signals from the 09:30 Open slice,
    contract value from the latest (15:30) close -> SELL 1034 only."""
    balances = spark.createDataFrame(
        [("U123", "USD", 60000.0)],
        "account string, currency string, net_liquidation double")
    closes = {"FI12345": [9.6, 10.45, 10.12, 15.45, 8.67, 12.30],
              "FI23456": [10.56, 12.01, 10.50, 9.80, 13.40, 14.50]}
    opens = {"FI12345": [9.88, 10.34, 10.23, 16.45, 8.90, 11.30],
             "FI23456": [9.89, 11.0, 8.50, 10.50, 14.10, 15.0]}
    rows = []
    for sid in closes:
        i = 0
        for d in DATES:
            for t in ["09:30:00", "15:30:00"]:
                rows.append((sid, d, t, closes[sid][i], opens[sid][i]))
                i += 1
    prices = spark.createDataFrame(
        rows, "sid string, date date, time string, close double, open double")

    class ShortAbove10Intraday(Moonshot):
        CODE = "short-above-10"

        def _now(self, tz):
            import pandas as pd
            return pd.Timestamp("2024-06-05 16:00:00", tz=tz)

        def prices_to_signals(self, p):
            morning = p.where(F.col("time") == "09:30:00").drop("time")
            return morning.withColumn(
                "signal", -(F.col("open") > 10).cast("int"))

        def signals_to_target_weights(self, signals):
            return self.allocate_fixed_weights(signals, 0.25)

    orders = ShortAbove10Intraday().trade(
        prices, {"U123": 1.0}, balances, master=master)
    got = orders_list(orders)
    # day-3 09:30 opens: FI12345 8.90 (no signal), FI23456 14.10 -> short;
    # cv = latest close 14.50 -> 0.25 * 60K / 14.50 = 1034
    assert [(r["sid"], r["action"], r["total_quantity"]) for r in got] == [
        ("FI23456", "SELL", 1034)]


def test_continuous_intraday_trade_goldens(spark, master):
    """reference test_trade.py:730-872: review 12:05 -> the 12:00 bar ->
    SELL 2439 / BUY 4000."""
    balances = spark.createDataFrame(
        [("U123", "USD", 60000.0)],
        "account string, currency string, net_liquidation double")
    closes = {"FI12345": [9.6, 10.45, 10.12, 15.45, 8.67, 12.30],
              "FI23456": [10.56, 12.01, 10.50, 9.80, 13.40, 7.50]}
    rows = []
    for sid in closes:
        i = 0
        for d in DATES[:2]:
            for t in ["10:00:00", "11:00:00", "12:00:00"]:
                rows.append((sid, d, t, closes[sid][i]))
                i += 1
    prices = spark.createDataFrame(
        rows, "sid string, date date, time string, close double")

    class ContIntraday(Moonshot):
        CODE = "long-short-10"

        def prices_to_signals(self, p):
            return p.withColumn(
                "signal", F.when(F.col("close") <= 10, 1).otherwise(-1))

    orders = ContIntraday().trade(prices, {"U123": 1.0}, balances,
                                  master=master,
                                  review_date="2024-06-04 12:05:00")
    got = orders_list(orders)
    # 12:00 closes day 2: FI12345 12.30 -> SELL .5*60K/12.30 = 2439;
    # FI23456 7.50 -> BUY .5*60K/7.50 = 4000
    assert [(r["sid"], r["action"], r["total_quantity"]) for r in got] == [
        ("FI12345", "SELL", 2439), ("FI23456", "BUY", 4000)]
