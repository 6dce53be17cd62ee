"""Pandas-strategy compatibility shim tests: an unmodified reference-style
pandas strategy must produce identical results to the native Spark hook."""

import datetime

import pytest
from pyspark.sql import functions as F

from moonshot_spark import Moonshot
from moonshot_spark.strategies.compat import PandasStrategyAdapter

DATES = [datetime.date(2018, 5, d) for d in (1, 2, 3, 4)]


@pytest.fixture(scope="module")
def prices(spark):
    closes = {"FI12345": [9, 11, 10.50, 9.99], "FI23456": [9.89, 11, 8.50, 10.50]}
    volumes = {"FI12345": [5000, 16000, 8800, 9900],
               "FI23456": [15000, 14000, 28800, 17000]}
    rows = [(sid, d, float(c), float(v)) for sid in closes
            for d, c, v in zip(DATES, closes[sid], volumes[sid], strict=True)]
    return spark.createDataFrame(
        rows, "sid string, date date, close double, volume double")


class PandasBuyBelow10:
    """Reference-style strategy, verbatim from the reference's test
    (_tests/test_backtest.py:114-121) — pandas API, no Spark imports."""

    CODE = "pandas-buy-below-10"

    def prices_to_signals(self, prices):
        signals = prices.loc["Close"] < 10
        return signals.astype(int)


class NativeBuyBelow10(Moonshot):
    def prices_to_signals(self, prices):
        return prices.withColumn("signal", (F.col("close") < 10).cast("int"))


def results_map(results):
    return {(r["field"], r["sid"], r["date"]): r["value"]
            for r in results.collect()}


def test_pandas_strategy_matches_native(prices):
    native = results_map(NativeBuyBelow10().backtest(prices))
    adapted = results_map(PandasStrategyAdapter(PandasBuyBelow10()).backtest(prices))
    assert set(native) == set(adapted)
    for k, v in native.items():
        if v is None:
            assert adapted[k] is None
        else:
            assert adapted[k] == pytest.approx(v)


def test_pandas_strategy_rolling_window(prices):
    """A pandas hook that needs full per-sid history (rolling mean)."""

    class PandasMavg:
        def prices_to_signals(self, prices):
            closes = prices.loc["Close"]
            mavg = closes.rolling(2).mean()
            return (closes > mavg).astype(int)

    results = PandasStrategyAdapter(PandasMavg()).backtest(prices)
    sig = results_map(results)
    # mavg day2 FI12345 = (9+11)/2 = 10 < 11 → 1
    assert sig[("Signal", "FI12345", DATES[1])] == 1.0
    # day1: rolling(2) is NaN → comparison False → 0
    assert sig[("Signal", "FI12345", DATES[0])] == 0.0


def test_pandas_strategy_intraday(spark):
    """Regression: the shim must handle intraday (Field, Date, Time) panels."""
    import datetime as dt

    rows = []
    for sid, closes in {"A": [9.0, 11.0], "B": [12.0, 8.0]}.items():
        for t, c in zip(["10:00:00", "15:00:00"], closes, strict=True):
            rows.append((sid, dt.date(2024, 6, 5), t, c))
    prices = spark.createDataFrame(
        rows, "sid string, date date, time string, close double")

    class PandasIntraday:
        def prices_to_signals(self, p):
            closes = p.loc["Close"]
            return (closes < 10).astype(int)

    results = PandasStrategyAdapter(PandasIntraday()).backtest(prices)
    sig = {(r["sid"], r["time"]): r["value"] for r in
           results.where(F.col("field") == "Signal").collect()}
    assert sig[("A", "10:00:00")] == 1.0 and sig[("A", "15:00:00")] == 0.0
    assert sig[("B", "10:00:00")] == 0.0 and sig[("B", "15:00:00")] == 1.0


def test_reference_two_arg_hook_signatures(spark):
    """A strategy keeping the reference's 2-arg hook signatures
    (signals_to_target_weights(self, signals, prices) etc.,
    reference base.py:386,434,479) runs unchanged — the engine sniffs
    the arity and passes prices as the second argument."""
    import datetime

    from pyspark.sql import functions as F

    from moonshot_spark import Moonshot

    dates = [datetime.date(2018, 5, d) for d in (1, 2, 3)]
    rows = [("S1", d, c) for d, c in zip(dates, [9.0, 11.0, 8.0],
                                         strict=True)]
    prices = spark.createDataFrame(rows, "sid string, date date, close double")

    seen = {}

    class RefStyle(Moonshot):
        def prices_to_signals(self, p):
            return p.withColumn("signal", (F.col("close") < 10).cast("int"))

        def signals_to_target_weights(self, signals, prices):
            seen["w_prices"] = prices is not None
            return self.allocate_fixed_weights(signals, 0.5)

        def target_weights_to_positions(self, weights, prices):
            seen["p_prices"] = prices is not None
            from moonshot_spark.functions.window import shift
            return weights.withColumn(
                "position", shift("weight", 1, self._sid_window(weights)))

        def positions_to_gross_returns(self, positions, prices):
            seen["r_prices"] = prices is not None
            from moonshot_spark.functions.window import pct_change, shift
            w = self._sid_window(positions)
            return positions.withColumn(
                "gross_return",
                pct_change("close", 1, w) * shift("position", 1, w))

    results = RefStyle().backtest(prices)
    weights = {r["date"]: r["value"] for r in
               results.where(F.col("field") == "Weight").collect()}
    assert weights[dates[0]] == 0.5 and weights[dates[1]] == 0.0
    assert seen == {"w_prices": True, "p_prices": True, "r_prices": True}
