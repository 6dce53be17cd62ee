"""Property-based differential for ONCE-A-DAY INTRADAY backtests
(VERDICT r10 item 7): random intraday panels (random time grids, NULL
first bars, NULL cells anywhere) run through BOTH the Spark engine and a
pandas re-expression of the reference's once-a-day semantics, comparing
every output cell exactly.

The frame-grain split is the subtlest reference semantics in the
codebase and was previously pinned only by fixed goldens:

- **caps** (`_constrain_weights`, reference base.py:934-949) price
  quantities at the panel-GLOBAL earliest bar, cross-day-ffilled —
  ``contract_values.ffill().xs(earliest_time)``;
- **commissions** (`_with_commissions`, reference base.py:852-854)
  price at each day's FIRST NON-NULL bar, no cross-day ffill —
  ``contract_values.groupby(Date).first()``;
- **signals/returns** use whatever single bar the strategy sliced.

Float discipline matches test_property_differential.py: closes on a
quarter grid so rolling means are exact; caps arithmetic is the same
two-operand double chain on both sides (trade_value = weight·nlv, qty =
trade_value/|cv|, half-even round); comparisons are exact, not
approximate.
"""

import datetime
import math
import os

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from moonshot_spark import Moonshot
from moonshot_spark.commission.stk import PerShareCommission
from moonshot_spark.functions.window import rolling_mean

FIELDS = ("Signal", "Weight", "AbsWeight", "NetExposure", "AbsExposure",
          "TotalHoldings", "Turnover", "Commission", "Slippage", "Return")

GRID = [i * 0.25 for i in range(1, 257)]
TIME_GRIDS = (["09:30:00", "15:30:00"],
              ["09:30:00", "11:00:00", "15:30:00"],
              ["10:00:00", "11:00:00", "12:00:00"])
NLV = 10000.0

MAX_EXAMPLES = int(os.environ.get("MOONSHOT_PROPERTY_EXAMPLES", "50"))


def pandas_once_a_day(bars: dict[str, pd.DataFrame], slice_time: str,
                      lookback: int, allocation: float, closed_daily: bool,
                      per_share: float, slippage_rate: float,
                      max_long: dict[str, float | None] | None
                      ) -> dict[str, pd.DataFrame]:
    """Reference once-a-day hook chain re-expressed in pandas.  ``bars``:
    per-sid DataFrame indexed by date with one column per bar time."""
    sids = sorted(bars)
    dates = bars[sids[0]].index
    times = list(bars[sids[0]].columns)
    tmin = min(times)                           # zero-padded HH:MM:SS

    daily = pd.DataFrame({s: bars[s][slice_time] for s in sids})
    mavg = daily.rolling(lookback, min_periods=1).mean()
    signals = (daily < mavg).astype(int).astype(float)
    count = signals.abs().sum(axis=1)
    divisor = np.where(count != 0, count, 1)
    weights = signals.div(divisor, axis=0) * allocation

    if max_long is not None:
        # caps contract values: ffill().xs(earliest_time) == value AT the
        # earliest bar, else the last non-null bar of any PRIOR day
        # (engine form: strategies/base.py::_cv_daily_frames)
        at_tmin = pd.DataFrame({s: bars[s][tmin] for s in sids})
        day_last = pd.DataFrame(
            {s: bars[s].apply(
                lambda r: r.dropna().iloc[-1] if r.notna().any() else np.nan,
                axis=1) for s in sids})
        cv_caps = at_tmin.fillna(day_last.ffill().shift(1))
        cv_abs = cv_caps.abs().where(cv_caps != 0)        # 0 -> NaN
        qty = (weights * NLV) / cv_abs
        qty = qty.round()                                  # half-even
        qty = qty.fillna(0.0)
        for s in sids:
            cap = max_long.get(s)
            if cap is not None:
                cap = abs(cap)
                qty[s] = np.where(qty[s] > cap, cap, qty[s])
        weights = qty * cv_caps / NLV

    positions = weights.shift()
    gross = daily.pct_change(fill_method=None) * positions.shift()
    if closed_daily:
        turnover = (positions * 2).abs()
    else:
        turnover = positions.fillna(0).diff().abs()
    if per_share:
        # commissions contract values: groupby(Date).first() == first
        # NON-NULL bar within the day, NO cross-day ffill
        cv_comm = pd.DataFrame(
            {s: bars[s].apply(
                lambda r: r.dropna().iloc[0] if r.notna().any() else np.nan,
                axis=1) for s in sids})
        safe_cv = cv_comm.abs().where(cv_comm != 0)
        commissions = (per_share / safe_cv) * turnover
    else:
        commissions = pd.DataFrame(0.0, index=dates, columns=sids)
    slippage = (turnover * slippage_rate).fillna(0.0) if slippage_rate \
        else pd.DataFrame(0.0, index=dates, columns=sids)
    returns = gross.fillna(0) - commissions - slippage
    return {
        "Signal": signals, "Weight": weights, "AbsWeight": weights.abs(),
        "NetExposure": positions, "AbsExposure": positions.abs(),
        "TotalHoldings": (positions.fillna(0) != 0).astype(int),
        "Turnover": turnover, "Commission": commissions,
        "Slippage": slippage, "Return": returns,
    }


def make_strategy(slice_time: str, lookback: int, closed_daily: bool,
                  per_share: float, slippage_rate: float,
                  max_long: dict[str, float | None] | None, dates):
    class Comm(PerShareCommission):
        BROKER_COMMISSION_PER_SHARE = per_share
        MIN_COMMISSION = 0

    class OnceADayProp(Moonshot):
        CODE = "property-diff-intraday"
        POSITIONS_CLOSED_DAILY = closed_daily
        COMMISSION_CLASS = Comm if per_share else None
        SLIPPAGE_BPS = slippage_rate * 10000.0 if slippage_rate else 0

        def prices_to_signals(self, prices):
            sliced = (prices.where(F.col("time") == slice_time)
                      .drop("time"))
            w = Window.partitionBy("sid").orderBy("date")
            mavg = rolling_mean("close", lookback, w, min_periods=1)
            return sliced.withColumn(
                "signal", F.when(F.col("close") < mavg, 1).otherwise(0))

        def limit_position_sizes(self, prices):
            if max_long is None:
                return None, None
            spark = prices.sparkSession
            rows = [(s, d, None if cap is None else float(cap))
                    for s, cap in max_long.items() for d in dates]
            longs = spark.createDataFrame(
                rows, "sid string, date date, max_quantity double")
            return longs, None

    return OnceADayProp


panel_strategy = st.tuples(
    st.integers(min_value=2, max_value=3),          # n_sids
    st.integers(min_value=3, max_value=6),          # n_dates
    st.integers(min_value=0, max_value=2),          # time grid index
    st.randoms(use_true_random=False),
)

config_strategy = st.tuples(
    st.integers(min_value=1, max_value=3),          # lookback
    st.sampled_from([1.0, 0.5, 0.25]),              # allocation
    st.booleans(),                                  # POSITIONS_CLOSED_DAILY
    st.sampled_from([0.0, 0.01, 0.25]),             # per-share commission
    st.sampled_from([0.0, 0.0005]),                 # slippage rate
    st.booleans(),                                  # use caps
    st.integers(min_value=0, max_value=2),          # slice-time index seed
)


@settings(max_examples=MAX_EXAMPLES, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.too_slow])
@given(panel=panel_strategy, config=config_strategy)
def test_once_a_day_intraday_matches_pandas_reference(spark, panel, config):
    n_sids, n_dates, grid_ix, rng = panel
    (lookback, allocation, closed_daily, per_share, slippage_rate,
     use_caps, slice_ix) = config

    times = TIME_GRIDS[grid_ix]
    slice_time = times[slice_ix % len(times)]
    sids = [f"S{i}" for i in range(n_sids)]
    dates = [datetime.date(2020, 1, 1) + datetime.timedelta(days=d)
             for d in range(n_dates)]
    # NULL-heavy first bars (p=0.35) vs elsewhere (p=0.15): the earliest
    # bar is exactly where the caps/commissions frame-grain split bites
    cells = {
        s: {(d, t): (None
                     if rng.random() < (0.35 if t == times[0] else 0.15)
                     else rng.choice(GRID))
            for d in dates for t in times}
        for s in sids
    }
    max_long = None
    if use_caps:
        max_long = {s: rng.choice([None, 1.0, 2.0, 5.0]) for s in sids}

    bars = {
        s: pd.DataFrame(
            {t: pd.array([cells[s][(d, t)] for d in dates],
                         dtype="float64") for t in times},
            index=pd.Index(dates, name="Date"))
        for s in sids
    }
    want = pandas_once_a_day(bars, slice_time, lookback, allocation,
                             closed_daily, per_share, slippage_rate,
                             max_long)

    rows = [(s, d, t, cells[s][(d, t)])
            for s in sids for d in dates for t in times]
    prices = spark.createDataFrame(
        rows, "sid string, date date, time string, close double")
    strategy = make_strategy(slice_time, lookback, closed_daily, per_share,
                             slippage_rate, max_long, dates)()
    master = spark.createDataFrame([(s, "USD") for s in sids],
                                   "sid string, currency string")
    kwargs = {"allocation": allocation}
    if use_caps:
        kwargs.update(master=master, nlv={"USD": NLV})
    results = strategy.backtest(prices, **kwargs)
    assert "time" not in results.columns

    got: dict[tuple, float | None] = {}
    for r in results.collect():
        v = r["value"]
        if v is not None and isinstance(v, float) and math.isnan(v):
            v = None
        got[(r["field"], r["sid"], r["date"])] = v

    mismatches = []
    for field in FIELDS:
        frame = want[field]
        for s in sids:
            for d in dates:
                w = frame.at[d, s]
                w = None if pd.isna(w) else float(w)
                g = got.get((field, s, d), "MISSING")
                if g != w:
                    mismatches.append((field, s, d, g, w))
    assert not mismatches, (
        f"{len(mismatches)} cells differ (engine vs pandas once-a-day "
        f"reference); first 10: {mismatches[:10]}\n"
        f"slice_time={slice_time} config={config} cells={cells}")
