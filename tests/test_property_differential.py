"""Property-based differential test vs the reference backtest semantics
(VERDICT r8 #6): random small panels (2-4 sids × 4-8 dates, random NaN
placement) and random pipeline configs (signal lookback, allocation,
POSITIONS_CLOSED_DAILY, commission/slippage on or off) run through BOTH
the Spark engine and a minimal pandas re-expression of the reference's
default hook chain (reference moonshot/strategies/base.py:1340-1351:
equal-weight allocation → weights.shift() → pct_change()*positions.
shift() → turnover → commission/slippage → returns), comparing every
output field cell for cell.

This is the insurance the fixed goldens can't give: NaN/alignment edge
regressions (first-bar NULLs, all-NaN windows, zero-signal days,
commission-NaN propagation) surface on generated data.

Float discipline: closes are multiples of 0.25 in [0.25, 64], so rolling
sums are EXACT in binary floating point — pandas' sliding-window summation
and Spark's frame re-aggregation produce bit-identical means, and every
later step is two-operand double arithmetic (deterministic across
engines).  Comparisons are therefore exact, not approximate.
``pct_change`` uses fill_method=None semantics (the engine's pinned
NULL-propagation contract, functions/window.py:58).
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
from moonshot_spark.commission.base import PercentageCommission
from moonshot_spark.functions.window import rolling_mean

FIELDS = ("Signal", "Weight", "AbsWeight", "NetExposure", "AbsExposure",
          "TotalHoldings", "Turnover", "Commission", "Slippage", "Return")

# closes on a quarter grid: all rolling sums exactly representable
GRID = [i * 0.25 for i in range(1, 257)]

# 50 examples (~7 min) in the default suite; the judged 200+-example run
# (MOONSHOT_PROPERTY_EXAMPLES=200, hypothesis derandomized so the 200 are
# a superset of the default 50) is executed per round and recorded in
# COVERAGE.md.
MAX_EXAMPLES = int(os.environ.get("MOONSHOT_PROPERTY_EXAMPLES", "50"))


def pandas_backtest(closes: pd.DataFrame, lookback: int, allocation: float,
                    closed_daily: bool, commission_rate: float,
                    slippage_rate: float) -> dict[str, pd.DataFrame]:
    """Reference default hook chain, re-expressed line for line
    (reference base.py:1340-1351 and the default hooks at :382/:430/:474,
    _positions_to_turnover at :701, PercentageCommission at
    commission/base.py:154-171, FixedSlippage at slippage/fixed.py)."""
    mavg = closes.rolling(lookback, min_periods=1).mean()
    signals = (closes < mavg).astype(int).astype(float)
    count = signals.abs().sum(axis=1)
    divisor = np.where(count != 0, count, 1)
    weights = signals.div(divisor, axis=0) * 1.0         # equal weights
    weights = weights * allocation
    positions = weights.shift()
    gross = closes.pct_change(fill_method=None) * positions.shift()
    if closed_daily:
        turnover = (positions * 2).abs()
    else:
        turnover = positions.fillna(0).diff().abs()
    if commission_rate:
        commissions = turnover * commission_rate          # no fillna: the
        # reference propagates the NaN first-row turnover into Return
    else:
        commissions = pd.DataFrame(0.0, index=positions.index,
                                   columns=positions.columns)
    slippage = (turnover * slippage_rate).fillna(0.0) if slippage_rate \
        else pd.DataFrame(0.0, index=positions.index,
                          columns=positions.columns)
    returns = gross.fillna(0) - commissions - slippage
    return {
        "Signal": signals, "Weight": weights, "AbsWeight": weights.abs(),
        "NetExposure": positions, "AbsExposure": positions.abs(),
        "TotalHoldings": (positions.fillna(0) != 0).astype(int),
        "Turnover": turnover, "Commission": commissions,
        "Slippage": slippage, "Return": returns,
    }


def make_strategy(lookback: int, closed_daily: bool, commission_rate: float,
                  slippage_rate: float):
    class Comm(PercentageCommission):
        BROKER_COMMISSION_RATE = commission_rate
        EXCHANGE_FEE_RATE = 0.0

    class PropStrategy(Moonshot):
        CODE = "property-diff"
        POSITIONS_CLOSED_DAILY = closed_daily
        COMMISSION_CLASS = Comm if commission_rate else None
        SLIPPAGE_BPS = slippage_rate * 10000.0 if slippage_rate else 0

        def prices_to_signals(self, prices):
            w = Window.partitionBy("sid").orderBy("date")
            mavg = rolling_mean("close", lookback, w, min_periods=1)
            return prices.withColumn(
                "signal",
                F.when(F.col("close") < mavg, 1).otherwise(0))

    return PropStrategy


panel_strategy = st.tuples(
    st.integers(min_value=2, max_value=4),          # n_sids
    st.integers(min_value=4, max_value=8),          # n_dates
    st.randoms(use_true_random=False),
)

config_strategy = st.tuples(
    st.integers(min_value=1, max_value=3),          # lookback
    st.sampled_from([1.0, 0.5, 0.25]),              # allocation
    st.booleans(),                                  # POSITIONS_CLOSED_DAILY
    st.sampled_from([0.0, 0.001]),                  # commission rate
    st.sampled_from([0.0, 0.0005]),                 # slippage rate
)


@settings(max_examples=MAX_EXAMPLES, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.too_slow])
@given(panel=panel_strategy, config=config_strategy)
def test_backtest_matches_pandas_reference(spark, panel, config):
    n_sids, n_dates, rng = panel
    lookback, allocation, closed_daily, commission_rate, slippage_rate = \
        config

    sids = [f"S{i}" for i in range(n_sids)]
    dates = [datetime.date(2020, 1, 1) + datetime.timedelta(days=d)
             for d in range(n_dates)]
    cells = {
        sid: [None if rng.random() < 0.15 else rng.choice(GRID)
              for _ in dates]
        for sid in sids
    }

    closes_pd = pd.DataFrame({s: pd.array(cells[s], dtype="float64")
                              for s in sids},
                             index=pd.Index(dates, name="Date"))
    want = pandas_backtest(closes_pd, lookback, allocation, closed_daily,
                           commission_rate, slippage_rate)

    rows = [(s, d, cells[s][i]) for s in sids for i, d in enumerate(dates)]
    prices = spark.createDataFrame(rows, "sid string, date date, close double")
    strategy = make_strategy(lookback, closed_daily, commission_rate,
                             slippage_rate)()
    results = strategy.backtest(prices, allocation=allocation)

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
        f"{len(mismatches)} cells differ (engine vs pandas reference); "
        f"first 10: {mismatches[:10]}\nconfig={config} cells={cells}")
