"""Property-based differential test vs the reference TRADE semantics
(VERDICT r9 item 3, extending the r8/r9 backtest differential):
random small panels, random account allocations / balances (incl.
least-of multi-field NLV), random FX regimes, random existing
positions / open orders, and ALLOW_REBALANCE in {True, False, float}
run through BOTH ``Moonshot.trade`` and a pandas re-expression of the
reference's order pipeline (reference moonshot/strategies/base.py:
1595-1806: today-weights × allocations → NLV × FX rate / |contract
value| → round-half-even → position/order netting → ALLOW_REBALANCE
gating → order stubs; :1850-1851 for the positions+orders combine).

Orders are compared as exact (sid, account, action, total_quantity)
sets, including the "no orders → None" gate (reference :1800-1801).

Float discipline mirrors the backtest differential: closes on a
quarter grid, NLVs/rates/allocations on binary-fraction grids — every
derived value is two-operand double arithmetic with identical
association order in both expressions, so quantity rounding
(numpy/Spark bround half-even) sees bit-identical inputs and the
comparison is exact, not approximate.
"""

import datetime
import os

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from moonshot_spark import Moonshot
from moonshot_spark.functions.window import rolling_mean
from moonshot_spark.sources.local import local_df

GRID = [i * 0.25 for i in range(1, 257)]

MAX_EXAMPLES = int(os.environ.get("MOONSHOT_PROPERTY_EXAMPLES", "50"))

EUR_USD = 1.25   # exact in binary


def pandas_trade(closes: pd.DataFrame, lookback: int,
                 allocations: dict[str, float],
                 balances: dict[str, tuple[str, float, float]],
                 use_two_fields: bool,
                 master_usd: bool,
                 existing: dict[tuple[str, str], int] | None,
                 allow_rebalance):
    """Reference trade pipeline re-expressed (base.py:1595-1806)."""
    # signals -> equal weights -> today slice (reference default hooks
    # + _weights_to_today_weights)
    mavg = closes.rolling(lookback, min_periods=1).mean()
    signals = ((closes < mavg).astype(int)
               - (closes > mavg).astype(int)).astype(float)
    count = signals.abs().sum(axis=1)
    divisor = np.where(count != 0, count, 1)
    weights = signals.div(divisor, axis=0)
    signal_date = closes.index[-1]
    today = weights.loc[signal_date]                       # Series by sid

    # contract values: ffill, slice at signal date (base.py:1622-1624)
    cv = closes.ffill().loc[signal_date]

    accounts = list(allocations)
    sids = list(closes.columns)
    orders = []
    for acct in accounts:
        ccy, nlv1, nlv2 = balances[acct]
        nlv = min(nlv1, nlv2) if use_two_fields else nlv1
        # FX: trade ccy is USD when a master is given, else = base ccy
        # (rate 1); EUR account trading USD gets the EUR->USD rate
        # (base.py:1695-1726)
        rate = EUR_USD if (master_usd and ccy == "EUR") else 1.0
        for sid in sids:
            w = today[sid] * allocations[acct]
            c = cv[sid]
            denom = abs(c) if (not pd.isna(c) and c != 0) else np.nan
            tq = w * nlv * rate / denom
            tq = 0 if pd.isna(tq) else int(np.round(tq))   # half-even
            if existing is not None:
                ex = existing.get((sid, acct), 0)
                net = tq - ex
                if allow_rebalance is not True:
                    is_reb = (tq > 0 and ex > 0) or (tq < 0 and ex < 0)
                    if allow_rebalance is False:
                        if is_reb:
                            net = 0
                    else:
                        if is_reb and abs(net / ex) < allow_rebalance:
                            net = 0
            else:
                net = tq
            if net != 0:
                orders.append((sid, acct, "BUY" if net > 0 else "SELL",
                               abs(net)))
    return sorted(orders) or None


def make_strategy(lookback: int, allow_rebalance):
    class PropTradeStrategy(Moonshot):
        CODE = "property-diff-trade"
        ALLOW_REBALANCE = allow_rebalance
        ACCOUNT_BALANCE_FIELD = None     # set per-case below

        def prices_to_signals(self, prices):
            w = Window.partitionBy("sid").orderBy("date")
            mavg = rolling_mean("close", lookback, w, min_periods=1)
            return prices.withColumn(
                "signal",
                F.when(F.col("close") < mavg, 1)
                .when(F.col("close") > mavg, -1).otherwise(0))

    return PropTradeStrategy


panel_strategy = st.tuples(
    st.integers(min_value=2, max_value=4),          # n_sids
    st.integers(min_value=3, max_value=6),          # n_dates
    st.randoms(use_true_random=False),
)

config_strategy = st.tuples(
    st.integers(min_value=1, max_value=3),          # lookback
    st.integers(min_value=1, max_value=2),          # n_accounts
    st.booleans(),                                  # two balance fields
    st.booleans(),                                  # master (FX) on
    st.sampled_from(["none", "some"]),              # positions/orders
    st.sampled_from([True, False, 0.25, 0.5]),      # ALLOW_REBALANCE
)


@settings(max_examples=MAX_EXAMPLES, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.too_slow])
@given(panel=panel_strategy, config=config_strategy)
def test_trade_matches_pandas_reference(spark, panel, config):
    n_sids, n_dates, rng = panel
    lookback, n_accounts, two_fields, master_usd, existing_mode, \
        allow_rebalance = config

    sids = [f"S{i}" for i in range(n_sids)]
    dates = [datetime.date(2021, 3, 1) + datetime.timedelta(days=d)
             for d in range(n_dates)]
    cells = {
        sid: [None if rng.random() < 0.15 else rng.choice(GRID)
              for _ in dates]
        for sid in sids
    }
    accounts = [f"U{i + 1}" for i in range(n_accounts)]
    allocations = {a: rng.choice([1.0, 0.5, 0.25]) for a in accounts}
    balances = {a: (rng.choice(["USD", "EUR"]),
                    rng.choice([250000.0, 500000.0, 1000000.0]),
                    rng.choice([125000.0, 750000.0, 1000000.0]))
                for a in accounts}
    existing = None
    if existing_mode == "some":
        existing = {}
        for sid in sids:
            for a in accounts:
                if rng.random() < 0.5:
                    q = rng.choice([-40, -5, -1, 1, 5, 40])
                    existing[(sid, a)] = q
        if not existing:
            existing = {(sids[0], accounts[0]): 7}

    closes_pd = pd.DataFrame({s: pd.array(cells[s], dtype="float64")
                              for s in sids},
                             index=pd.Index(dates, name="Date"))
    want = pandas_trade(closes_pd, lookback, allocations, balances,
                        two_fields, master_usd, existing, allow_rebalance)

    rows = [(s, d, cells[s][i]) for s in sids for i, d in enumerate(dates)]
    prices = spark.createDataFrame(rows, "sid string, date date, close double")

    bal_rows = [(a, balances[a][0], balances[a][1], balances[a][2])
                for a in accounts]
    bal_df = local_df(spark, bal_rows,
                      "account string, currency string, "
                      "net_liquidation double, cash_balance double")
    rates_df = local_df(spark, [("EUR", "USD", EUR_USD)],
                        "base_currency string, quote_currency string, "
                        "rate double") if master_usd else None
    master = (prices.select("sid").distinct()
              .select("sid", F.lit("STK").alias("sec_type"),
                      F.lit("USD").alias("currency"))) if master_usd else None
    positions = None
    if existing is not None:
        # split each existing quantity between a position and an open
        # order so the full-outer positions+orders combine is exercised
        pos_rows, ord_rows = [], []
        for (sid, a), q in existing.items():
            if abs(q) > 1 and rng.random() < 0.5:
                pos_rows.append((sid, a, q - (1 if q > 0 else -1)))
                ord_rows.append((sid, a, 1 if q > 0 else -1))
            elif rng.random() < 0.5:
                ord_rows.append((sid, a, q))
            else:
                pos_rows.append((sid, a, q))
        sch = "sid string, account string, quantity long"
        positions = local_df(spark, pos_rows, sch) if pos_rows else None
        open_orders = local_df(spark, ord_rows, sch) if ord_rows else None
    else:
        open_orders = None

    cls = make_strategy(lookback, allow_rebalance)
    cls.ACCOUNT_BALANCE_FIELD = (
        ["net_liquidation", "cash_balance"] if two_fields
        else "net_liquidation")
    orders = cls().trade(
        prices, allocations, bal_df, exchange_rates=rates_df,
        positions=positions, open_orders=open_orders, master=master,
        review_date=dates[-1].isoformat())

    if orders is None:
        got = None
    else:
        got = sorted((r["sid"], r["account"], r["action"],
                      int(r["total_quantity"])) for r in orders.collect())
    assert got == want, (
        f"orders differ\n got={got}\nwant={want}\n"
        f"config={config} cells={cells} alloc={allocations} "
        f"bal={balances} existing={existing}")
