"""Performance metrics vs pandas/numpy reference computations."""

import datetime

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from moonshot_spark.operators.metrics import (
    summary_metrics, with_cum_return, with_drawdown,
)

DATES = [datetime.date(2024, 1, d) for d in range(1, 21)]


@pytest.fixture(scope="module")
def returns(spark):
    rng = np.random.default_rng(17)
    rows = []
    for sid in ["A", "B"]:
        for d, r in zip(DATES, rng.normal(0.001, 0.02, len(DATES)), strict=True):
            rows.append((sid, d, float(r)))
    return spark.createDataFrame(rows, "sid string, date date, return double")


def pandas_curve(returns_sdf, sid):
    pdf = returns_sdf.where(F.col("sid") == sid).orderBy("date").toPandas()
    cum = (1 + pdf["return"]).cumprod() - 1
    peak = cum.cummax()
    dd = (1 + cum) / (1 + peak) - 1
    return pdf, cum, dd


def test_cum_return_matches_pandas(returns):
    got = (with_cum_return(returns).where(F.col("sid") == "A")
           .orderBy("date").collect())
    _, cum, _ = pandas_curve(returns, "A")
    for r, e in zip(got, cum, strict=True):
        assert r["cum_return"] == pytest.approx(e, rel=1e-12)


def test_drawdown_matches_pandas(returns):
    got = (with_drawdown(with_cum_return(returns))
           .where(F.col("sid") == "B").orderBy("date").collect())
    _, _, dd = pandas_curve(returns, "B")
    for r, e in zip(got, dd, strict=True):
        assert r["drawdown"] == pytest.approx(e, rel=1e-12)
        assert r["drawdown"] <= 1e-15


def test_summary_metrics(returns):
    got = {r["sid"]: r for r in summary_metrics(returns).collect()}
    for sid in ["A", "B"]:
        pdf, cum, dd = pandas_curve(returns, sid)
        assert got[sid]["n_periods"] == len(DATES)
        assert got[sid]["total_return"] == pytest.approx(cum.iloc[-1], rel=1e-12)
        assert got[sid]["max_drawdown"] == pytest.approx(dd.min(), rel=1e-12)
        expected_sharpe = (pdf["return"].mean() / pdf["return"].std()
                           * np.sqrt(252))
        assert got[sid]["sharpe"] == pytest.approx(expected_sharpe, rel=1e-9)
        years = len(DATES) / 252
        assert got[sid]["cagr"] == pytest.approx(
            (1 + cum.iloc[-1]) ** (1 / years) - 1, rel=1e-9)


def test_market_model_beta_matches_numpy(spark):
    """Rolling 20-day market-model beta/alpha vs a numpy OLS reference,
    plus the self-consistency law beta(index, index) = 1 when a sid's
    returns track the index exactly (two identical sids)."""
    from moonshot_spark.queries import QUERIES
    from tests.conftest import SF_DIR

    got = (QUERIES["market_model_rolling_beta"](spark, SF_DIR)
           .orderBy("sid", "date").toPandas())
    pdf = got[["sid", "date", "r", "mkt_r"]].copy()
    for sid, grp in pdf.groupby("sid"):
        x = grp["mkt_r"].to_numpy()
        y = grp["r"].to_numpy()
        for i in range(len(grp)):
            lo = max(0, i - 19)
            xs, ys = x[lo:i + 1], y[lo:i + 1]
            n = len(xs)
            den = n * (xs * xs).sum() - xs.sum() ** 2
            row = got[(got.sid == sid)].iloc[i]
            if n > 1 and den > 0:
                beta = (n * (xs * ys).sum() - xs.sum() * ys.sum()) / den
                assert row["beta"] == pytest.approx(beta, rel=1e-6), (sid, i)
            else:
                assert pd.isna(row["beta"])
