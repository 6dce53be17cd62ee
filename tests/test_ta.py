"""Technical-analysis indicator library (functions/ta.py).

Pins (1) numerical agreement between the production windowed forms and
the fold-exact catalog forms (queries ta_bollinger_rsi /
ta_macd_stoch_obv), (2) pandas parity for the classic definitions, and
(3) the single-shuffle plan property of the stacked indicator pipeline.
"""

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from moonshot_spark.functions.ta import (
    bollinger, macd_sma_line, obv, rsi_cutler, sma, stochastic_k,
    true_range, with_indicators,
)
from moonshot_spark.queries import QUERIES
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def panel(spark):
    from moonshot_spark.sources.parquet import events_to_panel
    return events_to_panel(spark, SF_DIR).cache()


@pytest.fixture(scope="module")
def indicators_pdf(spark, panel):
    return (with_indicators(panel)
            .orderBy("sid", "date").toPandas())


def _pandas_panel(panel):
    return (panel.toPandas()
            .sort_values(["sid", "date"]).reset_index(drop=True))


def test_bollinger_matches_pandas(indicators_pdf, panel):
    pdf = _pandas_panel(panel)
    g = pdf.groupby("sid")["close"]
    mid = g.transform(lambda s: s.rolling(20, min_periods=1).mean())
    sd = g.transform(lambda s: s.rolling(20, min_periods=1).std())
    got = indicators_pdf
    assert got["bb_mid"].values == pytest.approx(mid.values, rel=1e-9)
    # NULL std on 1-row frames both sides
    assert (got["bb_upper"] - (mid + 2 * sd)).abs().max() < 1e-9 \
        or (got["bb_upper"].isna() == (mid + 2 * sd).isna()).all()


def test_rsi_bounded_and_pandas_parity(indicators_pdf, panel):
    pdf = _pandas_panel(panel)

    def cutler(s):
        chg = s.diff()
        gain = chg.clip(lower=0).rolling(14, min_periods=1).mean()
        loss = (-chg.clip(upper=0)).rolling(14, min_periods=1).mean()
        return 100 * gain / (gain + loss)

    exp = pdf.groupby("sid")["close"].transform(cutler)
    got = indicators_pdf["rsi"]
    both = got.notna() & exp.notna()
    assert got[both].values == pytest.approx(exp[both].values, rel=1e-6)
    assert got.dropna().between(0, 100).all()


def test_stochastic_bounds_and_obv_head(indicators_pdf):
    k = indicators_pdf["stoch_k"].dropna()
    assert k.between(-1e-9, 100 + 1e-9).all()
    # OBV starts at 0 on each sid's first row (no prior close)
    firsts = indicators_pdf.groupby("sid").head(1)
    assert (firsts["obv"].astype(float) == 0).all()


def test_windowed_forms_match_fold_exact_catalog(spark, indicators_pdf):
    """The ta.py windowed implementations and the catalog's fold-exact
    oracles are the same math — tie them together numerically."""
    cat = (QUERIES["ta_bollinger_rsi"](spark, SF_DIR)
           .orderBy("sid", "date").toPandas())
    got = indicators_pdf
    for col in ("bb_mid", "bb_upper", "bb_lower", "bb_pct_b", "rsi"):
        a, b = got[col], cat[col]
        both = a.notna() & b.notna()
        assert a[both].values == pytest.approx(b[both].values, rel=1e-9), col
        assert (a.isna() == b.isna()).all(), col
    cat2 = (QUERIES["ta_macd_stoch_obv"](spark, SF_DIR)
            .orderBy("sid", "date").toPandas())
    for col in ("macd_line", "macd_signal", "stoch_k", "stoch_d", "atr",
                "obv"):
        a = got[col].astype(float)
        b = cat2[col].astype(float)
        both = a.notna() & b.notna()
        assert a[both].values == pytest.approx(b[both].values, rel=1e-9), col


def test_true_range_first_row_fallback(spark):
    rows = [("A", "2024-01-01", 10.0, 8.0, 9.0),
            ("A", "2024-01-02", 11.0, 10.5, 10.9),
            ("A", "2024-01-03", 10.0, 6.0, 7.0)]
    df = (spark.createDataFrame(rows, ["sid", "date", "high", "low", "close"])
          .withColumn("date", F.to_date("date")))
    out = (df.select("sid", "date", true_range().alias("tr"))
           .orderBy("date").toPandas())
    assert out["tr"][0] == pytest.approx(2.0)        # H-L fallback
    assert out["tr"][1] == pytest.approx(2.0)        # |H - prevC| = 11-9
    assert out["tr"][2] == pytest.approx(4.9)        # |L - prevC| = 10.9-6


def test_indicator_stack_single_shuffle(spark):
    """The full stack (9 indicator families, 8 frames, a lag and a
    cumulative sum) must share ONE sid exchange beyond the panel's own
    (sid, date) aggregation shuffle — stacked WindowExec over the same
    sort, no extra shuffles as indicators are added."""
    from moonshot_spark.sources.parquet import events_to_panel
    spark.catalog.clearCache()   # cached fixtures would splice their own
    # InMemoryRelation build plan (and its exchanges) into the plan text
    stacked = with_indicators(events_to_panel(spark, SF_DIR))
    plan = stacked._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 2, plan
