"""Weight-allocation operator parity vs the reference pandas formulas
(moonshot/mixins/weight.py:22-113), re-computed here with pandas on the
same fixture (reference _tests/test_weight_allocations.py pattern)."""

import datetime

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from moonshot_spark.operators.weights import (
    allocate_equal_weights,
    allocate_fixed_weights,
    allocate_fixed_weights_capped,
    allocate_market_neutral_fixed_weights_capped,
    neutralize_weights,
)

DATES = [datetime.date(2024, 1, d) for d in range(1, 6)]
SIDS = ["A", "B", "C", "D"]


@pytest.fixture(scope="module")
def signals_pdf():
    rng = np.random.default_rng(3)
    data = rng.choice([-1.0, 0.0, 1.0], size=(len(DATES), len(SIDS)))
    return pd.DataFrame(data, index=DATES, columns=SIDS)


@pytest.fixture(scope="module")
def signals_sdf(spark, signals_pdf):
    rows = [(sid, d, float(signals_pdf.loc[d, sid]))
            for d in DATES for sid in SIDS]
    return spark.createDataFrame(rows, "sid string, date date, signal double")


def collect_weights(sdf, col="weight"):
    return {(r["sid"], r["date"]): r[col] for r in sdf.collect()}


# pandas re-implementations of the reference formulas (weight.py:22-113)

def ref_equal(signals, cap=1.0):
    count = signals.abs().sum(axis=1)
    divisor = np.where(count != 0, count, 1)
    return signals.div(divisor, axis=0) * cap


def ref_fixed_capped(signals, weight, cap=1.0):
    equal = ref_equal(signals, cap)
    fixed = signals * weight
    fixed_sum = fixed.abs().sum(axis=1)
    mask = pd.DataFrame({c: fixed_sum for c in signals.columns},
                        index=signals.index)
    return pd.DataFrame(np.where(mask > cap, equal, fixed),
                        index=signals.index, columns=signals.columns)


def ref_neutralize(weights):
    long_w = weights.where(weights > 0, 0)
    short_w = weights.where(weights < 0, 0)
    tl = pd.DataFrame({c: long_w.sum(axis=1) for c in weights.columns},
                      index=weights.index)
    ts = pd.DataFrame({c: short_w.abs().sum(axis=1) for c in weights.columns},
                      index=weights.index)
    long_w = long_w.where(tl <= ts, long_w * ts / tl.replace(0, 1))
    short_w = short_w.where(ts <= tl, short_w * tl / ts.replace(0, 1))
    return long_w.where(long_w > 0, short_w)


def ref_market_neutral(signals, weight, cap=1.0):
    long_s = signals.where(signals > 0, 0)
    short_s = signals.where(signals < 0, 0)
    lw = ref_fixed_capped(long_s, weight, cap * 0.5)
    sw = ref_fixed_capped(short_s, weight, cap * 0.5)
    return ref_neutralize(lw.where(lw > 0, sw))


def assert_matches(sdf, expected_pdf, col="weight"):
    got = collect_weights(sdf, col)
    for d in DATES:
        for sid in SIDS:
            assert got[(sid, d)] == pytest.approx(expected_pdf.loc[d, sid]), \
                (sid, d)


def test_equal_weights(signals_sdf, signals_pdf):
    assert_matches(allocate_equal_weights(signals_sdf), ref_equal(signals_pdf))


def test_equal_weights_cap(signals_sdf, signals_pdf):
    assert_matches(allocate_equal_weights(signals_sdf, cap=0.5),
                   ref_equal(signals_pdf, cap=0.5))


def test_fixed_weights(signals_sdf, signals_pdf):
    assert_matches(allocate_fixed_weights(signals_sdf, 0.3),
                   signals_pdf * 0.3)


def test_fixed_weights_capped(signals_sdf, signals_pdf):
    assert_matches(allocate_fixed_weights_capped(signals_sdf, 0.6, cap=1.0),
                   ref_fixed_capped(signals_pdf, 0.6, 1.0))


def test_neutralize(signals_sdf, signals_pdf):
    w_sdf = allocate_fixed_weights(signals_sdf, 0.3)
    w_pdf = signals_pdf * 0.3
    assert_matches(neutralize_weights(w_sdf, "weight"), ref_neutralize(w_pdf))


def test_market_neutral_fixed_capped(signals_sdf, signals_pdf):
    assert_matches(
        allocate_market_neutral_fixed_weights_capped(signals_sdf, 0.6, cap=1.0),
        ref_market_neutral(signals_pdf, 0.6, 1.0))


def test_mixin_methods_on_strategy(spark):
    """Reference-style strategies call self.allocate_* / self.neutralize_
    weights as methods (mixins/weight.py surface) — delegates must match
    the module functions."""
    from moonshot_spark import Moonshot
    from pyspark.sql import functions as F

    class S(Moonshot):
        def prices_to_signals(self, prices):
            return prices

        def signals_to_target_weights(self, signals):
            w = self.allocate_fixed_weights_capped(signals, 0.6, cap=1.0)
            return self.neutralize_weights(w)

    import datetime
    d = datetime.date(2024, 6, 3)
    df = spark.createDataFrame(
        [("A", d, 1.0), ("B", d, 1.0), ("C", d, -1.0)],
        "sid string, date date, signal double")
    s = S()
    got = {r["sid"]: r["weight"]
           for r in s.signals_to_target_weights(df).collect()}
    # fixed 0.6 each → |sum| 1.8 > cap → equal weights (1/3 each), then
    # neutralized: long side 2/3 scaled to short side 1/3
    assert got["C"] == pytest.approx(-1 / 3)
    assert got["A"] == pytest.approx((1 / 3) * (1 / 3) / (2 / 3))
    assert got["A"] + got["B"] + got["C"] == pytest.approx(0.0)

    eq = s.allocate_equal_weights(df, cap=0.5)
    got_eq = {r["sid"]: r["weight"] for r in eq.collect()}
    assert got_eq["A"] == pytest.approx(0.5 / 3)

    mn = s.allocate_market_neutral_fixed_weights_capped(df, 0.25, cap=1.0)
    got_mn = {r["sid"]: r["weight"] for r in mn.collect()}
    assert sum(got_mn.values()) == pytest.approx(0.0)
