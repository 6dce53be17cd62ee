"""Lookback pruning tests (D24, reference base.py:1050-1086,1146-1181)."""

import datetime

from moonshot_spark import Moonshot
from moonshot_spark.plans.lookback import get_lookback_window, lookback_start_date


def test_default_lookback():
    class S(Moonshot):
        pass

    assert get_lookback_window(S()) == 252


def test_max_of_window_attrs():
    class S(Moonshot):
        SHORT_WINDOW = 50
        LONG_WINDOW = 300

    assert get_lookback_window(S()) == 300


def test_interval_padding():
    class S(Moonshot):
        MAVG_WINDOW = 100
        REBALANCE_INTERVAL = "Q"

    assert get_lookback_window(S()) == 100 + 92


def test_lookback_start_date():
    start = lookback_start_date("2024-06-01", 252)
    # 252 trading days ≈ 365 calendar + 10 buffer
    assert start == datetime.date(2024, 6, 1) - datetime.timedelta(days=375)
    assert lookback_start_date("2024-06-01", 10) \
        == datetime.date(2024, 6, 1) - datetime.timedelta(days=25)
