"""Lookback pruning (SURVEY.md §2.9 D24, §4).

Reference: base.py:1050-1086 (_get_lookback_window) and base.py:1146-1181
(_get_start_date_with_lookback): compute the minimal history needed before
``start_date`` — max of all ``*_WINDOW`` class attributes (default 252
trading days) plus ``*_INTERVAL`` padding — and convert trading days to
calendar days with a buffer.

This is the engine's partition-pruning lever: the resulting date lands in a
``.where(col("date") >= lit(prune_start))`` that Catalyst pushes into the
Parquet scan (row-group skipping / partition pruning at 100 TB).
"""

from __future__ import annotations

import datetime
import math


def get_lookback_window(strategy) -> int:
    """Max over ``*_WINDOW`` int attributes (default 252), plus padding for
    the largest ``*_INTERVAL`` attribute (reference base.py:1050-1086)."""
    window_attrs = [getattr(strategy, a) for a in dir(strategy)
                    if a.endswith("_WINDOW")]
    windows = [w for w in window_attrs if isinstance(w, int)]
    lookback = max(windows or [252])

    interval_attrs = [getattr(strategy, a) for a in dir(strategy)
                      if a.endswith("_INTERVAL")]
    freqs = {"Y": 365, "Q": 92, "M": 31, "W": 7, "D": 1}
    pad = 0
    for iv in interval_attrs:
        if isinstance(iv, str) and iv and iv[0].upper() in freqs:
            pad = max(pad, freqs[iv[0].upper()])
    return lookback + pad


def lookback_start_date(start_date: str | datetime.date,
                        lookback_window: int) -> datetime.date:
    """Trading-days → calendar-days conversion with buffer (reference
    base.py:1146-1181): 252 trading days ≈ 365 calendar days, plus a
    buffer for holidays."""
    if isinstance(start_date, str):
        start_date = datetime.date.fromisoformat(start_date)
    calendar_days = math.ceil(lookback_window * 365.0 / 252.0) + 10
    return start_date - datetime.timedelta(days=calendar_days)
