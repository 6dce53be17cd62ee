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
    """An explicit ``LOOKBACK_WINDOW`` attribute wins outright (even 0 —
    no derivation, no interval padding); otherwise the max over
    ``*_WINDOW`` int attributes (default 252) plus padding for the
    largest ``*_INTERVAL`` attribute (reference base.py:1050-1086).

    Interval padding counts BUSINESS days per period (the reference
    measures one period of the pandas freq with ``bdate_range``, which
    depends on the current date; this uses the deterministic midpoints —
    same values the reference's own test accepts as a range)."""
    explicit = getattr(strategy, "LOOKBACK_WINDOW", None)
    if explicit is not None:
        return explicit

    window_attrs = [getattr(strategy, a) for a in dir(strategy)
                    if a.endswith("_WINDOW")]
    windows = [w for w in window_attrs if isinstance(w, int)]
    lookback = max(windows or [252])

    interval_attrs = [getattr(strategy, a) for a in dir(strategy)
                      if a.endswith("_INTERVAL")]
    freqs = {"Y": 261, "Q": 66, "M": 22, "W": 5, "D": 1}
    pad = 0
    for iv in interval_attrs:
        if isinstance(iv, str) and iv and iv[0].upper() in freqs:
            pad = max(pad, freqs[iv[0].upper()])
    return lookback + pad


def lookback_start_date(start_date: str | datetime.date,
                        lookback_window: int) -> datetime.date:
    """Trading-days → calendar-days conversion with buffer (reference
    base.py:1146-1181): 260 weekdays − 25 max holidays = 235 trading
    days per 365 calendar days, plus a window-size-dependent buffer —
    none for a zero window, 2 days under one week, else 10."""
    if isinstance(start_date, str):
        start_date = datetime.date.fromisoformat(start_date)
    if lookback_window == 0:
        buffer = 0
    elif lookback_window <= 5:
        buffer = 2
    else:
        buffer = 10
    calendar_days = math.ceil(lookback_window * 365.0 / 235.0) + buffer
    return start_date - datetime.timedelta(days=calendar_days)
