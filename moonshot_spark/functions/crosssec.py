"""Cross-sectional (pandas axis=1) primitives (SURVEY.md §2.4 A1/A5, §2.5 W8/W9).

In the reference the panel is wide (sids as columns), so cross-sectional ops
are ``.sum(axis=1)`` etc. (weight.py:33,60,97-102).  In the long/tidy Spark
form the cross-section at one timestamp is the partition
``Window.partitionBy("date"[, "time"])`` — aggregate windows keep row grain
(no groupBy + join-back, one shuffle on the date key).
"""

from __future__ import annotations

from pyspark.sql import Column, Window, WindowSpec
from pyspark.sql import functions as F

from moonshot_spark.functions.window import ColumnOrName, _c


def _w(w: WindowSpec | None, *date_cols: str) -> WindowSpec:
    return w if w is not None else Window.partitionBy(*(date_cols or ("date",)))


def xs_sum(col: ColumnOrName, w: WindowSpec | None = None) -> Column:
    """Per-date total across sids.  Reference: weight.py:60,97.

    pandas ``sum(axis=1)`` of an all-NaN row is 0.0 (min_count=0), so an
    all-NULL cross-section coalesces to 0.
    """
    return F.coalesce(F.sum(_c(col)).over(_w(w)), F.lit(0.0))


def xs_count_nonzero(col: ColumnOrName, w: WindowSpec | None = None) -> Column:
    """Per-date count of nonzero (and non-null) entries.

    Reference: weight.py:33 ``signals.abs().sum(axis=1)`` on ±1/0 signals —
    i.e. the number of securities with an active signal that day.
    """
    return F.coalesce(F.sum(F.abs(_c(col))).over(_w(w)), F.lit(0.0))


def xs_mean(col: ColumnOrName, w: WindowSpec | None = None) -> Column:
    return F.avg(_c(col)).over(_w(w))


def xs_demean(col: ColumnOrName, w: WindowSpec | None = None) -> Column:
    """v - mean(v) within date — market-neutral centering."""
    return _c(col) - F.avg(_c(col)).over(_w(w))


def xs_zscore(col: ColumnOrName, w: WindowSpec | None = None) -> Column:
    """(v - mean) / std within date (sample std, pandas default ddof=1)."""
    win = _w(w)
    return (_c(col) - F.avg(_c(col)).over(win)) / F.stddev_samp(_c(col)).over(win)


def xs_rank(col: ColumnOrName, date_cols: tuple[str, ...] = ("date",),
            ascending: bool = True) -> Column:
    """Per-date rank across sids (W9 user convention: top-N by signal)."""
    order = _c(col).asc() if ascending else _c(col).desc()
    return F.rank().over(Window.partitionBy(*date_cols).orderBy(order))


def xs_any(cond: Column, w: WindowSpec | None = None) -> Column:
    """pandas ``.any(axis=1)``: does any sid satisfy cond this date?
    Reference: base.py:1800 (all-zero order check)."""
    return F.max(cond.cast("int")).over(_w(w)) == 1


def xs_all(cond: Column, w: WindowSpec | None = None) -> Column:
    return F.min(cond.cast("int")).over(_w(w)) == 1
