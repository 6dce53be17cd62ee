"""Weight-allocation operators (SURVEY.md §2.9 D1–D5).

Reference semantics: moonshot/mixins/weight.py:22-113.  The reference's wide
panel makes these axis=1 (cross-row) ops; here the cross-section is a
``Window.partitionBy(date_cols)`` aggregate window — the whole allocator
family is pure column arithmetic over ONE cross-sectional shuffle, and
Catalyst collapses the repeated windows over the same key into a single
Window exec.

All functions take and return a DataFrame with the signal/weight in a named
column, preserving every other column (single-lineage design, SURVEY §7.0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _xs(date_cols: tuple[str, ...]):
    return Window.partitionBy(*date_cols)


def allocate_equal_weights(df: DataFrame, signal_col: str = "signal",
                           weight_col: str = "weight", cap: float = 1.0,
                           date_cols: tuple[str, ...] = ("date",)) -> DataFrame:
    """weight = signal / count(active signals that day) * cap; divisor 1 when
    no signals.  Reference: weight.py:22-36 (allocate_equal_weights).
    """
    w = _xs(date_cols)
    count = F.sum(F.abs(F.col(signal_col))).over(w)
    divisor = F.when(count != 0, count).otherwise(F.lit(1.0))
    return df.withColumn(weight_col, F.col(signal_col) / divisor * F.lit(cap))


def allocate_fixed_weights(df: DataFrame, weight: float,
                           signal_col: str = "signal",
                           weight_col: str = "weight") -> DataFrame:
    """weight = signal * fixed weight.  Reference: weight.py:38-46."""
    return df.withColumn(weight_col, F.col(signal_col) * F.lit(weight))


def allocate_fixed_weights_capped(df: DataFrame, weight: float,
                                  signal_col: str = "signal",
                                  weight_col: str = "weight", cap: float = 1.0,
                                  date_cols: tuple[str, ...] = ("date",)) -> DataFrame:
    """Fixed weights, falling back to equal weights on any date where the
    absolute sum of fixed weights exceeds the cap.  Reference: weight.py:48-66.
    """
    w = _xs(date_cols)
    count = F.sum(F.abs(F.col(signal_col))).over(w)
    divisor = F.when(count != 0, count).otherwise(F.lit(1.0))
    equal = F.col(signal_col) / divisor * F.lit(cap)
    fixed = F.col(signal_col) * F.lit(weight)
    fixed_sum = F.sum(F.abs(fixed)).over(w)
    return df.withColumn(weight_col, F.when(fixed_sum > cap, equal).otherwise(fixed))


def neutralize_weights(df: DataFrame, weight_col: str = "weight",
                       out_col: str | None = None,
                       date_cols: tuple[str, ...] = ("date",)) -> DataFrame:
    """Proportionately scale down the overweight side so that per date
    Σ long == |Σ short|.  Reference: weight.py:89-113 (neutralize_weights).

    The reference's ``replace(0, 1)`` divisor guard maps to F.when; the
    long/short recombination ``long.where(long > 0, short)`` maps to a
    conditional on the scaled long side.
    """
    out_col = out_col or weight_col
    w = _xs(date_cols)
    v = F.col(weight_col)
    long_w = F.when(v > 0, v).otherwise(F.lit(0.0))
    short_w = F.when(v < 0, v).otherwise(F.lit(0.0))
    total_long = F.sum(long_w).over(w)
    total_short = F.sum(F.abs(short_w)).over(w)
    long_div = F.when(total_long == 0, F.lit(1.0)).otherwise(total_long)
    short_div = F.when(total_short == 0, F.lit(1.0)).otherwise(total_short)
    scaled_long = F.when(total_long <= total_short, long_w).otherwise(
        long_w * total_short / long_div)
    scaled_short = F.when(total_short <= total_long, short_w).otherwise(
        short_w * total_long / short_div)
    return df.withColumn(out_col, F.when(scaled_long > 0, scaled_long)
                         .otherwise(scaled_short))


def allocate_market_neutral_fixed_weights_capped(
        df: DataFrame, weight: float, signal_col: str = "signal",
        weight_col: str = "weight", cap: float = 1.0,
        neutralize: bool = True,
        date_cols: tuple[str, ...] = ("date",)) -> DataFrame:
    """Fixed capped weights applied to long and short sides separately
    (cap/2 each), then neutralized.  Reference: weight.py:68-87.
    """
    w = _xs(date_cols)
    cap_side = cap * 0.5
    s = F.col(signal_col)
    for side, mask in (("__long", F.when(s > 0, s).otherwise(F.lit(0.0))),
                       ("__short", F.when(s < 0, s).otherwise(F.lit(0.0)))):
        count = F.sum(F.abs(mask)).over(w)
        divisor = F.when(count != 0, count).otherwise(F.lit(1.0))
        equal = mask / divisor * F.lit(cap_side)
        fixed = mask * F.lit(weight)
        fixed_sum = F.sum(F.abs(fixed)).over(w)
        df = df.withColumn(side, F.when(fixed_sum > cap_side, equal).otherwise(fixed))
    df = df.withColumn(weight_col, F.when(F.col("__long") > 0, F.col("__long"))
                       .otherwise(F.col("__short"))).drop("__long", "__short")
    if neutralize:
        df = neutralize_weights(df, weight_col, date_cols=date_cols)
    return df
