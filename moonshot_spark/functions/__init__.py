"""Column-expression function library.

Pandas-faithful time-series and cross-sectional primitives, expressed as
pure ``pyspark.sql.functions`` compositions so every call stays inside
whole-stage codegen (no Python UDFs in the hot path).
"""

from moonshot_spark.functions.window import (
    sid_window,
    date_window,
    shift,
    lead,
    pct_change,
    diff,
    ffill,
    rolling_mean,
    rolling_sum,
    rolling_min,
    rolling_max,
    rolling_std,
    cum_sum,
    cum_prod,
    cum_max,
    days_since_prev,
)
from moonshot_spark.functions.crosssec import (
    xs_sum,
    xs_count_nonzero,
    xs_mean,
    xs_demean,
    xs_zscore,
    xs_rank,
    xs_any,
    xs_all,
)

__all__ = [
    "sid_window", "date_window",
    "shift", "lead", "pct_change", "diff", "ffill",
    "rolling_mean", "rolling_sum", "rolling_min", "rolling_max", "rolling_std",
    "cum_sum", "cum_prod", "cum_max", "days_since_prev",
    "xs_sum", "xs_count_nonzero", "xs_mean", "xs_demean", "xs_zscore",
    "xs_rank", "xs_any", "xs_all",
]
