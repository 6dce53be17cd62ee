"""Pandas-strategy compatibility shim (SURVEY.md §2.9 UDF surface, §7.1-7).

Runs an (almost) unmodified reference-style pandas strategy against the
Spark panel: each hook receives the reference's wide pandas format — a
DataFrame with a ``(Field, Date[, Time])`` MultiIndex and sids as columns —
reconstructed per executor via ``applyInPandas``.

Partitioning contract: the panel is grouped by a hash bucket of ``sid`` so
each Arrow batch holds *complete* series for its sids (time-series hooks
need full history per security).  Cross-sectional logic inside a pandas
hook therefore only sees its bucket's sids — valid for per-sid pipelines
(signals from rolling windows etc.); strategies whose signals depend on the
full cross-section (e.g. ranking all sids) must set ``buckets=1`` or use
the native Spark hooks.

This is the ``gapply``/grouped-map pattern (SNIPPETS.md [1][3]): at scale
each bucket is one Arrow round trip, embarrassingly parallel across
executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType


def run_pandas_signals(prices: DataFrame, prices_to_signals,
                       field_cols: list[str] | None = None,
                       buckets: int = 32) -> DataFrame:
    """Execute a reference-style ``prices_to_signals(prices_panel)`` pandas
    hook over the Spark panel; returns the panel with a ``signal`` column.

    ``prices_to_signals`` takes the reference wide panel (MultiIndex
    ``(Field, Date)``, sid columns — reference base.py:307-309) and returns
    a Date×sid signal matrix, exactly like a Moonshot subclass hook.
    """
    import pandas as pd  # noqa: F401

    # user strategy modules usually aren't importable on executors; ship the
    # hook by value instead of by reference
    import sys

    from pyspark import cloudpickle
    mod = sys.modules.get(getattr(prices_to_signals, "__module__", ""))
    if mod is not None and not mod.__name__.startswith(
            ("moonshot_spark", "pyspark", "builtins", "__main__")):
        try:
            cloudpickle.register_pickle_by_value(mod)
        except Exception:
            pass

    field_cols = field_cols or [c for c in prices.columns
                                if c not in ("sid", "date", "time")]
    is_intraday = "time" in prices.columns
    index_cols = ["date", "time"] if is_intraday else ["date"]
    index_names = ["Field", "Date", "Time"] if is_intraday else ["Field", "Date"]
    out_schema = StructType(
        [prices.schema[c] for c in prices.columns]
        + [StructField("signal", DoubleType(), True)])

    def apply_bucket(pdf):
        import pandas as pd
        # long wide-by-field → reference (Field, Date[, Time]) × sid panel
        frames = {}
        for field in field_cols:
            frames[field.capitalize()] = pdf.pivot(
                index=index_cols, columns="sid", values=field)
        panel = pd.concat(frames, names=index_names)
        signals = prices_to_signals(panel)
        long_sig = signals.stack().rename("signal").reset_index()
        long_sig.columns = [*index_cols, "sid", "signal"]
        long_sig["signal"] = long_sig["signal"].astype("float64")
        return pdf.merge(long_sig, on=[*index_cols, "sid"], how="left")

    bucketed = prices.withColumn("__bucket", F.pmod(F.hash("sid"), buckets))
    result = bucketed.groupBy("__bucket").applyInPandas(
        lambda _, pdf: apply_bucket(pdf.drop(columns="__bucket")),
        out_schema)
    return result


class PandasStrategyAdapter:
    """Wrap a reference-style pandas strategy class so its
    ``prices_to_signals`` runs per-bucket under applyInPandas while the
    rest of the pipeline (weights/positions/returns/costs) runs natively.

    Usage::

        class MyPandasStrategy:                 # unmodified reference-style
            def prices_to_signals(self, prices):
                closes = prices.loc["Close"]
                return (closes < 10).astype(int)

        adapted = PandasStrategyAdapter(MyPandasStrategy(), Moonshot)
        results = adapted.backtest(panel)
    """

    def __init__(self, pandas_strategy, engine_cls=None, buckets: int = 32):
        from moonshot_spark.strategies.base import Moonshot

        engine_cls = engine_cls or Moonshot
        pandas_hook = pandas_strategy.prices_to_signals
        bucket_count = buckets

        class _Adapted(engine_cls):
            def prices_to_signals(self, prices):
                return run_pandas_signals(prices, pandas_hook,
                                          buckets=bucket_count)

        # carry over reference-style config attrs if present
        for attr in ("CODE", "COMMISSION_CLASS", "SLIPPAGE_CLASSES",
                     "SLIPPAGE_BPS", "BENCHMARK", "POSITIONS_CLOSED_DAILY",
                     "ALLOW_REBALANCE", "NLV"):
            if hasattr(pandas_strategy, attr):
                setattr(_Adapted, attr, getattr(pandas_strategy, attr))
        self._engine = _Adapted()

    def backtest(self, *args, **kwargs):
        return self._engine.backtest(*args, **kwargs)

    def trade(self, *args, **kwargs):
        return self._engine.trade(*args, **kwargs)
