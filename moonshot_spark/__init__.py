"""moonshot_spark — a PySpark-native vectorized backtesting & analytics engine.

A from-scratch re-expression of the capabilities of quantrocket-llc/moonshot
(reference: /root/reference) on Apache Spark.  The reference is a single-node
pandas dataflow engine; this package re-derives its data model and operator
inventory as idiomatic Spark DataFrame / SQL plans so the same pipelines run
on a multi-executor cluster at 100 TB scale.

Design (see SURVEY.md §7):

- The central "prices panel" (reference: pandas DataFrame with a
  ``(Field, Date[, Time])`` row MultiIndex and securities as columns,
  ``moonshot/strategies/base.py:307-309``) becomes a **long DataFrame pivoted
  wide by field**: one row per ``(sid, date[, time])`` with one column per
  field (open/close/volume/...).  Index-aligned pandas arithmetic becomes
  same-row column arithmetic on a single lineage — no joins, no shuffles.
- Per-sid time-series operators (shift/pct_change/rolling/ffill) are Spark
  window functions over ``Window.partitionBy("sid").orderBy("date")``.
- Cross-sectional (pandas axis=1) operators are windows over
  ``Window.partitionBy("date")``.
- Dimension tables (securities master, FX rates, balances) are broadcast
  joins.
- The user-facing API is the same template-method class surface as the
  reference (``Moonshot`` with ``prices_to_signals`` etc. hooks), but hooks
  receive and return Spark DataFrames.
"""

from moonshot_spark.strategies.base import Moonshot
from moonshot_spark.strategies.ml import MoonshotML
from moonshot_spark import commission, exceptions, slippage

__version__ = "0.1.0"

# same top-level surface as the reference package (__init__.py:36-44:
# Moonshot, MoonshotML, slippage, commission), plus exceptions
__all__ = ["Moonshot", "MoonshotML", "commission", "exceptions",
           "slippage", "__version__"]
