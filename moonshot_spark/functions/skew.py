"""Skew mitigation utilities (SURVEY §4: "skewed keys → salting or AQE").

AQE's skew-join splitting handles most cases at runtime; these helpers
cover the two patterns AQE can't fix:

- ``salted_agg``: a two-stage aggregation for heavily skewed group keys —
  partial-aggregate on (key, salt), then final-aggregate on key.  The hot
  key's rows spread over ``num_salts`` reducers in stage one.
- ``salted_join``: replicate the small side per salt so a skewed large-side
  key joins against every salt bucket.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, num_salts: int = 16,
              salt_col: str = "__salt") -> DataFrame:
    """Deterministic row salt in [0, num_salts): spreads a hot key's rows
    across reducers.  Derived from a hash of all columns rather than
    rand() so plans stay reproducible."""
    h = F.hash(*[F.col(c) for c in df.columns])
    return df.withColumn(salt_col, F.pmod(h, F.lit(num_salts)).cast("int"))


_COMBINERS = {"sum": F.sum, "min": F.min, "max": F.max}


def salted_agg(df: DataFrame, keys: list[str],
               aggs: dict[str, Column | tuple[Column, str]],
               num_salts: int = 16) -> DataFrame:
    """Two-stage skew-safe aggregation for decomposable aggregates:
    groupBy(keys + salt) → groupBy(keys).

    ``aggs`` maps output column name → either a Column aggregate (combined
    with ``sum`` in stage 2 — correct for sum and count) or an explicit
    ``(Column, combiner)`` pair with combiner in {"sum", "min", "max"}.
    Non-decomposable aggregates (avg, stddev, distinct counts) must be
    rewritten as sums before salting (e.g. avg = sum/count) — there is no
    way to combine their per-salt partials, so they are rejected by
    construction here rather than silently mis-combined.
    """
    salted = with_salt(df, num_salts)
    exprs, combiners = [], []
    for name, spec in aggs.items():
        if isinstance(spec, tuple):
            expr, combiner = spec
            if combiner not in _COMBINERS:
                raise ValueError(
                    f"unsupported combiner {combiner!r} for {name!r}; "
                    f"choose one of {sorted(_COMBINERS)}")
        else:
            expr, combiner = spec, "sum"
        exprs.append(expr.alias(name))
        combiners.append(_COMBINERS[combiner](name).alias(name))
    stage1 = salted.groupBy(*keys, "__salt").agg(*exprs)
    return stage1.groupBy(*keys).agg(*combiners)


def salted_join(large: DataFrame, small: DataFrame, key: str,
                num_salts: int = 16) -> DataFrame:
    """Skew-safe equi-join: salt the large side, replicate the small side
    across all salt values, join on (key, salt)."""
    salted_large = large.withColumn(
        "__salt", F.pmod(F.hash(*[F.col(c) for c in large.columns]),
                         F.lit(num_salts)).cast("int"))
    replicated_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1))))
    return (salted_large.join(replicated_small, [key, "__salt"])
            .drop("__salt"))
