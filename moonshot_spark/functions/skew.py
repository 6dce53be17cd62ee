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


def salted_agg(df: DataFrame, keys: list[str], aggs: dict[str, Column],
               num_salts: int = 16) -> DataFrame:
    """Two-stage skew-safe aggregation for algebraic aggregates (sum/count/
    min/max): groupBy(keys + salt) → groupBy(keys).

    ``aggs`` maps output column name → aggregate over the input (stage 1);
    stage 2 re-aggregates with the matching combiner (sum for sum/count,
    min for min, max for max — inferred from the expression name).
    """
    salted = with_salt(df, num_salts)
    stage1 = salted.groupBy(*keys, "__salt").agg(
        *[expr.alias(name) for name, expr in aggs.items()])
    combiners = []
    for name in aggs:
        fn = str(aggs[name]._jc).lower()
        if fn.startswith(("min", "min(")) or "min(" in fn:
            combiners.append(F.min(name).alias(name))
        elif "max(" in fn:
            combiners.append(F.max(name).alias(name))
        else:  # sum / count both combine with sum
            combiners.append(F.sum(name).alias(name))
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
