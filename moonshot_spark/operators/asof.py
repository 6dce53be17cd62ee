"""As-of (point-in-time) join operator (SURVEY.md §2.3 J7).

Reference: base.py:790-795,831 — select the latest right-side row whose
ordering key is ≤ the left row's key, per partition key (pandas
``merge_asof`` semantics, backward direction).

Spark strategy: the union trick — tag both sides, union, sort per key by
(time, side), forward-fill the right side's values, keep left rows.  One
shuffle on the `by` key, no range join / no per-row subquery: at 100 TB
this is a single sort-merge pass, where a naive range join would explode
quadratically within each key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str, by: list[str] | str,
              value_cols: list[str] | None = None,
              tolerance: None = None,
              allow_exact_matches: bool = True) -> DataFrame:
    """Backward as-of join: for each left row, append the most recent right
    values with right.on ≤ left.on (strictly < when
    ``allow_exact_matches=False``), within the same `by` key.

    Ties on (on) between a left and right row resolve by `allow_exact_matches`
    via side ordering: exact matches order the right row first (visible) or
    after (invisible).
    """
    by = [by] if isinstance(by, str) else list(by)
    value_cols = value_cols or [c for c in right.columns
                                if c not in set(by) | {on}]

    l_tagged = left.select(
        *by, F.col(on),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
          for c in value_cols],
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"))
    r_tagged = right.select(
        *by, F.col(on),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
        F.lit(None).cast(
            l_tagged.schema["__l"].dataType).alias("__l"))

    unioned = l_tagged.unionByName(r_tagged)
    # exact matches visible → right (side 0) sorts before left (side 1) at
    # equal `on`; for strict inequality flip the side order
    side_order = F.col("__side").asc() if allow_exact_matches \
        else F.col("__side").desc()
    w = Window.partitionBy(*by).orderBy(F.col(on).asc(), side_order) \
        .rowsBetween(Window.unboundedPreceding, 0)
    filled = unioned.select(
        "*", *[F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__f_{c}")
               for c in value_cols])
    out_left = [F.col("__l")[c].alias(c) for c in left.columns]
    return (filled.where(F.col("__side") == 1)
            .select(*out_left,
                    *[F.col(f"__f_{c}").alias(c) for c in value_cols]))
