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
              tolerance: int | None = None,
              direction: str = "backward",
              allow_exact_matches: bool = True) -> DataFrame:
    """As-of join with full pandas ``merge_asof`` semantics, one shuffle.

    - ``direction="backward"`` (default): most recent right row with
      right.on ≤ left.on per ``by`` key.
    - ``direction="forward"``: nearest right row with right.on ≥ left.on —
      same union+fill pass over a DESCENDING sort, so both directions stay
      a single sort-merge scan (no range join, no per-row subquery).
    - ``tolerance`` (same integer unit as ``on``): matches farther than
      the tolerance are nulled out, exactly like ``merge_asof``'s
      ``tolerance=Timedelta(...)`` — evaluated from the carried matched
      ``on`` value, no second join.
    - ``allow_exact_matches=False``: strict inequality (< / >).

    Ties on (on) between a left and right row resolve by
    ``allow_exact_matches`` via side ordering: exact matches order the
    right row first (visible) or after (invisible).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', "
                         f"got {direction!r}")
    by = [by] if isinstance(by, str) else list(by)
    value_cols = value_cols or [c for c in right.columns
                                if c not in set(by) | {on}]

    l_tagged = left.select(
        *by, F.col(on),
        F.lit(1).alias("__side"),
        F.lit(None).cast(right.schema[on].dataType).alias("__r___on"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
          for c in value_cols],
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"))
    r_tagged = right.select(
        *by, F.col(on),
        F.lit(0).alias("__side"),
        F.col(on).alias("__r___on"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
        F.lit(None).cast(
            l_tagged.schema["__l"].dataType).alias("__l"))

    unioned = l_tagged.unionByName(r_tagged)
    # exact matches visible → right (side 0) sorts before left (side 1) at
    # equal `on`; for strict inequality flip the side order
    side_order = F.col("__side").asc() if allow_exact_matches \
        else F.col("__side").desc()
    on_order = F.col(on).asc() if direction == "backward" \
        else F.col(on).desc()
    w = Window.partitionBy(*by).orderBy(on_order, side_order) \
        .rowsBetween(Window.unboundedPreceding, 0)
    fill_cols = ["__on"] + value_cols
    filled = unioned.select(
        "*", *[F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__f_{c}")
               for c in fill_cols])
    if tolerance is not None:
        gap = (F.col(on) - F.col("__f___on")) if direction == "backward" \
            else (F.col("__f___on") - F.col(on))
        within = F.col("__f___on").isNotNull() & (gap <= F.lit(tolerance))
        out_vals = [F.when(within, F.col(f"__f_{c}")).alias(c)
                    for c in value_cols]
    else:
        out_vals = [F.col(f"__f_{c}").alias(c) for c in value_cols]
    out_left = [F.col("__l")[c].alias(c) for c in left.columns]
    return (filled.where(F.col("__side") == 1)
            .select(*out_left, *out_vals))
