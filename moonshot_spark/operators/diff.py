"""Snapshot diff: key-level change detection between two versions of a
table (the data-ops primitive behind incremental publishing, CDC
backfills, and "what changed since the last corpus build" reports).

Scale shape: ONE full-outer join on the primary key — no window, no
collect; row equality is a single md5 over the canonicalized non-key
columns computed map-side on each side, so the join carries (key, hash)
plus whatever columns the caller wants to surface.  Skew follows the
key's own distribution (a real PK is unique, so none); AQE handles the
rest.  At 100 TB this is the standard two-scan diff — there is no
cheaper exact form without a persisted per-key hash index, which this
operator's output can itself seed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["snapshot_diff"]


def _row_hash(df: DataFrame, keys: list[str]):
    """md5 over per-column md5s (sorted column order).  Hashing each
    column FIRST makes the encoding injective: every part is either a
    32-hex-char digest or the 4-char NULL sentinel, neither of which
    contains the separator, so no value can collide across column
    boundaries (a raw concat with separators could — a value containing
    the separator, or equal to the sentinel, would alias another row)."""
    cols = [c for c in df.columns if c not in keys]
    parts = []
    for c in sorted(cols):
        parts.append(F.coalesce(F.md5(F.col(c).cast("string")),
                                F.lit("null")))
    return F.md5(F.concat_ws(",", *parts))


def snapshot_diff(old: DataFrame, new: DataFrame,
                  keys: list[str]) -> DataFrame:
    """One row per key present in either snapshot:
    ``(*keys, change string)`` where change is 'added' (key only in
    ``new``), 'removed' (only in ``old``), 'changed' (both, different
    non-key values), or 'unchanged'.  Both snapshots must share the
    same non-key column set (enforced — a silent schema drift would
    make every row look 'changed')."""
    old_cols = sorted(c for c in old.columns if c not in keys)
    new_cols = sorted(c for c in new.columns if c not in keys)
    if old_cols != new_cols:
        raise ValueError(
            "snapshot_diff: non-key columns differ between snapshots: "
            f"old={old_cols} new={new_cols}")
    o = old.select(*keys, _row_hash(old, keys).alias("__h_old"))
    n = new.select(*keys, _row_hash(new, keys).alias("__h_new"))
    joined = o.join(n, keys, "full_outer")
    change = (F.when(F.col("__h_old").isNull(), F.lit("added"))
              .when(F.col("__h_new").isNull(), F.lit("removed"))
              .when(F.col("__h_old") != F.col("__h_new"), F.lit("changed"))
              .otherwise(F.lit("unchanged")))
    return joined.select(*keys, change.alias("change"))
