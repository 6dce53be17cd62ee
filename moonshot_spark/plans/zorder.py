"""Z-order (Morton) layout clustering for multi-column data skipping.

At 100 TB, which rows share a file decides how much a selective query
scans: parquet row-group min/max pruning only helps if the layout keeps
each file's value ranges narrow.  Sorting by one column gives perfect
pruning on that column and none on any other; interleaving the key bits
(z-ordering) before the sort gives good pruning on BOTH keys — the
standard lakehouse layout trick (Delta/Iceberg `OPTIMIZE ZORDER BY`),
implemented here engine-natively.

The z-value is a pure integer expression (unrolled shift/mask/or — no
UDF, whole-stage-codegen'd), so computing it over 100 TB is free
relative to the one total-order shuffle of the layout write (Spark's
range-partitioned sort).  ``z_value_sql`` emits the bit-identical SQL
form so layouts are verifiable against any SQL engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def z_value_expr(col_a: Column | str, col_b: Column | str,
                 bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative integer
    columns: a's bit i lands at position 2i+1, b's at 2i.  32 bits of z
    for the default 16 — fits a BIGINT with room to extend to 3 keys."""
    a = (F.col(col_a) if isinstance(col_a, str) else col_a).cast("bigint")
    b = (F.col(col_b) if isinstance(col_b, str) else col_b).cast("bigint")
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i))
    return z


def z_value_sql(col_a: str, col_b: str, bits: int = 16) -> str:
    """The identical computation as ANSI-ish SQL (DuckDB-compatible
    bitwise operators) — generated from the same unrolled loop so the
    two forms cannot drift."""
    parts = []
    for i in range(bits):
        parts.append(f"((({col_a} >> {i}) & 1) << {2 * i + 1})")
        parts.append(f"((({col_b} >> {i}) & 1) << {2 * i})")
    return " | ".join(parts)


def zorder_bucket_stats(df: DataFrame, col_a: str, col_b: str,
                        n_buckets: int = 16, bits: int = 16,
                        tiebreak: list[str] | None = None) -> DataFrame:
    """Lay rows out in z-order, cut into ``n_buckets`` equal files, and
    report each file's (min, max) range of both keys — the exact
    metadata a scan would prune on.  Narrow ranges on both columns =
    both predicates skip files.

    The ntile over a deterministic total order (z, then ``tiebreak``)
    is the layout write's range partitioner; in production this is
    ``df.repartitionByRange(n, z).sortWithinPartitions(z)`` +
    ``write.parquet`` — same shuffle, file-granularity output.
    """
    order = [F.col("__z")] + [F.col(c) for c in (tiebreak or [])]
    w = Window.orderBy(*order)
    return (df
            .withColumn("__z", z_value_expr(col_a, col_b, bits))
            .withColumn("__bucket", F.ntile(n_buckets).over(w))
            .groupBy(F.col("__bucket").alias("bucket"))
            .agg(F.min(col_a).alias(f"min_{col_a}"),
                 F.max(col_a).alias(f"max_{col_a}"),
                 F.min(col_b).alias(f"min_{col_b}"),
                 F.max(col_b).alias(f"max_{col_b}"),
                 F.count("*").alias("n_rows")))
