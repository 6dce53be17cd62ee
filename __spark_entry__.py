"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The query catalog lives in ``moonshot_spark.queries`` — one entry per
implemented operator from SURVEY.md §2.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: full dual-moving-average backtest pipeline (SURVEY.md
    §3.1 D18) on the sf0.001 events-derived daily panel."""
    from moonshot_spark.queries import QUERIES

    return QUERIES["backtest_dma"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from moonshot_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from moonshot_spark.queries import ORACLES

    return dict(ORACLES)
