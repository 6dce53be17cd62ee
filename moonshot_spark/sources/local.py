"""Driver-local dimension frames (balances, FX rates, allocations...).

``spark.createDataFrame(list)`` parallelizes into ``defaultParallelism``
pickled slices; every consumer stage — including each broadcast-exchange
materialization — then pays one Python-worker round-trip per slice (32
near-empty tasks on the bench box, ~0.5 s of pure overhead per trade
run).  Routing the same rows through pandas + Arrow ships JVM-native
batches instead: no Python workers in any downstream stage, one task.
Semantically identical; used for every dim the engine fabricates on the
driver (the reference receives these as in-memory service responses,
base.py:28-31).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def local_df(spark: SparkSession, rows: list, schema: str) -> DataFrame:
    """Arrow-backed local frame from a list of tuples + DDL schema."""
    import pandas as pd

    from pyspark.sql.types import _parse_datatype_string

    st = _parse_datatype_string(schema)
    pdf = pd.DataFrame(rows, columns=[f.name for f in st.fields])
    return spark.createDataFrame(pdf, st)
