"""Driver-local dimension frames (balances, FX rates, allocations...).

``spark.createDataFrame(list)`` parallelizes into ``defaultParallelism``
pickled slices; every consumer stage — including each broadcast-exchange
materialization — then pays one Python-worker round-trip per slice (32
near-empty tasks on the bench box, ~0.5 s of pure overhead per trade
run).  Routing the same rows through Arrow ships JVM-native batches
instead: no Python workers in any downstream stage, one task.
Semantically identical; used for every dim the engine fabricates on the
driver (the reference receives these as in-memory service responses,
base.py:28-31).

The Arrow table is built with EXPLICIT per-column types from the target
schema — never via a bare ``pd.DataFrame`` — because pandas coerces a
nullable integer column containing ``None`` to float64, silently losing
precision for int64 values above 2^53 before the cast back to long
(ADVICE r10).  ``pa.array(col, type=...)`` keeps integers integral (and
raises on non-integral values instead of rounding).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def local_df(spark: SparkSession, rows: list,
             schema: str | StructType) -> DataFrame:
    """Arrow-backed local frame from a list of tuples/Rows + DDL schema
    (or a StructType)."""
    import pyarrow as pa

    from pyspark.sql.pandas.types import to_arrow_schema
    from pyspark.sql.types import _parse_datatype_string

    st = (schema if isinstance(schema, StructType)
          else _parse_datatype_string(schema))
    arrow_schema = to_arrow_schema(st)
    cols = [pa.array([r[i] for r in rows], type=f.type)
            for i, f in enumerate(arrow_schema)]
    tbl = pa.Table.from_arrays(cols, schema=arrow_schema)
    return spark.createDataFrame(tbl, st)
