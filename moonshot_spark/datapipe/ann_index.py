"""Persisted IVF index: the vector store as a cell-partitioned parquet
layout, so probing reads only nprobe/n_cells of the corpus FROM DISK.

The in-memory ``ivf_topk`` (similarity.py) prunes the candidate set
after scanning the whole corpus; at 100 TB the scan itself is the cost.
Writing the corpus partitioned by its IVF cell turns the probe's cell
filter into parquet PARTITION PRUNING — a query batch that probes
``nprobe`` of ``n_cells`` cells touches ``nprobe/n_cells`` of the bytes,
before any executor sees a row.  The same layout is the standard
vector-store design (FAISS IVF lists, Milvus segments) re-expressed as
parquet + Catalyst pruning.

Incremental ingest is free under this layout: a NEW embedding batch is
assigned against the SAME persisted centroids and appended to its cell
directories (``mode("append")``); results equal a full rebuild because
cell assignment is a pure function of (vector, centroids).

Reference: the quantrocket reference has no vector surface; this is the
beyond-reference LLM-datapipe layer (cf. Jégou et al., "Product
Quantization for Nearest Neighbor Search", TPAMI 2011 — the IVF coarse
quantizer half).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["write_ivf_index", "append_to_ivf_index", "probe_ivf_index"]

_CELL = "__cell"


def write_ivf_index(corpus: DataFrame, centroids: list[list[float]],
                    path: str, vec_col: str = "embedding") -> None:
    """Materialize the corpus partitioned by IVF cell id.

    One linear assignment pass (Arrow-batched matmul, similarity.py::
    ivf_assign_col) and one partitioned write; no shuffle beyond the
    write's own file layout.  Store the centroids next to the index in
    real deployments — assignment determinism is what makes appends
    equal rebuilds."""
    from moonshot_spark.datapipe.similarity import ivf_assign_col

    (corpus.withColumn(_CELL, ivf_assign_col(vec_col, centroids))
     .write.mode("overwrite").partitionBy(_CELL).parquet(path))


def append_to_ivf_index(new_vecs: DataFrame, centroids: list[list[float]],
                        path: str, vec_col: str = "embedding") -> None:
    """Incremental ingest: assign the batch against the SAME centroids
    and append to the cell directories.  The post-append index is
    row-identical to ``write_ivf_index`` over the unioned corpus (cell
    assignment is a pure function of the vector and the codebook)."""
    from moonshot_spark.datapipe.similarity import ivf_assign_col

    (new_vecs.withColumn(_CELL, ivf_assign_col(vec_col, centroids))
     .write.mode("append").partitionBy(_CELL).parquet(path))


def probe_ivf_index(spark: SparkSession, path: str, queries: DataFrame,
                    centroids: list[list[float]], nprobe: int = 4,
                    k: int = 5, id_col: str = "vec_id",
                    vec_col: str = "embedding",
                    query_id_col: str = "query_id") -> DataFrame:
    """Top-k cosine neighbors from the PERSISTED index — bit-identical
    to ``ivf_topk`` over the same corpus/centroids/nprobe (same
    assignment, same scoring, same two-phase reduction), but the scan is
    cut down by partition pruning BEFORE it starts:

    1. the query batch's probe cells are computed (queries × nprobe,
       driver-bounded: the query set is the small side by contract —
       collect() here is |queries|·nprobe ints, not corpus data);
    2. the index scan gets ``__cell IN (distinct probe cells)`` — a
       partition filter, so only those cell directories are read
       (``PartitionFilters`` in the plan, pinned by the test);
    3. the per-(query, cell) candidate join and grouped_topk run on the
       pruned candidates only.
    """
    from moonshot_spark.datapipe.similarity import _cosine_udf, ivf_probe_col
    from moonshot_spark.operators.ranking import grouped_topk

    q = (queries.select(F.col(query_id_col), F.col(vec_col).alias("__qvec"))
         .withColumn(_CELL, F.explode(
             ivf_probe_col("__qvec", centroids, nprobe))))
    probe_cells = sorted({r[_CELL] for r in q.select(_CELL)
                          .distinct().collect()})
    index = spark.read.parquet(path).where(F.col(_CELL).isin(probe_cells))
    joined = index.join(F.broadcast(q), _CELL)
    sim = _cosine_udf(F.col(vec_col), F.col("__qvec"))
    scored = joined.select(query_id_col, id_col, sim.alias("cosine"))
    return (grouped_topk(scored, [query_id_col],
                         [F.desc("cosine"), F.asc(id_col)], k)
            .select(query_id_col, id_col, "cosine",
                    F.col("rank").cast("int")))
