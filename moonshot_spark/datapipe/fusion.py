"""Rank fusion for hybrid retrieval (Cormack, Clarke & Buettcher,
"Reciprocal Rank Fusion outperforms Condorcet and individual Rank
Learning Methods", SIGIR 2009): combine per-query ranked lists from
heterogeneous retrievers (dense cosine, L2, lexical BM25, ...) into one
list by summing reciprocal-rank contributions 1/(k + rank).

Cross-engine exactness: contributions are INTEGER-quantized —
``floor(1e15 / (k + rank))`` as BIGINT — so the per-candidate sum is
order-free exact integer addition (the same discipline as every
corpus-scale sum in this repo; a raw double sum over retrievers would be
association-order-dependent the moment a candidate appears in 3+ lists).
At 1e15 quantization the rounding perturbs a contribution by at most
1e-15 relative — indistinguishable for fusion while buying bit-stable
cross-engine replay.

Scale shape: one union of the (already tiny) per-retriever top-k lists,
one groupBy on (query, candidate) with map-side combine, and the final
per-query top-k through the two-phase ``grouped_topk`` reducer — nothing
corpus-sized anywhere (the retrievers themselves own the corpus scans).

Beyond-reference operator (the quantrocket reference has no retrieval
surface); standard component of RAG / training-data retrieval stacks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from moonshot_spark.operators.ranking import grouped_topk

__all__ = ["reciprocal_rank_fusion"]


def reciprocal_rank_fusion(ranked: list[DataFrame],
                           query_id_col: str = "query_id",
                           id_col: str = "vec_id",
                           rank_col: str = "rank",
                           k_const: float = 60.0,
                           top_k: int | None = None) -> DataFrame:
    """Fuse per-query ranked lists into
    (query_id, vec_id, rrf_score BIGINT, n_lists, rank).

    Each input frame carries (query_id, id, rank) with rank 1-based;
    a candidate's score is Σ over the lists containing it of
    ``floor(1e15 / (k_const + rank))``.  ``top_k`` keeps the best k per
    query (ties broken by id ascending); None returns all fused
    candidates ranked.
    """
    contrib = F.floor(
        F.lit(1000000000000000.0)
        / (F.lit(float(k_const)) + F.col(rank_col).cast("double"))
    ).cast("bigint")
    u = None
    for df in ranked:
        part = df.select(F.col(query_id_col), F.col(id_col),
                         contrib.alias("__c"))
        u = part if u is None else u.unionByName(part)
    if u is None:
        raise ValueError("reciprocal_rank_fusion needs >= 1 ranked list")
    fused = (u.groupBy(query_id_col, id_col)
             .agg(F.sum("__c").alias("rrf_score"),
                  F.count("*").alias("n_lists")))
    n_cands = 1 << 30  # "all": grouped_topk needs a finite k
    return (grouped_topk(fused, [query_id_col],
                         [F.desc("rrf_score"), F.asc(id_col)],
                         top_k if top_k is not None else n_cands)
            .select(query_id_col, id_col, "rrf_score", "n_lists",
                    F.col("rank").cast("int").alias("rank")))
