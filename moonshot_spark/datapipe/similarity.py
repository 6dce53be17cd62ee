"""Similarity search over embedding columns (array<float>).

- ``brute_force_topk``: exact cosine top-k — the correctness baseline.
  Query set is broadcast (it's small by construction); the corpus scan is
  embarrassingly parallel; per-query top-k via window rank.  At 100 TB the
  corpus side never shuffles — only the tiny (query × k) result does.
- ``lsh_bucketed_topk``: the scale path — random-hyperplane LSH buckets
  shrink the candidate set from |corpus| to the query's bucket, turning the
  cross product into an equi-join on bucket signature.

Dot products run as left-to-right ``F.aggregate`` folds over doubles —
deterministic, portable, codegen'd.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def cosine_expr(a, b):
    """Cosine similarity of two array columns, left-to-right fold (exact,
    engine-portable order of operations)."""
    a = _as_double(a if not isinstance(a, str) else F.col(a))
    b = _as_double(b if not isinstance(b, str) else F.col(b))
    prods = F.zip_with(a, b, lambda x, y: x * y)
    dot = F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)
    norm_a = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0),
                                lambda acc, x: acc + x))
    norm_b = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0),
                                lambda acc, x: acc + x))
    return dot / (norm_a * norm_b)


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     query_id_col: str = "query_id") -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries``: (query_id, embedding).  Returns (query_id, vec_id, cosine,
    rank) with rank 1..k, ties broken by vec_id for determinism.
    """
    q = queries.select(F.col(query_id_col), F.col(vec_col).alias("__qvec"))
    joined = corpus.crossJoin(F.broadcast(q))
    sim = cosine_expr(F.col(vec_col), F.col("__qvec"))
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (joined.select(query_id_col, id_col, sim.alias("cosine"))
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(query_id_col, id_col, "cosine", F.col("rank").cast("int")))


def hyperplane_signature_expr(vec_col, planes: list[list[float]]):
    """Random-hyperplane LSH signature: bit j = sign(vec · plane_j).

    ``planes`` is a driver-side list (generated once, seeded) — shipped as a
    literal array so the comparison is codegen'd, not a UDF closure.
    """
    v = _as_double(vec_col if not isinstance(vec_col, str) else F.col(vec_col))
    bits = []
    for plane in planes:
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        dot = F.aggregate(F.zip_with(v, lit_plane, lambda x, y: x * y),
                          F.lit(0.0), lambda acc, x: acc + x)
        bits.append(F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def lsh_bucketed_topk(corpus: DataFrame, queries: DataFrame, planes: list[list[float]],
                      k: int = 5, id_col: str = "vec_id", vec_col: str = "embedding",
                      query_id_col: str = "query_id") -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket.

    Equi-join on bucket signature replaces the cross product; recall is
    tunable via number of planes (fewer planes → bigger buckets).
    """
    sig = hyperplane_signature_expr(vec_col, planes)
    c = corpus.withColumn("__bucket", sig)
    q = (queries.select(F.col(query_id_col), F.col(vec_col).alias("__qvec"))
         .withColumn("__bucket", hyperplane_signature_expr(F.col("__qvec"), planes)))
    joined = c.join(F.broadcast(q), "__bucket")
    sim = cosine_expr(F.col(vec_col), F.col("__qvec"))
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (joined.select(query_id_col, id_col, sim.alias("cosine"))
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(query_id_col, id_col, "cosine", F.col("rank").cast("int")))
