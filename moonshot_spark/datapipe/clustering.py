"""Distributed Lloyd's k-means over embedding columns.

The iterative-algorithm pattern on Spark: each Lloyd iteration is ONE
aggregate over the data — centroids ride into the plan as broadcast
literals (k x dim numbers, driver-bounded), the assignment is a
JVM-side argmin over k exact integer distances, and the update is a
map-side-combinable (cluster, dim) sum.  No per-row Python, no
cached RDD lineage growth: at 100 TB each iteration costs one scan +
one small shuffle, the same shape as fit_ols's normal equations
(operators/ols.py).

Exactness discipline (what makes a DuckDB SQL oracle possible): vectors
are quantized to integer micro-units (round(x * 1e6), away-from-zero in
both engines), so distances and centroid sums are exact BIGINTs with no
float accumulation anywhere; the centroid update is an exact
floor-division (a - pmod(a, b)) / b, identical in both engines even for
negative sums.  Assignment ties break to the lowest centroid index.
Empty clusters keep their previous centroid (standard Lloyd behavior).

Reference parity note: the reference delegates clustering-ish work to
scikit-learn on driver-sized frames (moonshot/strategies/ml.py:227-330
trains models in-process); this is the engine-side equivalent for data
that fits nowhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["quantize_micro", "kmeans_fit_predict"]

MICRO = 1_000_000


def quantize_micro(vec_col: Column | str) -> Column:
    """array<float/double> -> array<bigint> of micro-units.  round() is
    half-away-from-zero on the same double product in both Spark and
    DuckDB, so the quantization is engine-stable bit-for-bit."""
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return F.transform(
        c, lambda x: F.round(x.cast("double") * MICRO).cast("bigint"))


def _dist2(qcol: Column, centroid: list[int]) -> Column:
    """Exact squared L2 distance (BIGINT) to a literal centroid."""
    carr = F.array(*[F.lit(int(v)).cast("bigint") for v in centroid])
    return F.aggregate(
        F.zip_with(qcol, carr, lambda x, c: (x - c) * (x - c)),
        F.lit(0).cast("bigint"), lambda acc, d: acc + d)


def _dist_array(qcol: Column, centroids: list[list[int]]) -> Column:
    """array of the k exact distances (each computed once — a when-chain
    argmin would duplicate every distance expr k times and bloat the
    task binary at O(k^2 * dim))."""
    return F.array(*[_dist2(qcol, c) for c in centroids])


def _assign_expr(qcol: Column, centroids: list[list[int]]) -> Column:
    """argmin over k exact distances, ties to the lowest index
    (array_position returns the FIRST occurrence of the min)."""
    darr = _dist_array(qcol, centroids)
    return (F.array_position(darr, F.array_min(darr)) - 1).cast("int")


def _update_centroids(assigned: DataFrame, centroids: list[list[int]]
                      ) -> list[list[int]]:
    """One exact centroid update: per-(cluster, dim) BIGINT sums, then
    floor-division.  The posexplode shuffles (k x dim) partial sums —
    map-side combine reduces each task's contribution to at most
    k x dim rows before the exchange."""
    dim = len(centroids[0])
    sums = (assigned
            .select("__cluster", F.posexplode("__q").alias("__d", "__v"))
            .groupBy("__cluster", "__d")
            .agg(F.sum("__v").alias("s"), F.count("*").alias("n"))
            .collect())
    new = [list(c) for c in centroids]   # empty clusters keep previous
    by_cluster: dict[int, list[tuple[int, int, int]]] = {}
    for r in sums:
        by_cluster.setdefault(r["__cluster"], []).append(
            (r["__d"], r["s"], r["n"]))
    for j, entries in by_cluster.items():
        for d, s, n in entries:
            # exact floor division toward -inf (matches the oracle's
            # (a - ((a % b + b) % b)) / b for negative sums too)
            new[j][d] = (s - (s % n + n) % n) // n
        assert len(entries) == dim
    return new


def kmeans_fit_predict(df: DataFrame, k: int = 8, n_iter: int = 2,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding",
                       return_centroids: bool = False):
    """Lloyd's k-means: deterministic init (the vectors of the k
    smallest ids), ``n_iter`` assign+update cycles, then a final
    assignment.  Returns one row per input row:
    (id_col, cluster int, dist2 bigint) against the FINAL centroids —
    or ``(assignments, centroids)`` when ``return_centroids`` (the
    centroids are k lists of micro-unit ints).

    Driver state is k x dim integers per iteration (the collected
    centroid sums) — independent of data size.  NOTE: the iteration
    jobs run EAGERLY at call time (each update is a collect of k x dim
    sums); the returned DataFrame is only the final-assignment plan
    with the converged centroids baked in as literals."""
    dim_probe = (df.where(F.col(vec_col).isNotNull())
                 .select(F.max(F.size(vec_col)).alias("d")).collect())
    if not dim_probe or dim_probe[0]["d"] is None:
        raise ValueError("kmeans_fit_predict: empty input (or all-NULL "
                         f"{vec_col})")
    dim = int(dim_probe[0]["d"])
    # input contract enforced INSIDE the job (no extra validation scan):
    # a NULL or ragged vector would otherwise crash the init collect with
    # an opaque TypeError or silently emit cluster=NULL rows
    guard = F.when(
        F.col(vec_col).isNull() | (F.size(vec_col) != dim),
        F.raise_error(F.concat(
            F.lit("kmeans_fit_predict: NULL or ragged embedding for "
                  f"{id_col}="), F.col(id_col).cast("string"),
            F.lit(f" (expected dim {dim})")))
    ).otherwise(quantize_micro(vec_col))
    q = df.select(F.col(id_col), guard.alias("__q"))
    # localCheckpoint (eager): every iteration AND the returned final-
    # assignment plan re-read this frame; checkpointed blocks serve all
    # of them and are freed when the DataFrame is garbage-collected —
    # unlike cache()+unpersist(), which would leave the RETURNED plan
    # recomputing the quantization from source on every action.
    q = q.localCheckpoint(eager=True)
    init_rows = q.orderBy(id_col).limit(k).collect()
    if len(init_rows) < k:
        raise ValueError(f"k={k} exceeds input rows ({len(init_rows)})")
    cents = [list(r["__q"]) for r in init_rows]
    for _ in range(n_iter):
        assigned = q.withColumn("__cluster", _assign_expr(F.col("__q"),
                                                          cents))
        cents = _update_centroids(assigned, cents)
    darr = _dist_array(F.col("__q"), cents)
    out = q.select(
        F.col(id_col),
        (F.array_position(darr, F.array_min(darr)) - 1).cast("int")
        .alias("cluster"),
        F.array_min(darr).alias("dist2"))
    return (out, cents) if return_centroids else out
