"""Distributed power-iteration PCA (datapipe/pca.py): math sanity vs
numpy's exact eigendecomposition, determinism, and scale-shape checks.
The bit-exact oracle parity is covered by the embedding_pca_power
catalog entry; these tests pin the MATH (does it find the top
component?) which the oracle replay alone can't distinguish from a
consistently-wrong trajectory."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from moonshot_spark.datapipe.pca import power_iteration_top_component


def _make_emb(spark, n=400, dim=8, seed=7, spike=6.0):
    """Anisotropic cloud: a dominant direction with variance ``spike``
    plus isotropic noise — a clean eigengap so power iteration
    converges fast."""
    rng = np.random.default_rng(seed)
    direction = rng.normal(size=dim)
    direction /= np.linalg.norm(direction)
    data = (rng.normal(size=(n, 1)) * math.sqrt(spike)) @ direction[None, :]
    data = data + rng.normal(size=(n, dim)) * 0.3
    rows = [(i, [float(x) for x in data[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return df, data, direction


def test_matches_numpy_top_eigenvector(spark):
    df, data, _ = _make_emb(spark)
    fit = power_iteration_top_component(df, dim=8, iters=8)

    centered = data - data.mean(axis=0)
    cov = centered.T @ centered / len(data)
    evals, evecs = np.linalg.eigh(cov)
    top_vec, top_val = evecs[:, -1], evals[-1]

    cos = abs(float(np.dot(fit.component, top_vec)))
    assert cos > 0.999, f"|cos(power, eigh)| = {cos}"
    # Rayleigh quotient converges to the top eigenvalue from below
    assert fit.eigval == pytest.approx(top_val, rel=0.01)
    assert fit.trace == pytest.approx(evals.sum(), rel=0.01)
    assert 0.0 < fit.explained_variance_ratio < 1.0
    # unit norm
    assert sum(c * c for c in fit.component) == pytest.approx(1.0, abs=1e-9)


def test_deterministic_across_runs(spark):
    """Identical trajectory on re-run — the quantized integer sums make
    partial-aggregation order irrelevant."""
    df, _, _ = _make_emb(spark, n=150)
    a = power_iteration_top_component(df, dim=8, iters=3)
    b = power_iteration_top_component(
        df.repartition(13), dim=8, iters=3)
    assert a.component == b.component          # bit-identical doubles
    assert a.eigval == b.eigval and a.trace == b.trace


def test_empty_and_degenerate_inputs(spark):
    df, _, _ = _make_emb(spark, n=10)
    with pytest.raises(ValueError, match="empty"):
        power_iteration_top_component(df.limit(0), dim=8)
    # all-constant rows: zero covariance -> zero C*v -> explicit error
    const = spark.createDataFrame(
        [(i, [1.0] * 8) for i in range(5)],
        "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="zero C\\*v"):
        power_iteration_top_component(const, dim=8)


def test_no_percorpus_collect_and_narrow_scan(spark):
    """Scale shape: the per-iteration work is aggregates only — the
    corpus never funnels to the driver, and the persisted frame is the
    narrow projected columns (no text/id baggage)."""
    df, _, _ = _make_emb(spark, n=100)
    wide = df.withColumn("payload", F.lit("x" * 100))
    fit = power_iteration_top_component(wide, dim=8, iters=2)
    assert len(fit.component) == 8
    assert fit.n_rows == 100


def test_project_component_scores(spark):
    """Projection scores: bit-deterministic under repartition, unit-
    variance-consistent with the eigenvalue (sd of pc1 ~ sqrt(eigval)),
    and centered near zero."""
    import numpy as np

    from moonshot_spark.datapipe.pca import (power_iteration_top_component,
                                             project_component)

    df, data, _ = _make_emb(spark, n=300)
    emb = df.withColumnRenamed("vec_id", "vec_id")
    fit = power_iteration_top_component(emb, dim=8, iters=6)
    scores = {r["vec_id"]: r["pc1"]
              for r in project_component(emb, fit).collect()}
    again = {r["vec_id"]: r["pc1"]
             for r in project_component(emb.repartition(9), fit).collect()}
    assert scores == again                        # bit-identical
    vals = np.array([scores[i] for i in range(300)])
    assert abs(float(vals.mean())) < 0.2
    assert float(vals.std()) == pytest.approx(
        fit.eigval ** 0.5, rel=0.05)


def test_sql_literal_helpers(spark):
    """ADVICE r14: SQL-string assembly must survive non-finite doubles
    (repr would emit unparseable 'nanD'/'infD') and identifiers that
    need quoting (dots/spaces/backticks) — both parse and evaluate to
    the same values the Column API produced."""
    import math

    from pyspark.sql import functions as F

    from moonshot_spark.datapipe.pca import sql_double, sql_ident

    row = spark.range(1).select(
        F.expr(sql_double(float("nan"))).alias("nan_v"),
        F.expr(sql_double(float("inf"))).alias("pinf"),
        F.expr(sql_double(float("-inf"))).alias("ninf"),
        F.expr(sql_double(0.1)).alias("tenth"),
        F.expr(sql_double(-2.5e-17)).alias("tiny"),
    ).collect()[0]
    assert math.isnan(row["nan_v"])
    assert row["pinf"] == float("inf") and row["ninf"] == float("-inf")
    assert row["tenth"] == 0.1 and row["tiny"] == -2.5e-17

    # identifier quoting: a column name with a dot parses once quoted
    df = spark.range(3).select(F.array(F.col("id").cast("double"))
                               .alias("weird.name"))
    got = df.select(F.expr(f"{sql_ident('weird.name')}[0]")
                    .alias("v")).collect()
    assert [r["v"] for r in got] == [0.0, 1.0, 2.0]


def test_pq_encode_quoted_vec_col(spark):
    """pq_encode works with a vec_col needing backtick quoting
    (ADVICE r14: raw interpolation broke names the Column API accepted)."""
    from moonshot_spark.datapipe.similarity import pq_encode

    df = spark.createDataFrame(
        [(1, [0.0, 1.0, 2.0, 3.0])], ["vec_id", "emb.v"])
    out = pq_encode(df, codebooks=[[[0.0, 1.0], [9.0, 9.0]],
                                   [[2.0, 3.0], [9.0, 9.0]]],
                    n_sub=2, sub_dim=2, vec_col="emb.v").collect()
    assert sorted((r["subspace"], r["code"], r["ssd"]) for r in out) == \
        [(0, 0, 0.0), (1, 0, 0.0)]
