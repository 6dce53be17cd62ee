"""Distributed model TRAINING via normal-equation aggregation.

The scalable pattern for linear-family models: the sufficient statistics
(X'X, X'y — k(k+3)/2 scalars for k features) are plain map-side-combinable
sums, so training is ONE aggregate over any amount of data followed by a
k×k solve on the driver.  No gradient loops over the dataset, no
per-executor model state; at 100 TB the aggregate is the same shuffle-free
reduction as a count.  (Reference parity: moonshot's MoonshotML delegates
training to scikit-learn on a driver-sized frame — ml.py:227-330; this is
the engine-side equivalent that does not need the data to fit anywhere.)

``fit_logistic_irls`` iterates the same trick: each IRLS step re-weights
the normal equations with the current β (broadcast as plan literals), so
an L-iteration fit costs L aggregates — still zero Python in the data
path (all sums are JVM-side column arithmetic).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from moonshot_spark.ml_models import LinearModel, LogisticModel

__all__ = ["fit_ols", "fit_logistic_irls"]


def _design_cols(feature_cols: list[str]):
    return [F.lit(1.0)] + [F.col(c).cast("double") for c in feature_cols]


def _normal_equations(df: DataFrame, xs, y_expr, w_expr=None):
    """One aggregate producing X'WX (upper triangle) and X'Wy."""
    k = len(xs)
    w = w_expr if w_expr is not None else F.lit(1.0)
    aggs = []
    for i in range(k):
        for j in range(i, k):
            aggs.append(F.sum(w * xs[i] * xs[j]).alias(f"xx_{i}_{j}"))
    for i in range(k):
        aggs.append(F.sum(w * xs[i] * y_expr).alias(f"xy_{i}"))
    row = df.agg(*aggs).collect()[0]
    xtx = np.zeros((k, k))
    for i in range(k):
        for j in range(i, k):
            xtx[i, j] = xtx[j, i] = row[f"xx_{i}_{j}"] or 0.0
    xty = np.array([row[f"xy_{i}"] or 0.0 for i in range(k)])
    return xtx, xty


def _complete_rows(df: DataFrame, cols: list[str]) -> DataFrame:
    """Rows where every listed column is non-null.  F.sum skips nulls
    PER-TERM, so a row with one null feature would otherwise drop out of
    the X'X/X'y terms touching that feature but stay in all the others —
    inconsistent normal equations and silently wrong coefficients."""
    cond = F.lit(True)
    for c in cols:
        cond = cond & F.col(c).isNotNull()
    return df.where(cond)


def fit_ols(df: DataFrame, feature_cols: list[str], label_col: str,
            l2: float = 0.0) -> LinearModel:
    """Exact least-squares fit (optional ridge ``l2``, intercept always
    included) from one pass: solve (X'X + λI)β = X'y.  Rows with a null
    label OR any null feature are excluded (complete-case, matching
    scikit-learn's requirement that inputs be finite)."""
    xs = _design_cols(feature_cols)
    xtx, xty = _normal_equations(
        _complete_rows(df, feature_cols + [label_col]),
        xs, F.col(label_col).cast("double"))
    if l2:
        reg = l2 * np.eye(len(xs))
        reg[0, 0] = 0.0  # never penalize the intercept
        xtx = xtx + reg
    beta = np.linalg.solve(xtx, xty)
    return LinearModel(weights=beta[1:], bias=float(beta[0]))


def fit_logistic_irls(df: DataFrame, feature_cols: list[str],
                      label_col: str, n_iter: int = 8,
                      l2: float = 1e-6) -> LogisticModel:
    """Logistic regression by iteratively reweighted least squares: each
    step broadcasts the current β into the plan as literals, aggregates
    the weighted normal equations (W = p(1−p), working response
    z = Xβ + (y−p)/W), and solves k×k on the driver.  ``n_iter``
    aggregates total — Newton converges in a handful."""
    xs = _design_cols(feature_cols)
    k = len(xs)
    clean = _complete_rows(df, feature_cols + [label_col])
    beta = np.zeros(k)
    y = F.col(label_col).cast("double")
    for _ in range(n_iter):
        eta = xs[0] * float(beta[0])
        for i in range(1, k):
            eta = eta + xs[i] * float(beta[i])
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))
        w = p * (F.lit(1.0) - p) + F.lit(1e-12)
        z = eta + (y - p) / w
        xtx, xtz = _normal_equations(clean, xs, z, w_expr=w)
        xtx = xtx + l2 * np.eye(k)
        beta = np.linalg.solve(xtx, xtz)
    return LogisticModel(weights=beta[1:], bias=float(beta[0]))
