"""k-asset Markowitz (operators/markowitz.py): generated Gaussian-
elimination step chain vs numpy, grouped sleeves, singular guard."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from moonshot_spark.operators.markowitz import (
    gauss_solve_steps, markowitz_weights)


def _eval_steps(steps, env):
    """Replay the generated SQL step text in pure Python (two-operand
    ops only) to check the generator's algebra independently of Spark."""
    import re
    for name, txt in steps:
        expr = re.sub(r"\bCAST\((\w+) AS DOUBLE\)", r"float(\1)", txt)
        env[name] = eval(expr, {"float": float}, dict(env))
    return env


def test_gauss_solve_steps_matches_numpy():
    rng = np.random.default_rng(3)
    for k in (1, 2, 3, 5, 7):
        M = rng.normal(size=(k, k))
        A = M @ M.T + k * np.eye(k)          # SPD
        b = rng.normal(size=k)
        names_a = {(i, j): f"a{min(i,j)}{max(i,j)}"
                   for i in range(k) for j in range(k)}
        names_b = [f"b{i}" for i in range(k)]
        env = {f"a{i}{j}": A[i, j] for i in range(k) for j in range(i, k)}
        env.update({f"b{i}": b[i] for i in range(k)})
        steps, w_names, pivots = gauss_solve_steps(k, names_a, names_b)
        env = _eval_steps(steps, env)
        got = np.array([env[w] for w in w_names])
        assert np.allclose(got, np.linalg.solve(A, b), rtol=1e-10)
        assert all(abs(env[p] if isinstance(p, str) and p in env
                       else env.get(p, A[0, 0])) > 0 for p in pivots)


def _numpy_weights(R):
    """Reference: quantized sufficient stats -> covariance -> solve."""
    n = len(R)
    q = np.floor(R * 1e9).astype(np.int64).sum(axis=0) / 1e9
    mu = q / n
    k = R.shape[1]
    C = np.zeros((k, k))
    for i in range(k):
        for j in range(i, k):
            s = np.floor(R[:, i] * R[:, j] * 1e9).astype(np.int64).sum() / 1e9
            C[i, j] = C[j, i] = (s - q[i] * q[j] / n) / (n - 1.0)
    w = np.linalg.solve(C, mu)
    return mu, w / w.sum(), w


def test_markowitz_weights_k4_matches_numpy(spark):
    rng = np.random.default_rng(7)
    R = rng.normal(0.001, 0.02, size=(60, 4))
    piv = spark.createDataFrame(
        [tuple(map(float, row)) for row in R],
        "r1 double, r2 double, r3 double, r4 double")
    out = {r["sid"]: r for r in markowitz_weights(piv, 4).collect()}
    mu, wn, w = _numpy_weights(R)
    assert set(out) == {"1", "2", "3", "4"}
    for i in range(4):
        r = out[str(i + 1)]
        assert r["n_obs"] == 60
        assert r["mean_ret"] == pytest.approx(mu[i], rel=1e-9)
        assert r["raw_weight"] == pytest.approx(w[i], rel=1e-7)
        assert r["weight"] == pytest.approx(wn[i], rel=1e-7)


def test_markowitz_weights_grouped_sleeves(spark):
    """group_cols: one aggregate fits every sleeve — per-group weights
    match per-group numpy solves."""
    rng = np.random.default_rng(11)
    rows, expect = [], {}
    for g in ("book_a", "book_b"):
        R = rng.normal(0.0, 0.03, size=(50, 3))
        rows += [(g, *map(float, row)) for row in R]
        expect[g] = _numpy_weights(R)[1]
    piv = spark.createDataFrame(
        rows, "book string, r1 double, r2 double, r3 double")
    out = markowitz_weights(piv, 3, group_cols=["book"]).collect()
    assert len(out) == 6
    for r in out:
        assert r["weight"] == pytest.approx(
            expect[r["book"]][int(r["sid"]) - 1], rel=1e-7)


def test_markowitz_singular_sleeve_dropped(spark):
    """An exactly-degenerate sleeve (zero-variance asset -> zero pivot)
    is dropped by the guard, not emitted as inf/nan weights.  (Merely
    COLLINEAR sleeves become epsilon-nonsingular after the 1e-9
    quantization — same boundary as the 3-asset det guard — so the
    guard targets exact degeneracy; see markowitz.py docstring.)"""
    rng = np.random.default_rng(5)
    rows = [(0.0, float(a)) for a in rng.normal(0, 0.01, 40)]
    piv = spark.createDataFrame(rows, "r1 double, r2 double")
    assert markowitz_weights(piv, 2).count() == 0
    # and a 1-row frame (nd-1 = 0) is dropped by the nd guard
    one = spark.createDataFrame([(0.01, 0.02)], "r1 double, r2 double")
    assert markowitz_weights(one, 2).count() == 0
