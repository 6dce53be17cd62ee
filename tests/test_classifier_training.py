"""Unit tests for the distributed gradient-descent classifier trainer
(datapipe/classifier.py): learning direction, determinism, accuracy
accounting, and the persisted-frame contract."""

import pytest
from pyspark.sql import functions as F

from moonshot_spark.datapipe.classifier import (
    GDFit, fast_sigmoid, train_gd_classifier)


@pytest.fixture(scope="module")
def separable(spark):
    # one feature, perfectly separable at f = 0: y=1 rows have f=+1,
    # y=0 rows have f=-1
    rows = [(1.0, 1.0)] * 20 + [(0.0, -1.0)] * 20
    return spark.createDataFrame(rows, "y double, f double")


def test_learns_separating_direction(separable):
    fit = train_gd_classifier(separable, ["f"], "y", lr=0.5, iters=5)
    b0, b1 = fit.betas
    assert b1 > 0                      # positive weight on the feature
    assert fit.accuracy == 1.0         # z = b0 + b1*f separates at 5 iters
    assert fit.n_rows == 40 and fit.correct == 40
    assert isinstance(fit, GDFit) and len(fit.history) == 5


def test_gradient_descends_loss(separable):
    """Squared residual sum under the fast-sigmoid link must shrink
    across iterations on a separable problem."""
    fit = train_gd_classifier(separable, ["f"], "y", lr=0.5, iters=4)

    def sq_loss(betas):
        z = F.lit(betas[0]) + F.lit(betas[1]) * F.col("f")
        r = fast_sigmoid(z) - F.col("y")
        return separable.agg(F.sum(r * r)).collect()[0][0]

    losses = [sq_loss(b) for _, b in fit.history]
    assert all(a > b for a, b in zip(losses, losses[1:]))


def test_deterministic_across_runs(separable):
    """Integer-quantized gradients: two runs produce bit-identical
    coefficient trajectories regardless of partitioning."""
    f1 = train_gd_classifier(separable, ["f"], "y", iters=3)
    f2 = train_gd_classifier(separable.repartition(7), ["f"], "y", iters=3)
    assert f1.history == f2.history


def test_zero_iteration_state(separable):
    """First update moves from the all-zero model: z=0 -> sigma=0.5, so
    g0 quantizes (0.5 - y) and the intercept moves toward the class
    balance."""
    fit = train_gd_classifier(separable, ["f"], "y", lr=1.0, iters=1)
    b0, b1 = fit.history[0][1]
    # balanced classes: mean resid = 0 -> intercept stays ~0 (within
    # the 1e-9 quantization); feature gradient is -0.5 mean -> b1 = 0.5
    assert abs(b0) < 1e-8
    assert b1 == pytest.approx(0.5, abs=1e-8)


def test_empty_frame_raises(spark):
    empty = spark.createDataFrame([], "y double, f double")
    with pytest.raises(ValueError, match="empty feature frame"):
        train_gd_classifier(empty, ["f"], "y")


def test_fast_sigmoid_range_and_midpoint(spark):
    df = spark.range(1).select(
        fast_sigmoid(F.lit(0.0)).alias("mid"),
        fast_sigmoid(F.lit(1e9)).alias("hi"),
        fast_sigmoid(F.lit(-1e9)).alias("lo"))
    r = df.collect()[0]
    assert r["mid"] == 0.5
    assert 0.0 < r["lo"] < 0.5 < r["hi"] < 1.0
