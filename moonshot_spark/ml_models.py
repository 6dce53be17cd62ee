"""Minimal deterministic model implementations for ML scoring.

Used by tests and the oracle-checked ML query: a linear model whose
predictions are element-wise numpy expressions (stable operation order →
bit-reproducible across executors/engines).  Real deployments broadcast
sklearn/keras models the same way (reference ml.py:211-225,491).
"""

from __future__ import annotations

import numpy as np


class LinearModel:
    """sklearn-like: pred = X @ w + b, computed column-wise."""

    def __init__(self, weights, bias: float = 0.0):
        self.weights = list(weights)
        self.bias = float(bias)

    def predict(self, X):
        out = np.full(X.shape[0], self.bias, dtype="float64")
        for j, w in enumerate(self.weights):
            out = out + X[:, j] * w
        return out


class LogisticModel(LinearModel):
    """Adds predict_proba: P(1) = sigmoid(X @ w + b)."""

    def predict_proba(self, X):
        p = 1.0 / (1.0 + np.exp(-super().predict(X)))
        return np.column_stack([1.0 - p, p])
