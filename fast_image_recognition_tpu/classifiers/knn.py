"""k-NN with first-to-K-votes decision.

Reference: qt_cpp/classification.cpp:108-170 — mean-centered L2 distances
over the training set (``normalize()`` subtracts the per-feature training
mean, :103-105), sorted ascending; walking the sorted list, the first class
to accumulate K votes wins (:151-160).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("k", "num_classes"))
def _knn_predict(
    queries: jax.Array,  # [B, D]
    train: jax.Array,  # [N, D]
    labels: jax.Array,  # [N]
    mean: jax.Array,  # [D]
    k: int,
    num_classes: int,
):
    q = queries - mean
    t = train - mean
    d = (
        jnp.sum(q * q, 1, keepdims=True)
        + jnp.sum(t * t, 1)[None, :]
        - 2.0 * q @ t.T
    ) / q.shape[1]
    order = jnp.argsort(d, axis=1)  # [B, N] ascending
    labels_sorted = jnp.take(labels, order)  # [B, N]
    onehot = jax.nn.one_hot(labels_sorted, num_classes, dtype=jnp.int32)
    counts = jnp.cumsum(onehot, axis=1)  # [B, N, C]
    reached = counts >= k  # first position where a class hits K votes
    pos = jnp.where(
        jnp.any(reached, axis=1),
        jnp.argmax(reached, axis=1),
        d.shape[1],
    )  # [B, C]
    return jnp.argmin(pos, axis=1)


class KNNClassifier:
    def __init__(self, k: int, num_classes: int):
        self.name = f"k-NN, {k}"
        self.k = k
        self.num_classes = num_classes

    def fit(self, x_train: np.ndarray, y_train: np.ndarray):
        self._x = jnp.asarray(x_train, jnp.float32)
        self._y = jnp.asarray(y_train, jnp.int32)
        self._mean = jnp.asarray(
            np.asarray(x_train, np.float64).mean(axis=0), jnp.float32
        )
        return self

    def predict(self, queries: np.ndarray) -> np.ndarray:
        return np.asarray(
            _knn_predict(
                jnp.asarray(queries, jnp.float32),
                self._x,
                self._y,
                self._mean,
                self.k,
                self.num_classes,
            )
        )
