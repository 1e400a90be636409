"""PNN — probabilistic neural network (Parzen windows, Gaussian kernel).

Reference: qt_cpp/classification.cpp:173-307 (brute-force and sequential
variants) and :311-428 (k-medoid clustered prototypes).

Semantics reproduced:
- features mean-centered with the training mean (normalize(), :103-105);
- class score = sum_t exp(-d_t / (2 * D * var)) / N_total with raw (unmean-
  ed) squared distances d_t, var = 2e-5, divided by 10 when D > 2000
  (:188-216);
- sequential variant: distances accumulate in 32-dim chunks
  (delta_features_count, :182), classes whose score drops below
  max_score / 1e9 are pruned (output_dividor, :185, 281-291), stop when one
  class remains;
- clustering variant: per-class k-medoids (100 iterations, 5 prototypes,
  :320-388) then PNN over the prototypes.

Numerical note: scores are computed in log space (logsumexp) — a monotone
transform, so the argmax and the max/1e9 pruning rule (a constant offset in
log space) are mathematically identical to the reference while staying
finite in float32 where exp(-d/(2 D var)) underflows.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

VAR = 2e-5  # classification.cpp:190
OUTPUT_DIVIDOR = 1e9  # :185
DELTA_FEATURES = 32  # :182
NEG_INF = -1e30


def _variance(num_features: int) -> float:
    return VAR / 10 if num_features > 2000 else VAR  # :192-193


@partial(jax.jit, static_argnames=("num_classes",))
def _pnn_log_scores(
    queries: jax.Array,  # [B, D]
    train: jax.Array,  # [N, D]
    labels: jax.Array,  # [N]
    mean: jax.Array,
    var_scale: jax.Array,  # scalar: 2 * D * var
    num_classes: int,
):
    q = queries - mean
    t = train - mean
    d = (
        jnp.sum(q * q, 1, keepdims=True)
        + jnp.sum(t * t, 1)[None, :]
        - 2.0 * q @ t.T
    )  # [B, N] raw squared sums
    log_k = -d / var_scale  # [B, N]
    # per-class logsumexp
    b = q.shape[0]
    cls = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)  # [N, C]
    mx = jnp.max(log_k, axis=1, keepdims=True)
    expd = jnp.exp(log_k - mx)  # [B, N]
    sums = expd @ cls  # [B, C]
    return jnp.where(sums > 0, jnp.log(sums), NEG_INF) + mx


class PNNClassifier:
    def __init__(self, num_classes: int, bruteforce: bool = True, name: str = "PNN"):
        self.name = name + ("" if bruteforce else " (seq)")
        self.num_classes = num_classes
        self.bruteforce = bruteforce

    def fit(self, x_train: np.ndarray, y_train: np.ndarray):
        self._x = jnp.asarray(x_train, jnp.float32)
        self._y = jnp.asarray(y_train, jnp.int32)
        self._mean = jnp.asarray(
            np.asarray(x_train, np.float64).mean(axis=0), jnp.float32
        )
        self._d = x_train.shape[1]
        return self

    def _predict_bf(self, queries: np.ndarray) -> np.ndarray:
        var_scale = 2.0 * self._d * _variance(self._d)
        scores = _pnn_log_scores(
            jnp.asarray(queries, jnp.float32),
            self._x,
            self._y,
            self._mean,
            jnp.float32(var_scale),
            self.num_classes,
        )
        return np.asarray(jnp.argmax(scores, axis=1))

    def _predict_sequential(self, queries: np.ndarray) -> np.ndarray:
        """Chunked accumulation with class pruning (:228-295). Note the
        reference re-scales accumulated distances by the CURRENT prefix
        length each round (exp(-dist/(2*var*max_fi)), :266)."""
        q = jnp.asarray(queries, jnp.float32) - self._mean
        t = self._x - self._mean
        b = q.shape[0]
        var = _variance(self._d)
        active = jnp.ones((b, self.num_classes), bool)
        done = jnp.zeros((b,), bool)
        best = jnp.zeros((b,), jnp.int32)
        dist = jnp.zeros((b, self._x.shape[0]), jnp.float32)
        cls = jax.nn.one_hot(self._y, self.num_classes, dtype=jnp.float32)

        for start in range(0, self._d, DELTA_FEATURES):
            end = min(start + DELTA_FEATURES, self._d)
            qc = q[:, start:end]
            tc = t[:, start:end]
            d_chunk = (
                jnp.sum(qc * qc, 1, keepdims=True)
                + jnp.sum(tc * tc, 1)[None, :]
                - 2.0 * qc @ tc.T
            )
            dist = dist + jnp.where(done[:, None], 0.0, d_chunk)
            log_k = -dist / (2.0 * var * end)
            mx = jnp.max(log_k, axis=1, keepdims=True)
            sums = jnp.exp(log_k - mx) @ cls
            log_scores = jnp.where(sums > 0, jnp.log(sums), NEG_INF) + mx
            log_scores = jnp.where(active, log_scores, NEG_INF)
            round_best = jnp.argmax(log_scores, axis=1).astype(jnp.int32)
            best = jnp.where(done, best, round_best)
            max_score = jnp.max(log_scores, axis=1, keepdims=True)
            keep = log_scores >= max_score - np.log(OUTPUT_DIVIDOR)
            keep = keep & active
            num_variants = jnp.sum(keep, axis=1)
            round_done = num_variants == 1
            active = jnp.where(done[:, None], active, keep)
            done = done | round_done
        return np.asarray(best)

    def predict(self, queries: np.ndarray) -> np.ndarray:
        if self.bruteforce:
            return self._predict_bf(queries)
        return self._predict_sequential(queries)


def k_medoids_per_class(
    x: np.ndarray,
    y: np.ndarray,
    num_classes: int,
    num_clusters: int = 5,
    iterations: int = 100,
) -> np.ndarray:
    """Per-class k-medoids on raw features (classification.cpp:320-388).
    Returns the selected prototype row indices into x."""
    selected = []
    for c in range(num_classes):
        members = np.flatnonzero(y == c)
        n = members.size
        if n <= num_clusters:
            selected.extend(members.tolist())
            continue
        rows = np.asarray(x[members], np.float64)
        # full pairwise distance matrix, mean over features (:341-343)
        sq = (rows**2).sum(1)
        dmat = (sq[:, None] + sq[None, :] - 2.0 * rows @ rows.T) / rows.shape[1]
        medoids = np.arange(num_clusters)
        for _ in range(iterations):
            assign = np.argmin(dmat[:, medoids], axis=1)
            new_medoids = medoids.copy()
            for ci in range(num_clusters):
                mask = assign == ci
                if not mask.any():
                    continue
                within = dmat[np.ix_(mask, mask)].sum(axis=1)
                new_medoids[ci] = np.flatnonzero(mask)[np.argmin(within)]
            if (new_medoids == medoids).all():
                break
            medoids = new_medoids
        selected.extend(members[medoids].tolist())
    return np.asarray(selected, dtype=np.int64)


class PNNWithClusteringClassifier(PNNClassifier):
    """'PNN with clustering, <k>' (classification.cpp:311-428)."""

    def __init__(self, num_classes: int, num_clusters: int = 5):
        super().__init__(num_classes, bruteforce=True, name=f"PNN with clustering, {num_clusters}")
        self.num_clusters = num_clusters

    def fit(self, x_train: np.ndarray, y_train: np.ndarray):
        proto = k_medoids_per_class(
            x_train, y_train, self.num_classes, self.num_clusters
        )
        # normalization mean still comes from the FULL training set (:404-411
        # normalize() uses avgValues computed over all training rows)
        full_mean = np.asarray(x_train, np.float64).mean(axis=0)
        self._x = jnp.asarray(x_train[proto], jnp.float32)
        self._y = jnp.asarray(y_train[proto], jnp.int32)
        self._mean = jnp.asarray(full_mean, jnp.float32)
        self._d = x_train.shape[1]
        return self
