"""FPNN — PNN with an orthogonal-series (truncated Fourier) kernel.

Reference: qt_cpp/classification.cpp:618-791; paper arXiv:1708.02733
(cited in qt_cpp/README.md:9).

Semantics reproduced:
- normalization: ``val = scale * (x - mean) / std`` (0 when std == 0),
  clipped to +-0.5 (:637-657);
- train (:661-696): per (feature, class) Fourier coefficients
  ``a0 = 0.5``, ``a_cos[j] += cos(pi (j+1) v) / n_c * (J-j)/(J(J+1))``,
  ``a_sin[j] += sin(pi (j+1) v) / n_c * (J-j)/(J(J+1))`` with
  ``J = ceil((n_train / C)^(1/3))`` floored at 3 (:669-675);
- predict (:698-735): per-feature density ``a0 + sum_j (a_cos cos + a_sin
  sin)``, class log-score = sum over features of ``fasterlog2(density)``
  (the bit-hack log2, :64-79);
- sequential variant (:736-791): accumulate in 32-dim chunks, prune classes
  below ``max_output + log2(output_ratio) * features_so_far``, stop when one
  class survives.

Vectorization: the cos/sin recurrence (:706-711) is angle addition, i.e.
``cos(pi (j+1) v)`` exactly — computed directly as a [*, D, J] table; the
per-class accumulation is one einsum on the MXU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from fast_image_recognition_tpu.ops.fastmath import fasterlog2

DELTA_FEATURES = 32  # shared with PNN (classification.cpp:182)
NEG_INF = -1e30
MAX_VAL = 0.5  # clip bound (:652-656)


def _normalize(x, mean, std, scale):
    v = jnp.where(std != 0, scale * (x - mean) / jnp.where(std != 0, std, 1.0), 0.0)
    return jnp.clip(v, -MAX_VAL, MAX_VAL)


@partial(jax.jit, static_argnames=("j_terms", "num_classes"))
def _fit_coeffs(
    v: jax.Array,  # [N, D] normalized training features
    labels: jax.Array,  # [N]
    j_terms: int,
    num_classes: int,
):
    n, d = v.shape
    j_idx = jnp.arange(1, j_terms + 1, dtype=jnp.float32)  # (j+1) in the C loop
    ang = jnp.pi * v[:, :, None] * j_idx[None, None, :]  # [N, D, J]
    cosk = jnp.cos(ang)
    sink = jnp.sin(ang)
    onehot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)  # [N, C]
    counts = jnp.maximum(jnp.sum(onehot, axis=0), 1.0)  # n_c
    w = (j_terms - jnp.arange(j_terms, dtype=jnp.float32)) / (
        j_terms * (j_terms + 1)
    )  # (J-j)/(J(J+1))
    per_class = onehot / counts[None, :]  # [N, C]
    a_cos = jnp.einsum("ndj,nc->dcj", cosk, per_class) * w  # [D, C, J]
    a_sin = jnp.einsum("ndj,nc->dcj", sink, per_class) * w
    return a_cos, a_sin


@partial(jax.jit, static_argnames=())
def _density_logs(v, a_cos, a_sin):
    """[B, Dslice] normalized values + [Dslice, C, J] coeffs ->
    per-class log2-density contribution summed over the slice: [B, C]."""
    j_terms = a_cos.shape[-1]
    j_idx = jnp.arange(1, j_terms + 1, dtype=jnp.float32)
    ang = jnp.pi * v[:, :, None] * j_idx[None, None, :]  # [B, Ds, J]
    probab = (
        0.5
        + jnp.einsum("bdj,dcj->bdc", jnp.cos(ang), a_cos)
        + jnp.einsum("bdj,dcj->bdc", jnp.sin(ang), a_sin)
    )  # [B, Ds, C]
    return jnp.sum(fasterlog2(probab), axis=1)  # [B, C]


class FPNNClassifier:
    """'FPNN, <scale>' / '(seq)' naming mirrors classification.cpp:620-621."""

    def __init__(
        self,
        num_classes: int,
        features_scale: float = 1.0,
        bruteforce: bool = True,
        output_ratio: float = 0.9,
    ):
        suffix = "" if bruteforce else " (seq)"
        self.name = f"FPNN, {features_scale}{suffix}"
        self.num_classes = num_classes
        self.features_scale = features_scale
        self.bruteforce = bruteforce
        self.output_ratio = output_ratio
        # output_delta = fastlog(output_ratio) (:621) — fasterlog2 base
        self.output_delta = float(
            np.asarray(fasterlog2(jnp.asarray([output_ratio], jnp.float32)))[0]
        )

    def fit(self, x_train: np.ndarray, y_train: np.ndarray):
        x64 = np.asarray(x_train, np.float64)
        n, d = x64.shape
        mean = x64.mean(axis=0)
        if n > 1:
            s2 = (x64**2).sum(axis=0)
            var = (s2 - mean * mean * n) / (n - 1)
            std = np.sqrt(np.maximum(var, 0.0))
        else:
            std = np.zeros_like(mean)
        self._mean = jnp.asarray(mean, jnp.float32)
        self._std = jnp.asarray(std, jnp.float32)
        j_terms = int(np.ceil((n / self.num_classes) ** (1.0 / 3.0)))
        self.j_terms = max(j_terms, 3)  # min_J (:673-675)
        v = _normalize(
            jnp.asarray(x_train, jnp.float32),
            self._mean,
            self._std,
            self.features_scale,
        )
        self._a_cos, self._a_sin = _fit_coeffs(
            v, jnp.asarray(y_train, jnp.int32), self.j_terms, self.num_classes
        )
        self._d = d
        return self

    def _predict_bf(self, queries: np.ndarray) -> np.ndarray:
        v = _normalize(
            jnp.asarray(queries, jnp.float32),
            self._mean,
            self._std,
            self.features_scale,
        )
        outputs = _density_logs(v, self._a_cos, self._a_sin)
        return np.asarray(jnp.argmax(outputs, axis=1))

    def _predict_sequential(self, queries: np.ndarray) -> np.ndarray:
        v = _normalize(
            jnp.asarray(queries, jnp.float32),
            self._mean,
            self._std,
            self.features_scale,
        )
        b = v.shape[0]
        outputs = jnp.zeros((b, self.num_classes), jnp.float32)
        active = jnp.ones((b, self.num_classes), bool)
        done = jnp.zeros((b,), bool)
        best = jnp.zeros((b,), jnp.int32)
        for start in range(0, self._d, DELTA_FEATURES):
            end = min(start + DELTA_FEATURES, self._d)
            contrib = _density_logs(
                v[:, start:end], self._a_cos[start:end], self._a_sin[start:end]
            )
            # inactive classes stop accumulating (:757-767)
            outputs = outputs + jnp.where(
                active & ~done[:, None], contrib, 0.0
            )
            masked = jnp.where(active, outputs, NEG_INF)
            round_best = jnp.argmax(masked, axis=1).astype(jnp.int32)
            best = jnp.where(done, best, round_best)
            max_out = jnp.max(masked, axis=1, keepdims=True)
            thresh = max_out + self.output_delta * end  # (:778)
            keep = (masked >= thresh) & active
            num_variants = jnp.sum(keep, axis=1)
            round_done = num_variants == 1
            active = jnp.where(done[:, None], active, keep)
            done = done | round_done
        return np.asarray(best)

    def predict(self, queries: np.ndarray) -> np.ndarray:
        if self.bruteforce:
            return self._predict_bf(queries)
        return self._predict_sequential(queries)


# ---------------------------------------------------------------------------
# NumPy oracle — scalar-faithful FPNN brute force for parity tests
# ---------------------------------------------------------------------------

def fpnn_oracle_predict(
    query: np.ndarray,
    x_train: np.ndarray,
    y_train: np.ndarray,
    num_classes: int,
    features_scale: float = 1.0,
) -> int:
    """classification.cpp:661-735 in float64 with the cos/sin recurrence."""
    from fast_image_recognition_tpu.ops.fastmath import fasterlog2_np

    x64 = np.asarray(x_train, np.float64)
    n, d = x64.shape
    mean = x64.mean(axis=0)
    s2 = (x64**2).sum(axis=0)
    var = (s2 - mean * mean * n) / (n - 1)
    std = np.sqrt(np.maximum(var, 0.0))

    def norm(vals):
        v = np.where(std != 0, features_scale * (vals - mean) / np.where(std != 0, std, 1), 0.0)
        return np.clip(v, -0.5, 0.5)

    j_terms = max(int(np.ceil((n / num_classes) ** (1 / 3))), 3)
    a = np.zeros((d, num_classes, 2 * j_terms + 1))
    a[:, :, 0] = 0.5
    vtr = norm(x64)
    counts = np.bincount(y_train, minlength=num_classes)
    for t in range(n):
        c = y_train[t]
        for j in range(j_terms):
            wj = (1.0 / counts[c]) * (j_terms - j) / (j_terms * (j_terms + 1))
            a[:, c, 2 * j + 1] += np.cos(np.pi * (j + 1) * vtr[t]) * wj
            a[:, c, 2 * j + 2] += np.sin(np.pi * (j + 1) * vtr[t]) * wj

    v = norm(np.asarray(query, np.float64))
    outputs = np.zeros(num_classes, dtype=np.float32)
    cos_vals = np.zeros((d, j_terms))
    sin_vals = np.zeros((d, j_terms))
    cos_vals[:, 0] = np.cos(np.pi * v)
    sin_vals[:, 0] = np.sin(np.pi * v)
    for j in range(1, j_terms):
        cos_vals[:, j] = (
            cos_vals[:, j - 1] * cos_vals[:, 0] - sin_vals[:, j - 1] * sin_vals[:, 0]
        )
        sin_vals[:, j] = (
            cos_vals[:, j - 1] * sin_vals[:, 0] + sin_vals[:, j - 1] * cos_vals[:, 0]
        )
    for c in range(num_classes):
        probab = a[:, c, 0].copy()
        for j in range(j_terms):
            probab += a[:, c, 2 * j + 1] * cos_vals[:, j]
            probab += a[:, c, 2 * j + 2] * sin_vals[:, j]
        outputs[c] = fasterlog2_np(probab.astype(np.float32)).sum()
    return int(np.argmax(outputs))
