"""Multi-exit cascade policies over per-level embeddings.

Reference: tf_keras/sequential_inference.py —
- sequential kNN exits (:483-508): at level l, 1-NN with cosine distance
  ``2 - 2 x.q``; exit when every gallery item within ``d_min / 0.8`` shares
  the best label, else continue to the next (more expensive) level;
- LinearSVC exits, the paper's proposed method (:587-686): one linear
  classifier per level; exit when the max decision value clears a threshold
  — fixed 0.06 or tuned on a held-out half to FAR <= 1%;
- BranchyNet entropy exits (:1079-1146): exit when the softmax entropy of
  the level's head is <= theta; max-softmax variant ("ConditionalNet",
  :1148-1165);
- hybrid kNN exits + final SVC (:725-773).

TPU design: each policy is evaluated for the WHOLE batch per level in one
device computation (no per-image Python loops — the reference iterates
images one by one, :491, :643), producing a per-image exit mask; predictions
are frozen at the first level whose mask fires. ``break_counts`` reproduces
the per-level exit distribution the reference prints (:503, :661).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Per-level linear classifier (SVC-style decision values)
# ---------------------------------------------------------------------------

def train_linear_svc(
    x: np.ndarray,
    y: np.ndarray,
    num_classes: int,
    use_sklearn: bool = True,
    steps: int = 200,
    lr: float = 0.05,
    reg: float = 1e-4,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (coef [C, D], intercept [C]) with LinearSVC-like one-vs-rest
    decision values. ``use_sklearn=True`` matches the reference exactly
    (sequential_inference.py:602); the fallback is a jitted one-vs-rest
    squared-hinge SGD on device (same loss family as LinearSVC)."""
    if use_sklearn:
        try:
            from sklearn.svm import LinearSVC

            svc = LinearSVC()
            svc.fit(x, y)
            coef = svc.coef_
            intercept = svc.intercept_
            if coef.shape[0] == 1 and num_classes == 2:
                coef = np.vstack([-coef, coef])
                intercept = np.concatenate([-intercept, intercept])
            return coef.astype(np.float32), intercept.astype(np.float32)
        except ImportError:
            pass

    x_j = jnp.asarray(x, jnp.float32)
    targets = (jnp.asarray(y)[:, None] == jnp.arange(num_classes)[None, :]) * 2.0 - 1.0

    def loss_fn(params):
        w, b = params
        scores = x_j @ w.T + b  # [N, C]
        hinge = jnp.maximum(0.0, 1.0 - targets * scores)
        return jnp.mean(jnp.sum(hinge**2, axis=1)) + reg * jnp.sum(w * w)

    key = jax.random.PRNGKey(seed)
    w = jax.random.normal(key, (num_classes, x.shape[1])) * 0.01
    b = jnp.zeros((num_classes,))
    grad = jax.jit(jax.grad(loss_fn))

    @jax.jit
    def step(params, _):
        g = grad(params)
        return (params[0] - lr * g[0], params[1] - lr * g[1]), None

    (w, b), _ = jax.lax.scan(step, (w, b), None, length=steps)
    return np.asarray(w, np.float32), np.asarray(b, np.float32)


def tune_far_threshold(
    decision_values: np.ndarray,  # [N, C] held-out decision values
    y: np.ndarray,
    far: float = 0.01,
) -> float:
    """Per-level threshold tuning (sequential_inference.py:609-631): walk
    correct-prediction max-scores in descending order; stop when the false
    accept rate among mistakes exceeds ``far``."""
    predictions = decision_values.argmax(axis=1)
    max_vals = decision_values.max(axis=1)
    mistakes = max_vals[predictions != y]
    best_threshold = -1.0
    n = len(predictions)
    for threshold in sorted(max_vals[predictions == y])[::-1]:
        fpr = (mistakes > threshold).sum() / n
        if fpr > far:
            if best_threshold == -1.0:
                best_threshold = threshold
            break
        best_threshold = threshold
    return float(best_threshold)


# ---------------------------------------------------------------------------
# Batched cascade evaluation
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class CascadeResult:
    predictions: np.ndarray  # [B]
    exit_level: np.ndarray  # [B] index of the level each probe exited at
    break_counts: np.ndarray  # [L] per-level exit distribution (fractions)

    def summary(self) -> str:
        return f"average breaks per layer: {self.break_counts}"


def _finalize(preds_per_level, exit_masks, num_levels) -> CascadeResult:
    """Freeze each probe at its first firing level (last level always
    fires)."""
    b = preds_per_level[0].shape[0]
    exit_level = np.full(b, num_levels - 1, dtype=np.int64)
    decided = np.zeros(b, dtype=bool)
    preds = np.zeros(b, dtype=np.int64)
    for l in range(num_levels):
        fire = exit_masks[l] & ~decided
        preds[fire] = preds_per_level[l][fire]
        exit_level[fire] = l
        decided |= fire
    counts = np.bincount(exit_level, minlength=num_levels).astype(np.float64) / b
    return CascadeResult(preds, exit_level, counts)


@jax.jit
def _knn_level(gallery: jax.Array, g_labels: jax.Array, queries: jax.Array, ratio: float):
    """One kNN exit level: distances 2-2 x.q (cosine on normalized rows,
    sequential_inference.py:469/493), reliability = all neighbours within
    d_min/ratio share the best label (:496-497)."""
    d = 2.0 - 2.0 * queries @ gallery.T  # [B, N]
    best = jnp.argmin(d, axis=1)
    d_min = jnp.take_along_axis(d, best[:, None], 1)[:, 0]
    y_best = jnp.take(g_labels, best)
    within = d <= (d_min / ratio)[:, None]
    same = g_labels[None, :] == y_best[:, None]
    reliable = jnp.all(~within | same, axis=1)
    return y_best, reliable


def sequential_knn_cascade(
    x_train_levels: Sequence[np.ndarray],
    y_train: np.ndarray,
    x_val_levels: Sequence[np.ndarray],
    ratio: float = 0.8,
) -> CascadeResult:
    """sequential_knn_tester (sequential_inference.py:483-508), batched."""
    num_levels = len(x_train_levels)
    y_tr = jnp.asarray(y_train, jnp.int32)
    preds = []
    masks = []
    for l in range(num_levels):
        y_best, reliable = _knn_level(
            jnp.asarray(x_train_levels[l], jnp.float32),
            y_tr,
            jnp.asarray(x_val_levels[l], jnp.float32),
            ratio,
        )
        preds.append(np.asarray(y_best))
        masks.append(
            np.ones_like(np.asarray(reliable))
            if l == num_levels - 1
            else np.asarray(reliable)
        )
    return _finalize(preds, masks, num_levels)


@dataclasses.dataclass
class LinearExitCascade:
    """The paper's proposed method (sequential_inference.py:587-686): a
    linear classifier per level, exiting on max decision value."""

    coefs: List[np.ndarray]
    intercepts: List[np.ndarray]
    thresholds: List[float]

    @staticmethod
    def train(
        x_train_levels: Sequence[np.ndarray],
        y_train: np.ndarray,
        num_classes: int,
        far: float = 0.01,
        fixed_threshold: Optional[float] = None,
        use_sklearn: bool = True,
        seed: int = 42,
    ) -> "LinearExitCascade":
        """Train per-level classifiers; tune each non-final level's
        threshold on a held-out half to FAR<=far (:609-631), unless a fixed
        threshold (0.06 in the reference, :655) is given."""
        num_levels = len(x_train_levels)
        coefs, intercepts, thresholds = [], [], []
        rng = np.random.default_rng(seed)
        for l in range(num_levels):
            x = np.asarray(x_train_levels[l], np.float32)
            threshold = fixed_threshold if fixed_threshold is not None else -1.0
            if l < num_levels - 1 and fixed_threshold is None:
                # stratified half split (model_selection.train_test_split
                # with test_size=0.5, :611)
                idx = rng.permutation(len(y_train))
                half = len(idx) // 2
                tr, va = idx[:half], idx[half:]
                w, b = train_linear_svc(
                    x[tr], y_train[tr], num_classes, use_sklearn
                )
                dv = x[va] @ w.T + b
                threshold = tune_far_threshold(dv, y_train[va], far)
            w, b = train_linear_svc(x, y_train, num_classes, use_sklearn)
            coefs.append(w)
            intercepts.append(b)
            thresholds.append(float(threshold))
        return LinearExitCascade(coefs, intercepts, thresholds)

    def evaluate(self, x_val_levels: Sequence[np.ndarray]) -> CascadeResult:
        num_levels = len(self.coefs)
        preds, masks = [], []
        for l in range(num_levels):
            scores = (
                jnp.asarray(x_val_levels[l], jnp.float32)
                @ jnp.asarray(self.coefs[l]).T
                + jnp.asarray(self.intercepts[l])
            )
            max_score = jnp.max(scores, axis=1)
            pred = jnp.argmax(scores, axis=1)
            fire = (
                np.ones(scores.shape[0], dtype=bool)
                if l == num_levels - 1
                else np.asarray(max_score > self.thresholds[l])
            )
            preds.append(np.asarray(pred))
            masks.append(fire)
        return _finalize(preds, masks, num_levels)


def entropy_exit_cascade(
    probs_per_level: Sequence[np.ndarray],
    threshold: float,
    mode: str = "entropy",
) -> CascadeResult:
    """BranchyNet evaluator (sequential_inference.py:1079-1165) over
    precomputed per-level softmax outputs. ``mode='entropy'`` exits when
    entropy <= threshold (:1127-1146); ``mode='max_prob'`` when max softmax
    > threshold (:1148-1165)."""
    num_levels = len(probs_per_level)
    preds, masks = [], []
    for l, p in enumerate(probs_per_level):
        p = np.asarray(p, np.float64)
        pred = p.argmax(axis=1)
        if mode == "entropy":
            ent = -(p * np.log(np.clip(p, 1e-12, None))).sum(axis=1)
            fire = ent <= threshold
        else:
            fire = p.max(axis=1) > threshold
        if l == num_levels - 1:
            fire = np.ones_like(fire)
        preds.append(pred)
        masks.append(fire)
    return _finalize(preds, masks, num_levels)


def knn_exits_with_final_classifier(
    x_train_levels: Sequence[np.ndarray],
    y_train: np.ndarray,
    x_val_levels: Sequence[np.ndarray],
    num_classes: int,
    ratio: float = 0.8,
    use_sklearn: bool = True,
) -> CascadeResult:
    """Hybrid: kNN exits at levels 0..L-2, final LinearSVC at level L-1
    (sequential_knn_classifier_tester, sequential_inference.py:725-773)."""
    num_levels = len(x_train_levels)
    w, b = train_linear_svc(
        np.asarray(x_train_levels[-1], np.float32),
        y_train,
        num_classes,
        use_sklearn,
    )
    preds, masks = [], []
    y_tr = jnp.asarray(y_train, jnp.int32)
    for l in range(num_levels - 1):
        y_best, reliable = _knn_level(
            jnp.asarray(x_train_levels[l], jnp.float32),
            y_tr,
            jnp.asarray(x_val_levels[l], jnp.float32),
            ratio,
        )
        preds.append(np.asarray(y_best))
        masks.append(np.asarray(reliable))
    scores = np.asarray(x_val_levels[-1], np.float32) @ w.T + b
    preds.append(scores.argmax(axis=1))
    masks.append(np.ones(scores.shape[0], dtype=bool))
    return _finalize(preds, masks, num_levels)
