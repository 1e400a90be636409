"""PCA feature reduction.

Reference: OpenCV PCA in two places — the loader-side ``extractPCA``
(qt_cpp/db_features.cpp:164-316) and the classification-side
``extract_pca_features`` to ``NO_PCA_FEATURES``=256 dims with recomputed
per-feature stats (qt_cpp/classification.cpp:864-940, 33).

Implementation: thin SVD on the mean-centered training rows (the same
subspace as OpenCV's covariance eigenvectors, up to component sign). Fit on
the host in float64 for determinism; projection is a single device matmul.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class PCAModel:
    mean: np.ndarray  # [D]
    components: np.ndarray  # [K, D] rows = principal axes
    explained_variance: np.ndarray  # [K]

    def project(self, x: np.ndarray) -> np.ndarray:
        """(x - mean) @ components.T — classification.cpp:888-897 projects
        ALL rows (train + test) with the train-fit basis."""
        x = np.asarray(x, dtype=np.float64)
        return (x - self.mean) @ self.components.T

    def project_device(self, x: jax.Array) -> jax.Array:
        mean = jnp.asarray(self.mean, jnp.float32)
        comps = jnp.asarray(self.components, jnp.float32)
        return (x - mean) @ comps.T

    def save(self, path: str) -> None:
        """XML-cache analog of db_features.cpp:174-199 (npz instead)."""
        np.savez(
            path,
            mean=self.mean,
            components=self.components,
            explained_variance=self.explained_variance,
        )

    @staticmethod
    def load(path: str) -> "PCAModel":
        z = np.load(path)
        return PCAModel(z["mean"], z["components"], z["explained_variance"])


def fit_pca(
    train_rows: np.ndarray, num_components: Optional[int] = None
) -> PCAModel:
    """num_components=None keeps all (cv::PCA(..., 0) retains everything,
    db_features.cpp:290)."""
    x = np.asarray(train_rows, dtype=np.float64)
    mean = x.mean(axis=0)
    centered = x - mean
    u, s, vt = np.linalg.svd(centered, full_matrices=False)
    n = x.shape[0]
    var = (s**2) / max(n - 1, 1)
    k = num_components if num_components is not None else vt.shape[0]
    k = min(k, vt.shape[0])
    return PCAModel(mean=mean, components=vt[:k], explained_variance=var[:k])
