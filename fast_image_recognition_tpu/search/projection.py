"""Budgeted ANN baselines — the FLANN / NMSLIB counterpart methods.

Reference:
- FLANN kd-forest with a checks budget (qt_cpp/ann.h:102-119,
  ann.cpp:172-196): ``KDTreeIndexParams(4)``, k=1, SearchParams(budget);
- NMSLIB ``proj_incsort`` (qt_cpp/ann.h:121-157, ann.cpp:198-267):
  project to 32 dims (projDim=32, projType=perm), scan candidates in
  projected-distance order up to ``dbScanFrac`` of the gallery.

TPU-native counterpart: ``ProjectionIndexMatcher`` generalizes
proj_incsort — gallery rows are projected once at build time (random
Gaussian or PCA projection to ``proj_dim``), queries are projected with one
small matmul, candidates are ranked by projected distance (one MXU matmul)
and the true distance is evaluated over the top-``budget`` candidates in
rank order with the same first-k-then-stop accounting as DEM. Everything is
batched; no trees (pointer-chasing kd-trees are hostile to the TPU's
lockstep execution — the rank-then-probe formulation is the same
accuracy/%checked trade-off in dense linear algebra).

``KDTreeMatcher`` wraps sklearn's KDTree as the host-side FLANN stand-in
(a baseline, not the product — like the reference's OpenCV dependency).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from fast_image_recognition_tpu.ops.distances import pairwise_distances
from fast_image_recognition_tpu.ops.pca import fit_pca

BIG = 3.4e38


@partial(jax.jit, static_argnames=("budget",))
def _proj_search(
    queries: jax.Array,  # [B, D]
    gallery: jax.Array,  # [N, D]
    proj: jax.Array,  # [D, P]
    gallery_proj: jax.Array,  # [N, P]
    budget: int,
):
    d_all = pairwise_distances(queries, gallery)  # [B, N] true distances
    qp = queries @ proj  # [B, P]
    # projected L2 ranking (one MXU matmul via the expansion)
    qn = jnp.sum(qp * qp, 1, keepdims=True)
    gn = jnp.sum(gallery_proj * gallery_proj, 1)[None, :]
    d_proj = qn + gn - 2.0 * qp @ gallery_proj.T
    order = jnp.argsort(d_proj, axis=1)[:, :budget]
    d_cand = jnp.take_along_axis(d_all, order, axis=1)
    best = jnp.argmin(d_cand, axis=1)
    best_dist = jnp.take_along_axis(d_cand, best[:, None], 1)[:, 0]
    best_idx = jnp.take_along_axis(order, best[:, None], 1)[:, 0]
    return best_idx.astype(jnp.int32), best_dist


class ProjectionIndexMatcher:
    """'proj_incsort'-style budgeted matcher ("nmslib" in reference
    printouts, ann.cpp:201)."""

    def __init__(
        self,
        gallery_features: np.ndarray,
        proj_dim: int = 32,  # projDim=32 (ann.cpp:232)
        proj_type: str = "random",  # or 'pca'
        image_count_to_check: int = 0,
        seed: int = 0,
    ):
        self.name = f"proj_incsort({proj_type}{proj_dim})"
        self._n, d = gallery_features.shape
        if proj_type == "pca":
            pca = fit_pca(gallery_features, num_components=proj_dim)
            proj = pca.components.T.astype(np.float32)
        else:
            rng = np.random.default_rng(seed)
            proj = (
                rng.standard_normal((d, proj_dim)) / np.sqrt(proj_dim)
            ).astype(np.float32)
        self.gallery = jax.device_put(jnp.asarray(gallery_features, jnp.float32))
        self.proj = jax.device_put(jnp.asarray(proj))
        self.gallery_proj = self.gallery @ self.proj
        self.set_budget(image_count_to_check)

    def set_budget(self, image_count_to_check: int) -> None:
        if image_count_to_check <= 0 or image_count_to_check > self._n:
            image_count_to_check = self._n
        self.budget = int(image_count_to_check)

    def search(self, queries: np.ndarray):
        from fast_image_recognition_tpu.search.base import SearchResult

        q = jnp.asarray(queries, dtype=jnp.float32)
        idx, dist = _proj_search(
            q, self.gallery, self.proj, self.gallery_proj, self.budget
        )
        b = int(q.shape[0])
        return SearchResult(
            indices=np.asarray(idx),
            distances=np.asarray(dist),
            checked_fraction=np.full(b, self.budget / self._n, dtype=np.float32),
        )


class KDTreeMatcher:
    """Host-side kd-tree baseline — the FLANN role ("flann" printouts,
    ann.cpp:172-196). Exact unless subsampled; kept as a CPU comparison
    point exactly as the reference keeps OpenCV's."""

    def __init__(self, gallery_features: np.ndarray, leaf_size: int = 40):
        from sklearn.neighbors import KDTree

        self.name = "flann"
        self._n = gallery_features.shape[0]
        self._d = gallery_features.shape[1]
        self.tree = KDTree(np.asarray(gallery_features, np.float64), leaf_size=leaf_size)

    def set_budget(self, image_count_to_check: int) -> None:
        pass  # sklearn KDTree has no checks budget; exact baseline

    def search(self, queries: np.ndarray):
        from fast_image_recognition_tpu.search.base import SearchResult

        dist, idx = self.tree.query(np.asarray(queries, np.float64), k=1)
        b = queries.shape[0]
        return SearchResult(
            indices=idx[:, 0].astype(np.int32),
            # KDTree returns unnormalized euclidean; convert to the
            # window-mean squared distance of db_features.cpp:40
            distances=(dist[:, 0] ** 2 / self._d).astype(np.float32),
            checked_fraction=np.ones(b, dtype=np.float32),
        )
