"""Exact 1-NN over the full gallery.

Reference: the scalar linear scan in qt_cpp/db_features.cpp:319-335 and
qt_cpp/ann.cpp:113-126, with the optional feature-prefix truncation
``max_features``. Here the scan is one batched device computation: an
MXU distance block plus argmin, jitted once per (batch, gallery) shape.
Large galleries go through the blocked Pallas kernel
(ops/distance_kernel.py) to avoid materializing [B, N] score matrices.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from fast_image_recognition_tpu.config import DistanceKind
from fast_image_recognition_tpu.ops.distances import pairwise_distances, streamed_topk

# Above this many gallery rows, chi2/KL go through the streamed scan-with-
# running-top-k path instead of materializing a [B, N] score matrix.
STREAM_THRESHOLD = 65536


@partial(jax.jit, static_argnames=("kind", "max_features", "precise"))
def _top1(
    queries: jax.Array,
    gallery: jax.Array,
    kind: DistanceKind,
    max_features: Optional[int],
    precise: bool,
):
    end = max_features if max_features else queries.shape[-1]
    d = pairwise_distances(queries, gallery, start=0, end=end, kind=kind, precise=precise)
    idx = jnp.argmin(d, axis=1)
    best = jnp.take_along_axis(d, idx[:, None], axis=1)[:, 0]
    return idx.astype(jnp.int32), best


class BruteForceMatcher:
    """Exact 1-NN (name "BF" in the reference printouts, ann.h:45)."""

    def __init__(
        self,
        gallery_features: np.ndarray,
        kind: DistanceKind = DistanceKind.L2,
        max_features: Optional[int] = None,
        precise: bool = True,
        device_resident: bool = True,
        precision: str = "fp32",
    ):
        self.name = f"BF, {max_features}" if max_features else "BF"
        self.kind = kind
        self.max_features = max_features
        self.precise = precise
        self.precision = precision
        gal = jnp.asarray(gallery_features, dtype=jnp.float32)
        self._n = gallery_features.shape[0]
        if precision == "int8":
            # Quantized serving scan (L2 only): int8 HBM stream + int8 MXU
            # candidates, exact bf16 rescore of the one-per-tile top-R —
            # see ops/quant.py. Full-feature only (no prefix windows).
            if kind != DistanceKind.L2 or max_features:
                raise ValueError(
                    "precision='int8' supports full-feature L2 only"
                )
            from fast_image_recognition_tpu.ops.distance_kernel import (
                gallery_sq_norms,
                pad_gallery,
                quant_gallery_scales,
            )
            from fast_image_recognition_tpu.ops.quant import quantize_rows

            self.name = "BF-int8"
            q8, scales = jax.jit(quantize_rows)(gal)
            self._gal_q = pad_gallery(q8)
            self._gsq = jax.jit(lambda g: gallery_sq_norms(g, self._n))(gal)
            self._gsc = jax.jit(
                lambda s: quant_gallery_scales(s, self._n)
            )(scales)
            self.gallery = pad_gallery(gal.astype(jnp.bfloat16))
            return
        self.gallery = jax.device_put(gal) if device_resident else gal

    def set_budget(self, image_count_to_check: int) -> None:
        pass  # exact method: budget has no meaning

    def search(self, queries: np.ndarray):
        from fast_image_recognition_tpu.search.base import SearchResult

        q = jnp.asarray(queries, dtype=jnp.float32)
        if self.precision == "int8":
            from fast_image_recognition_tpu.ops.distance_kernel import (
                topk_l2_quant,
            )

            best, idx = topk_l2_quant(
                q, self._gal_q, self._gsq, self._gsc, self.gallery, k=1
            )
            best, idx = best[:, 0], idx[:, 0].astype(jnp.int32)
        elif self.kind != DistanceKind.L2 and self._n > STREAM_THRESHOLD:
            end = self.max_features or q.shape[-1]
            best, idx = streamed_topk(q, self.gallery, k=1, end=end, kind=self.kind)
            best, idx = best[:, 0], idx[:, 0]
        else:
            idx, best = _top1(q, self.gallery, self.kind, self.max_features, self.precise)
        b = int(q.shape[0])
        return SearchResult(
            indices=np.asarray(idx),
            distances=np.asarray(best),
            checked_fraction=np.ones(b, dtype=np.float32),
        )
