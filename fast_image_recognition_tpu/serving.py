"""End-to-end recognition serving: folded extract + fused 1-NN match.

The reference's production flow is extract-then-match as two separate
programs (qt_cpp/dnn_feature_extractor.py:127-128 writes features, then
qt_cpp/main.cpp drives the match over the loaded gallery). On TPU the
right shape is ONE jitted program per batch: the BN-folded backbone
forward (models/fold.py::make_serving_fn), L2 normalization, and the
gallery match run back-to-back on device, so a raw uint8 image batch goes
in and [B] gallery row indices come out with a single host transfer.
On a single TensorCore there is nothing to overlap — the
compiler-scheduled serial program is the optimum (ARCHITECTURE.md §3).

Match modes:

- ``match='pca'`` (default): candidate generation in a PCA-``pca_dim``
  projection of the gallery via the tile-min kernel (one bf16 matmul over
  a 10x-smaller gallery stream), then an exact full-D bf16 rescore of the
  top-``rescore`` candidate rows (the role PCA plays in the reference —
  db_features.cpp:164 ``extractPCA`` — recast as candidates + rescore so
  the answer stays exact; the e2e bench audits 100% agreement with the
  fp32 scan at 1M rows).
- ``match='exact'``: the fused brute-force kernel (ops/distance_kernel.py
  ``topk_l2``) over the full-D gallery.
- ``match='int8'``: per-row symmetric int8 gallery scan at 2x the MXU
  rate and half the HBM stream (``topk_l2_quant``), then an exact bf16
  rescore of the top-tile candidates — the quantized rung of the serving
  ladder (ops/quant.py; no reference counterpart, its scalar loops are
  bandwidth-bound either way).
- ``match='sharded'``: the gallery shards on N across ``mesh``'s
  ``gallery`` axis; every chip scans its HBM-resident slice and the
  per-chip top-1 candidates merge with one ``all_gather`` over ICI
  (parallel/sharded_gallery.py) — the multi-chip scaling axis of the
  BASELINE target, still one jitted program per batch.
  ``sharded_scan='packed'`` runs the e2e-winning packed PCA candidate
  scan + exact full-D rescore *per shard* (rescore rows are shard-local,
  no cross-chip gather) instead of the full-D exact scan —
  ~pca_dim/D of the per-chip FLOPs/HBM at identical merge traffic.

This is the library surface behind ``bench.py``'s e2e config.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


class RecognitionService:
    """Folded-backbone extract + device-resident gallery 1-NN, one jit.

    ``gallery`` is [N, D] host float (rows should be L2-normalized, as the
    reference loader guarantees) or an already-padded device bf16 array
    (pass ``n_valid`` for the true row count). ``labels`` (optional [N])
    makes :meth:`identify` return class labels alongside gallery rows.
    """

    def __init__(
        self,
        model,
        variables,
        info: dict,
        gallery,
        *,
        labels: Optional[np.ndarray] = None,
        resolution: Optional[int] = None,
        match: str = "pca",
        pca_dim: int = 128,
        rescore: int = 48,
        pca_scan: str = "f32",
        sharded_scan: str = "exact",  # 'exact' | 'packed' (match='sharded')
        select: str = "exact",
        n_valid: Optional[int] = None,
        pca_sample: int = 8192,
        folded: bool = True,
        serving_fn=None,
        mesh=None,
    ):
        import jax
        import jax.numpy as jnp

        from fast_image_recognition_tpu.models.fold import make_serving_fn
        from fast_image_recognition_tpu.ops.distance_kernel import (
            gallery_sq_norms,
            pad_gallery,
        )

        self.info = info
        self.resolution = int(resolution or info["resolution"])
        self.dim = int(info["embedding_dim"])
        self.match = match
        self.rescore = int(rescore)
        if serving_fn is not None:
            # caller already folded (folding device_gets once — one round
            # trip worth skipping on a tunneled device)
            self.serve, self.sparams = serving_fn
        else:
            self.serve, self.sparams = make_serving_fn(
                model, variables, info, resolution=self.resolution,
                folded=folded,
            )

        if match == "sharded":
            from fast_image_recognition_tpu.parallel.mesh import gallery_mesh
            from fast_image_recognition_tpu.parallel.sharded_gallery import (
                shard_gallery,
            )

            self.mesh = mesh if mesh is not None else gallery_mesh()
            g = np.asarray(gallery, np.float32)
            self.n_valid = int(n_valid if n_valid is not None else g.shape[0])
            self.gallery, self._shard_valid = shard_gallery(g, self.mesh)
            self.sharded_scan = sharded_scan
            if sharded_scan == "packed":
                from fast_image_recognition_tpu.ops.pca import fit_pca
                from fast_image_recognition_tpu.parallel.sharded_gallery import (
                    shard_gallery_pca_aug,
                )

                sample = g[: min(self.n_valid, pca_sample)]
                pca = fit_pca(
                    sample, num_components=min(pca_dim, sample.shape[1])
                )
                self.pca_dim = int(pca.components.shape[0])
                self._mu = jnp.asarray(pca.mean, jnp.float32)
                self._w = jnp.asarray(pca.components.T, jnp.float32)
                self._gal_aug = shard_gallery_pca_aug(
                    self.gallery,
                    self._shard_valid,
                    self.mesh,
                    self._mu,
                    self._w,
                    tile_g=512,
                )
        elif isinstance(gallery, jax.Array) and gallery.dtype == jnp.bfloat16:
            self.gallery = gallery  # already device/padded (bench path)
            self.n_valid = int(n_valid if n_valid is not None else gallery.shape[0])
        else:
            g = np.asarray(gallery, np.float32)
            self.n_valid = int(n_valid if n_valid is not None else g.shape[0])
            self.gallery = pad_gallery(jnp.asarray(g, jnp.bfloat16))
        self.labels = None if labels is None else np.asarray(labels)

        if match == "pca":
            from fast_image_recognition_tpu.ops.pca import fit_pca

            # fit the projection on a small host-fetched sample (fetching
            # the full gallery over a tunneled link costs minutes)
            sample = np.asarray(
                self.gallery[: min(self.n_valid, pca_sample)].astype(
                    jnp.float32
                ),
                np.float32,
            )
            pca = fit_pca(sample, num_components=min(pca_dim, sample.shape[1]))
            self.pca_dim = int(pca.components.shape[0])
            mu = jnp.asarray(pca.mean, jnp.float32)
            w = jnp.asarray(pca.components.T, jnp.float32)  # [D, P]
            self._mu, self._w = mu, w
            # project the padded bf16 gallery on device: one bf16 matmul
            gal_pca = jax.jit(
                lambda g: (
                    (g - mu.astype(jnp.bfloat16)) @ w.astype(jnp.bfloat16)
                ).astype(jnp.bfloat16)
            )(self.gallery)
            gal_sq = jax.jit(
                lambda g: gallery_sq_norms(g, self.n_valid)
            )(gal_pca)
            self.pca_scan = pca_scan
            self.select = select
            if pca_scan == "packed":
                # single-reduce packed scan (ops/distance_kernel.py
                # ``_tilemin_packed_kernel``): the distance assembles on
                # the MXU via augmented columns and value+argmin ride ONE
                # int32 min — measured 1.8x the fp32-scores scan at 1M
                # rows. Works best when pca_dim + 4 lands on a 128-lane
                # multiple (use pca_dim=124, the e2e default).
                from fast_image_recognition_tpu.ops.distance_kernel import (
                    pack_gallery_aug,
                )

                gal_aug = jax.jit(
                    lambda g: pack_gallery_aug(g, self.n_valid)
                )(gal_pca)
                self.match_args: Tuple = (gal_aug, self.gallery)
            elif pca_scan == "int8":
                # quantized candidate scan: half the HBM stream, 2x MXU
                # rate; the full-D bf16 rescore below absorbs int8 rounding
                from fast_image_recognition_tpu.ops.distance_kernel import (
                    quant_gallery_scales,
                )
                from fast_image_recognition_tpu.ops.quant import quantize_rows

                gal_pca_q, pscales = jax.jit(quantize_rows)(
                    gal_pca.astype(jnp.float32)
                )
                psc = jax.jit(
                    lambda s: quant_gallery_scales(s, self.n_valid)
                )(pscales)
                self.match_args: Tuple = (
                    gal_pca_q, psc, self.gallery, gal_sq
                )
            else:
                self.match_args = (gal_pca, self.gallery, gal_sq)
        elif match == "int8":
            from fast_image_recognition_tpu.ops.distance_kernel import (
                quant_gallery_scales,
            )
            from fast_image_recognition_tpu.ops.quant import quantize_rows

            gal_q, scales = jax.jit(quantize_rows)(self.gallery)
            gsq = jax.jit(
                lambda g: gallery_sq_norms(g, self.n_valid)
            )(self.gallery)
            gsc = jax.jit(
                lambda s: quant_gallery_scales(s, self.n_valid)
            )(scales)
            self.match_args = (gal_q, gsq, gsc, self.gallery)
        elif match == "sharded" and sharded_scan == "packed":
            self.match_args = (self._gal_aug, self.gallery)
        elif match in ("exact", "sharded"):
            self.match_args = (self.gallery,)
        else:
            raise ValueError(f"unknown match mode {match!r}")

        self._fn = jax.jit(self._extract_and_match)

    # ------------------------------------------------------------------ #

    def _match_emb(self, emb, *margs):
        """[B, D] fp32 normalized embeddings -> [B] gallery row ids."""
        import jax.numpy as jnp

        from fast_image_recognition_tpu.ops.distance_kernel import (
            topk_candidates_l2,
            topk_l2,
            topk_l2_quant,
        )

        if self.match == "exact":
            (gallery,) = margs
            _, idx = topk_l2(emb, gallery, k=1, n_valid=self.n_valid)
            return idx[:, 0]
        if self.match == "int8":
            gal_q, gsq, gsc, gallery = margs
            _, idx = topk_l2_quant(
                emb, gal_q, gsq, gsc, gallery, k=1,
                r=min(self.rescore, 16),
            )
            return idx[:, 0]
        if self.match == "sharded":
            if self.sharded_scan == "packed":
                from fast_image_recognition_tpu.parallel.sharded_gallery import (
                    sharded_topk_pca_packed,
                )

                gal_aug, gallery = margs
                _, idx = sharded_topk_pca_packed(
                    emb, gal_aug, gallery, self.mesh, self._mu, self._w,
                    k=1, rescore=self.rescore,
                    n_valid_per_shard=self._shard_valid, tile_g=512,
                )
                return idx[:, 0]
            from fast_image_recognition_tpu.parallel.sharded_gallery import (
                sharded_topk_l2,
            )

            (gallery,) = margs
            _, idx = sharded_topk_l2(
                emb, gallery, self.mesh, k=1,
                n_valid_per_shard=self._shard_valid,
            )
            return idx[:, 0]
        qp = (emb - self._mu) @ self._w
        if self.pca_scan == "packed":
            from fast_image_recognition_tpu.ops.distance_kernel import (
                topk_candidates_l2_packed,
            )

            gal_aug, gallery = margs
            cand = topk_candidates_l2_packed(
                qp, gal_aug, self.pca_dim, self.rescore,
                select=self.select,
            )
        elif self.pca_scan == "int8":
            from fast_image_recognition_tpu.ops.distance_kernel import (
                topk_candidates_l2_quant,
            )

            gal_pca_q, psc, gallery, gal_sq = margs
            cand = topk_candidates_l2_quant(
                qp, gal_pca_q, gal_sq, psc, self.rescore,
                select=self.select,
            )
        else:
            gal_pca, gallery, gal_sq = margs
            cand = topk_candidates_l2(
                qp, gal_pca, self.rescore, n_valid=self.n_valid, gsq=gal_sq,
                precise_scores=(self.pca_scan != "bf16"),
                select=self.select,
            )
        rows = jnp.take(gallery, cand, axis=0)  # [B, R, D] bf16
        cross = jnp.einsum(
            "bd,brd->br", emb.astype(rows.dtype), rows,
            preferred_element_type=jnp.float32,
        )
        rsq = jnp.einsum(
            "brd,brd->br", rows, rows, preferred_element_type=jnp.float32
        )
        d = rsq - 2.0 * cross  # + |q|^2, constant per row
        best = jnp.argmin(d, axis=1)
        return jnp.take_along_axis(cand, best[:, None], 1)[:, 0]

    def _extract_and_match(self, sparams, images, *margs):
        import jax.numpy as jnp

        emb = self.serve(sparams, images)["embedding"].astype(jnp.float32)
        emb = emb / jnp.maximum(
            jnp.linalg.norm(emb, axis=1, keepdims=True), 1e-30
        )
        return self._match_emb(emb, *margs)

    # ------------------------------------------------------------------ #

    def identify_device(self, images):
        """Raw image batch (uint8/0..255 float, device or host) -> device
        [B] int32 gallery rows — the timing-loop surface (queue many, fetch
        once)."""
        return self._fn(self.sparams, images, *self.match_args)

    def identify(self, images):
        """Raw image batch -> (gallery rows [B] int64, labels [B] or None)."""
        idx = np.asarray(self.identify_device(images)).astype(np.int64)
        return idx, (None if self.labels is None else self.labels[idx])

    def embed(self, images):
        """Raw image batch -> L2-normalized [B, D] fp32 embeddings (the
        extract-features product, dnn_feature_extractor.py:121-128)."""
        import jax
        import jax.numpy as jnp

        if not hasattr(self, "_embed_fn"):
            # cache the jitted fn: a fresh lambda per call would miss
            # jax's jit cache and recompile every time
            self._embed_fn = jax.jit(
                lambda v, im: self.serve(v, im)["embedding"].astype(
                    jnp.float32
                )
            )
        emb = np.asarray(self._embed_fn(self.sparams, images), np.float32)
        return emb / np.maximum(
            np.linalg.norm(emb, axis=1, keepdims=True), 1e-30
        )

    def match_flops(self, batch: int) -> float:
        """Per-dispatch match FLOPs (the backbone dominates; see
        utils/flops.fn_flops for the extract side)."""
        if self.match == "sharded" and getattr(self, "sharded_scan", "") == "packed":
            s = 1
            for a in ("gallery",):
                s *= self.mesh.shape[a]
            return (
                2.0 * batch * self.dim * self.pca_dim * s  # proj, replicated
                + 2.0 * batch * self.n_valid * self.pca_dim  # scan, sharded
                + 2.0 * batch * self.rescore * self.dim * 2 * s  # per-shard
            )
        if self.match in ("exact", "sharded", "int8"):
            # int8's scan halves wall-clock per FLOP, not the FLOP count
            return 2.0 * batch * self.n_valid * self.dim
        return (
            2.0 * batch * self.dim * self.pca_dim
            + 2.0 * batch * self.n_valid * self.pca_dim
            + 2.0 * batch * self.rescore * self.dim * 2
        )


def build_service(
    variant: str,
    gallery,
    labels: Optional[np.ndarray] = None,
    *,
    seed: int = 0,
    variables=None,
    **kwargs,
) -> RecognitionService:
    """Convenience constructor from a zoo variant name. ``variables=None``
    builds a fresh (random) backbone — tests/benches; production passes
    converted checkpoint variables (utils/keras_checkpoint.py)."""
    from fast_image_recognition_tpu.models import backbone_info, create_backbone

    info = backbone_info(variant)
    resolution = kwargs.pop("resolution", None) or int(info["resolution"])
    model, fresh = create_backbone(variant, 0, seed=seed, resolution=resolution)
    return RecognitionService(
        model,
        variables if variables is not None else fresh,
        info,
        gallery,
        labels=labels,
        resolution=resolution,
        **kwargs,
    )
