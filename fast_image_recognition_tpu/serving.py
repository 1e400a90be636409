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

from typing import List, Optional, Sequence, Tuple

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
        escalate: Optional[float] = 0.05,
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

        # adaptive escalation (pca/packed/exact-select only): the packed
        # scan's second-min certificate proves per-probe whether the
        # rescored answer is the exact 1-NN; uncertified batches escalate
        # to the full-D scan inside the same jitted program (lax.cond),
        # so clean workloads pay only the certificate epilogue while
        # near-ambiguous workloads (noise-sweep >= 1.5x) stay EXACT.
        self.escalate = (
            float(escalate)
            if escalate is not None
            and match == "pca"
            and pca_scan == "packed"
            and select == "exact"
            else None
        )

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
        import jax
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
        bound = None
        if self.pca_scan == "packed":
            gal_aug, gallery = margs
            if self.escalate is not None:
                from fast_image_recognition_tpu.ops.distance_kernel import (
                    topk_candidates_l2_packed_cert,
                )

                cand, bound = topk_candidates_l2_packed_cert(
                    qp, gal_aug, self.pca_dim, self.rescore
                )
            else:
                from fast_image_recognition_tpu.ops.distance_kernel import (
                    topk_candidates_l2_packed,
                )

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
        idx_fast = jnp.take_along_axis(cand, best[:, None], 1)[:, 0]
        if bound is None:
            return idx_fast
        # escalation certificate: d1 (TRUE squared L2 of the rescored
        # best) must clear the candidate set's lower bound on everything
        # unscored, with slack covering bf16 operand rounding on both
        # sides and the packed key's 2^-13 quantization. Uncertified
        # probes take the exact full-D scan — one lax.cond, so certified
        # batches never pay for it.
        from fast_image_recognition_tpu.ops.distance_kernel import topk_l2

        qsq = jnp.einsum(
            "bd,bd->b", emb, emb, preferred_element_type=jnp.float32
        )
        d1 = jnp.take_along_axis(d, best[:, None], 1)[:, 0] + qsq
        slack = self.escalate
        esc = d1 + slack * qsq > (1.0 - slack) * bound
        n_valid = self.n_valid

        def _escalated(_):
            _, ei = topk_l2(emb, gallery, k=1, n_valid=n_valid)
            return jnp.where(esc, ei[:, 0], idx_fast)

        return jax.lax.cond(
            jnp.any(esc), _escalated, lambda _: idx_fast, None
        )

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


def _grid_pool(h, g: int):
    """[B, H, W, C] -> [B, g*g*C] fp32 adaptive mean pooling (the exit-tap
    readout features; g=1 is the plain pooled tap of the cascade engine,
    g>=2 keeps coarse spatial structure so the affine readout has rank to
    work with)."""
    import jax.numpy as jnp

    b, hh, ww, c = h.shape
    gh, gw = min(g, hh), min(g, ww)
    h = h[:, : (hh // gh) * gh, : (ww // gw) * gw, :]
    h = h.reshape(b, gh, hh // gh, gw, ww // gw, c)
    return jnp.mean(h.astype(jnp.float32), axis=(2, 4)).reshape(
        b, gh * gw * c
    )


def make_tap_embed_fn(model, variables, resolution: int, taps, grid: int = 1):
    """Jitted ``fn(images) -> (list of [B, g*g*C_l] tap embeddings, final
    [B, D] embedding)`` over the BN-folded pipeline — the extractor for
    building PER-LEVEL galleries (the reference's per-level embedding
    cache, sequential_inference.py:816-850). grid=1 = plain GAP, the tap
    embedding the level-gallery cascade matches on."""
    import jax
    import jax.numpy as jnp

    from fast_image_recognition_tpu.models.inference import (
        _block,
        fold_backbone,
        fold_preprocess_into_stem,
        folded_head,
        folded_stem_pp,
    )

    folded, configs = fold_backbone(model, variables)
    folded = fold_preprocess_into_stem(folded, resolution)
    tapset = set(taps)

    def fn(folded, images):
        h = folded_stem_pp(folded, images)
        feats = []
        for p, cfg in zip(folded["blocks"], configs):
            h = _block(h, p, cfg)
            if cfg["name"] in tapset:
                feats.append(_grid_pool(h, grid))
        emb = folded_head(folded, h)
        emb = emb / jnp.maximum(
            jnp.linalg.norm(emb, axis=1, keepdims=True), 1e-30
        )
        return feats, emb

    jfn = jax.jit(fn)
    return lambda images: jfn(folded, images)


class CascadeRecognitionService:
    """Early-exit recognition serving: the bound-breaking e2e variant.

    The exact bf16 backbone forward is wall-clock-bound at ~20k img/s on
    one v5e (ARCHITECTURE.md §3 roofline: VPU depthwise taps + HBM
    streaming, MXU ~93% idle) — so the only way past it is running fewer
    FLOPs/bytes per image. This service fuses the reference's two ideas
    for exactly that into ONE jitted program per batch:

    - multi-exit backbones (tf_keras/sequential_inference.py:359,:456-508
      — exit taps on the block ladder), and
    - sequential three-way decisions on the MATCH (qt_cpp/ImageTesting.cpp
      :533-535 — act when the 1-NN distance ratio d1/d2 clears a
      threshold, continue otherwise),

    recast TPU-first: at each exit tap an affine READOUT (ridge-fit on
    calibration images, the serving analog of the reference's per-level
    exit heads trained on cached embeddings, sequential_inference.py
    :823-886) predicts the FINAL embedding; the predicted embedding runs
    the same packed-PCA candidate scan + full-D rescore as the exact
    service, and a probe exits early when its rescored distance ratio
    d1/d2 < ``ratio`` (reference's 0.7, ImageTesting.cpp:533). Survivors
    compact device-side into the next segment's static capacity (sorted
    by margin, overflow force-exits — counted), so the whole cascade is
    one dispatch with ONE host transfer, like the engine's
    ``predict_fused`` (cascade/engine.py) but with 1-NN *gallery search*
    heads at production gallery sizes instead of C-class classifier heads.

    Semantics are approximate by design; ``bench.py --config e2e
    --extract cascade`` audits agreement against the exact path and error
    against the planted truth at every captured operating point.

    Measured honesty (design study, scripts/proto_cascade_serving.py):
    affine readouts need a TRAINED backbone — on random weights the
    tap->final-embedding map is chaotic (readout cosine ~0.49, bias-
    dominated, ZERO exits fire at any ratio up to 0.9), so the cascade
    safely degenerates to the exact answer plus tap overhead. The rule
    is fail-closed: uninformative readouts produce unconfident ratios,
    never wrong early answers. The trained-weights operating curve
    (recall vs img/s on real labels) is captured by
    ``cli/run_cascade_serving.py``; with many gallery rows per class use
    ``d2_rule='class'`` (nearest other-class candidate as d2 — the
    class-aware ratio criterion of the reference's TWD rules) because
    the plain runner-up ratio never clears threshold when the top-2 rows
    share a class.
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
        taps: Optional[Sequence[str]] = None,
        grid: int = 2,
        pca_dim: int = 124,
        rescore: int = 48,
        ratio: float = 0.7,
        d2_rule: str = "row",
        n_valid: Optional[int] = None,
        pca_sample: int = 8192,
        calib_total: int = 4096,
        calib_batch: int = 1024,
        ridge: float = 1e-3,
        calib_images=None,
        galleries: Optional[Sequence] = None,
        seed: int = 17,
    ):
        import jax
        import jax.numpy as jnp

        from fast_image_recognition_tpu.models.efficientnet import (
            default_taps,
        )
        from fast_image_recognition_tpu.models.inference import (
            fold_backbone,
            fold_preprocess_into_stem,
        )
        from fast_image_recognition_tpu.ops.distance_kernel import (
            pack_gallery_aug,
            pad_gallery,
        )
        from fast_image_recognition_tpu.ops.pca import fit_pca

        if not hasattr(model, "plan_configs"):
            raise ValueError(
                "cascade serving needs an MBConv-family backbone "
                "(EfficientNet / MobileNetV2) — the functional fold "
                "exposes the block ladder the exits tap"
            )
        self.info = info
        self.resolution = int(resolution or info["resolution"])
        self.dim = int(info["embedding_dim"])
        self.grid = int(grid)
        self.rescore = int(rescore)
        self.ratio = float(ratio)
        if d2_rule not in ("row", "class"):
            raise ValueError("d2_rule must be 'row' or 'class'")
        if d2_rule == "class" and labels is None:
            raise ValueError("d2_rule='class' needs gallery labels")
        self.d2_rule = d2_rule
        self.labels = None if labels is None else np.asarray(labels)

        folded, configs = fold_backbone(model, variables)
        self._folded = fold_preprocess_into_stem(folded, self.resolution)
        self._configs = configs
        plan = model.plan_configs()
        if taps is None:
            variant = getattr(model, "variant", "b0")
            taps = default_taps(variant, "early")[:2]
        self.taps = list(taps)
        name_to_idx = {b["name"]: i for i, b in enumerate(plan)}
        tap_idx = [name_to_idx[t] for t in self.taps]
        assert tap_idx == sorted(tap_idx), "taps must be in network order"
        bounds = [0] + [i + 1 for i in tap_idx] + [len(plan)]
        self.segments = list(zip(bounds[:-1], bounds[1:]))
        self.num_levels = len(self.segments)

        # gallery assets: identical to RecognitionService match='pca'
        # pca_scan='packed' (the measured-best exact-path operating point)
        if isinstance(gallery, jax.Array) and gallery.dtype == jnp.bfloat16:
            self.gallery = gallery
            self.n_valid = int(
                n_valid if n_valid is not None else gallery.shape[0]
            )
        else:
            g = np.asarray(gallery, np.float32)
            self.n_valid = int(n_valid if n_valid is not None else g.shape[0])
            self.gallery = pad_gallery(jnp.asarray(g, jnp.bfloat16))
        # the candidate set is the per-tile minima of the packed scan; the
        # ratio rule needs a real runner-up, so small galleries shrink the
        # scan tile until there are >= 8 tiles (1M-row serving stays 1024)
        self._tile_g = 1024
        while self._tile_g > 128 and self.n_valid < 8 * self._tile_g:
            self._tile_g //= 2
        sample = np.asarray(
            self.gallery[: min(self.n_valid, pca_sample)].astype(jnp.float32),
            np.float32,
        )
        pca = fit_pca(sample, num_components=min(pca_dim, sample.shape[1]))
        self.pca_dim = int(pca.components.shape[0])
        self._mu = jnp.asarray(pca.mean, jnp.float32)
        self._w = jnp.asarray(pca.components.T, jnp.float32)
        mu_b, w_b = (
            self._mu.astype(jnp.bfloat16),
            self._w.astype(jnp.bfloat16),
        )
        gal_pca = jax.jit(lambda g: ((g - mu_b) @ w_b).astype(jnp.bfloat16))(
            self.gallery
        )
        self._gal_aug = jax.jit(
            lambda g: pack_gallery_aug(g, self.n_valid, tile_g=self._tile_g)
        )(gal_pca)
        if self.d2_rule == "class":
            lab_pad = np.full(int(self.gallery.shape[0]), -1, np.int32)
            lab_pad[: self.n_valid] = self.labels[: self.n_valid]
            self._labels_dev = jnp.asarray(lab_pad)
        else:
            self._labels_dev = None

        # ---- exit-level match mode ----------------------------------- #
        # 'readout': per-tap affine readouts predict the FINAL embedding
        #   and match against the one final-embedding gallery (prediction
        #   error adds directly to d1 — measured to mute exits on hard
        #   unseen-identity workloads);
        # 'level': per-tap GALLERIES (``galleries``: one [N, D_l] array
        #   per tap, row-aligned with the final gallery) — each level
        #   matches its own tap embedding against a gallery built in the
        #   SAME space, so level confidence is the tap's own margin with
        #   no readout error. This is the reference's per-level embedding
        #   cache (sequential_inference.py:816-850 ``x_train_all[level]``)
        #   recast at production gallery scale. Tap features are plain
        #   GAP (grid=1) in this mode.
        self.mode = "readout" if galleries is None else "level"
        if self.mode == "level":
            if len(galleries) != self.num_levels - 1:
                raise ValueError(
                    f"need one tap gallery per exit level "
                    f"({self.num_levels - 1}), got {len(galleries)}"
                )
            self.grid = 1
            self._tap_assets = []
            for g_l in galleries:
                if int(g_l.shape[0]) < self.n_valid:
                    raise ValueError(
                        "tap galleries must be row-aligned with the final "
                        "gallery (row r = the same enrolled image at every "
                        f"level); got {int(g_l.shape[0])} rows < n_valid "
                        f"{self.n_valid}"
                    )
                if isinstance(g_l, jax.Array) and g_l.dtype == jnp.bfloat16:
                    gpad = g_l
                else:
                    gpad = pad_gallery(
                        jnp.asarray(np.asarray(g_l, np.float32), jnp.bfloat16)
                    )
                if int(gpad.shape[0]) != int(self.gallery.shape[0]):
                    raise ValueError(
                        "tap galleries must pad to the final gallery's row "
                        "count (pass n_valid and same pre-pad row counts)"
                    )
                aug = jax.jit(
                    lambda g, tg=self._tile_g: pack_gallery_aug(
                        g, self.n_valid, tile_g=tg
                    )
                )(gpad)
                self._tap_assets.append(
                    {"gal": gpad, "aug": aug, "dim": int(gpad.shape[1])}
                )
            self._readouts = None
        else:
            self._fit_readouts(
                calib_images, calib_total, calib_batch, ridge, seed
            )
        self.survivor_fractions: Optional[List[float]] = None
        self._capacities: Optional[Tuple[int, ...]] = None
        self._fused_fns = {}
        self._match2_jit = None

    # ------------------------------------------------------------------ #

    def _tap_forward_jit(self):
        """Cached jit of the calibration pass (shared by readout fitting
        and every ``calibrate`` call — ratio sweeps recalibrate without
        recompiling the full tap forward)."""
        import jax

        if getattr(self, "_tap_fwd", None) is None:
            self._tap_fwd = jax.jit(self._tap_forward())
        return self._tap_fwd

    def _tap_forward(self):
        """fn(folded, images) -> (list of grid-pooled tap feats, final
        embedding) — the calibration pass (all levels, no exits)."""
        import jax.numpy as jnp

        from fast_image_recognition_tpu.models.inference import (
            _block,
            folded_head,
            folded_stem_pp,
        )

        tapset = set(self.taps)
        configs = self._configs
        grid = self.grid

        def fn(folded, images):
            h = folded_stem_pp(folded, images)
            feats = []
            for p, cfg in zip(folded["blocks"], configs):
                h = _block(h, p, cfg)
                if cfg["name"] in tapset:
                    feats.append(_grid_pool(h, grid))
            emb = folded_head(folded, h)
            emb = emb / jnp.maximum(
                jnp.linalg.norm(emb, axis=1, keepdims=True), 1e-30
            )
            return feats, emb

        return fn

    def _fit_readouts(
        self, calib_images, calib_total, calib_batch, ridge, seed
    ) -> None:
        """Ridge-fit per-tap affine readouts tap-feats -> final embedding
        on calibration images (provided, or synthetic uint8 noise). The
        fit runs on host numpy — F_l is at most a few thousand."""
        import jax
        import jax.numpy as jnp

        fwd = self._tap_forward_jit()
        rng = np.random.default_rng(seed)
        res = self.resolution
        feats: Optional[List[list]] = None
        embs = []
        if calib_images is not None:
            calib_images = np.asarray(calib_images)
            calib_total = len(calib_images)
        done = 0
        while done < calib_total:
            b = min(calib_batch, calib_total - done)
            if calib_images is not None:
                imgs = jnp.asarray(calib_images[done : done + b])
            else:
                imgs = jnp.asarray(
                    rng.integers(0, 255, (b, res, res, 3), np.int64).astype(
                        np.uint8
                    )
                )
            f, e = fwd(self._folded, imgs)
            if feats is None:
                feats = [[] for _ in f]
            for j, t in enumerate(f):
                feats[j].append(np.asarray(t, np.float32))
            embs.append(np.asarray(e, np.float32))
            done += b
        emb = np.concatenate(embs)
        self._readouts = []
        for fl in feats:
            X = np.concatenate(fl)
            X = np.concatenate([X, np.ones((len(X), 1), np.float32)], axis=1)
            xtx = X.T @ X + ridge * len(X) * np.eye(
                X.shape[1], dtype=np.float32
            )
            A = np.linalg.solve(xtx, X.T @ emb)  # [F+1, D]
            self._readouts.append(jnp.asarray(A, jnp.float32))

    # ------------------------------------------------------------------ #

    def _match_top2(self, emb, gal_aug, gallery, project=True, dim=None):
        """Normalized [b, D] queries -> (best row [b], d1 [b], d2 [b]) via
        the packed candidate scan + exact bf16 rescore. d1/d2 are TRUE
        squared L2 distances (|q|^2 = 1 after normalization).

        ``project=True`` scans in the final gallery's PCA space (the exact
        service's candidate path); ``project=False`` scans the query as-is
        against a same-space gallery (the 'level' mode's tap-embedding
        match — tap dims are already small, no projection needed).

        d2 depends on ``d2_rule``:
        - 'row': the runner-up row among the rescored candidates
          (identification galleries: ~one row per identity, the
          reference's plain ratio test, ImageTesting.cpp:533);
        - 'class': the nearest candidate whose gallery LABEL differs from
          the top-1's (recognition galleries with many rows per class —
          the reference's class-aware ratio criterion, the d_min/0.8 rule
          of the sequential kNN cascade; +inf when every candidate agrees,
          i.e. maximally confident).

        Candidates come from distinct gallery tiles, so a missed true
        runner-up can only over-estimate d2 for 'row' (conservative); for
        'class' the audit is the captured recall itself."""
        import jax
        import jax.numpy as jnp

        from fast_image_recognition_tpu.ops.distance_kernel import (
            topk_candidates_l2_packed,
        )

        qp = (emb - self._mu) @ self._w if project else emb
        cand = topk_candidates_l2_packed(
            qp, gal_aug, dim if dim is not None else self.pca_dim,
            self.rescore, tile_g=self._tile_g,
        )
        rows = jnp.take(gallery, cand, axis=0)  # [b, R, D] bf16
        cross = jnp.einsum(
            "bd,brd->br", emb.astype(rows.dtype), rows,
            preferred_element_type=jnp.float32,
        )
        rsq = jnp.einsum(
            "brd,brd->br", rows, rows, preferred_element_type=jnp.float32
        )
        d = jnp.maximum(1.0 + rsq - 2.0 * cross, 0.0)
        # pad_gallery pads to a 1024-row multiple but small galleries
        # shrink _tile_g below that, creating whole all-padding tiles;
        # when rescore >= #valid tiles those tiles' argmins (rows of
        # zeros, d = 1.0 exactly) enter the candidate set and can beat
        # every real row. Mask them out (n_valid is static).
        d = jnp.where(cand < self.n_valid, d, jnp.inf)
        if d.shape[1] < 2:
            # degenerate single-candidate set: no runner-up information,
            # so the ratio rule must never fire (d2 = d1 => ratio 1)
            idx = cand[:, 0]
            return idx, d[:, 0], d[:, 0]
        if self.d2_rule == "class":
            best = jnp.argmin(d, axis=1)
            d1 = jnp.take_along_axis(d, best[:, None], 1)[:, 0]
            idx = jnp.take_along_axis(cand, best[:, None], 1)[:, 0]
            clab = jnp.take(self._labels_dev, cand)  # [b, R]
            lab1 = jnp.take_along_axis(clab, best[:, None], 1)[:, 0]
            d2 = jnp.min(
                jnp.where(clab != lab1[:, None], d, jnp.inf), axis=1
            )
            return idx, d1, d2
        neg, pos = jax.lax.top_k(-d, 2)
        idx = jnp.take_along_axis(cand, pos[:, :1], 1)[:, 0]
        return idx, -neg[:, 0], -neg[:, 1]

    def _normalize(self, emb):
        import jax.numpy as jnp

        return emb / jnp.maximum(
            jnp.linalg.norm(emb, axis=1, keepdims=True), 1e-30
        )

    def _build_fused(self, batch: int, caps: Tuple[int, ...]):
        import jax
        import jax.numpy as jnp

        from fast_image_recognition_tpu.models.inference import (
            folded_blocks,
            folded_head,
            folded_stem_pp,
        )

        segments = self.segments
        configs = self._configs
        num_levels = self.num_levels
        ratio2 = self.ratio * self.ratio
        grid = self.grid
        level_mode = self.mode == "level"
        tap_dims = (
            [a["dim"] for a in self._tap_assets] if level_mode else None
        )

        def fused(params, images, *margs):
            # margs: level mode -> (aug_0, gal_0, ..., aug_final, gal_final)
            #        readout mode -> (gal_aug, gallery)
            folded = params["folded"]
            readouts = params["readouts"]
            preds = jnp.zeros((batch,), jnp.int32)
            exit_level = jnp.zeros((batch,), jnp.int32)
            done = jnp.zeros((batch,), jnp.bool_)
            gidx = jnp.arange(batch, dtype=jnp.int32)
            forced = jnp.int32(0)
            carry = images
            for level, (start, end) in enumerate(segments):
                final = level == num_levels - 1
                if level == 0:
                    h = folded_stem_pp(folded, carry)
                    h = folded_blocks(folded, configs, h, 0, end)
                else:
                    h = folded_blocks(folded, configs, carry, start, end)
                if final:
                    emb = folded_head(folded, h)
                elif level_mode:
                    emb = _grid_pool(h, 1)  # plain GAP: the tap embedding
                else:
                    feats = _grid_pool(h, grid)
                    A = readouts[level]
                    emb = feats @ A[:-1] + A[-1]
                emb = self._normalize(emb.astype(jnp.float32))
                if level_mode:
                    aug_l, gal_l = margs[2 * level], margs[2 * level + 1]
                    lp, d1, d2 = self._match_top2(
                        emb, aug_l, gal_l,
                        project=final,
                        dim=None if final else tap_dims[level],
                    )
                else:
                    gal_aug, gallery = margs
                    lp, d1, d2 = self._match_top2(emb, gal_aug, gallery)
                live = ~done[gidx]
                # fire iff sqrt(d1/d2) < ratio  <=>  ratio^2*d2 - d1 > 0
                margin = ratio2 * d2 - d1
                fire = live if final else (margin > 0) & live
                preds = preds.at[gidx].set(
                    jnp.where(live, lp, preds[gidx]), unique_indices=True
                )
                exit_level = exit_level.at[gidx].set(
                    jnp.where(live, level, exit_level[gidx]),
                    unique_indices=True,
                )
                done = done.at[gidx].set(
                    done[gidx] | fire, unique_indices=True
                )
                if final:
                    break
                surv = live & ~fire
                c_next = min(caps[level + 1], int(gidx.shape[0]))
                # keep the least-confident survivors (most negative
                # margin); overflow rows — closest to firing — force-exit
                # with this level's answer (counted in ``forced``)
                order = jnp.argsort(
                    jnp.where(surv, margin, jnp.inf)
                )[:c_next]
                forced = forced + jnp.maximum(
                    jnp.sum(surv).astype(jnp.int32) - c_next, 0
                )
                gidx = gidx[order]
                carry = jnp.take(h, order, axis=0)
            # ONE host transfer per batch: [preds | exit_level | forced]
            return jnp.concatenate([preds, exit_level, forced[None]], axis=0)

        return jax.jit(fused)

    # ------------------------------------------------------------------ #

    def calibrate(self, images, slack: float = 1.3, multiple: int = 64):
        """Measure per-level survivor fractions on a workload-representative
        batch and size the static segment capacities (cap_l = roundup(B *
        frac * slack)) — the serving analog of the engine's ``calibrate``
        (capacity sizing only: the exit rule itself is the fixed distance-
        ratio test, reference ImageTesting.cpp:533-535, so there are no
        thresholds to tune)."""
        import jax
        import jax.numpy as jnp
        import math as _math

        fwd = self._tap_forward_jit()
        x = images if not isinstance(images, np.ndarray) else jnp.asarray(
            images
        )
        feats, _ = fwd(self._folded, x)
        b = int(x.shape[0])
        alive = np.ones(b, dtype=bool)
        fractions: List[float] = []
        if self._match2_jit is None:
            # gallery tensors enter as ARGUMENTS — a closure capture here
            # bakes the full-D gallery (~2.7 GB at 1M rows) into the
            # lowered module as a constant (slow lowering + a duplicate
            # HBM allocation in the executable)
            self._match2_jit = jax.jit(
                lambda e, ga, g: self._match_top2(e, ga, g)
            )
            self._match2_lvl_jit = jax.jit(
                lambda e, ga, g, d: self._match_top2(
                    e, ga, g, project=False, dim=d
                ),
                static_argnums=(3,),
            )
        for level in range(self.num_levels - 1):
            if self.mode == "level":
                emb = self._normalize(feats[level].astype(jnp.float32))
                a = self._tap_assets[level]
                _, d1, d2 = self._match2_lvl_jit(
                    emb, a["aug"], a["gal"], a["dim"]
                )
            else:
                A = self._readouts[level]
                emb = self._normalize(
                    (feats[level] @ A[:-1] + A[-1]).astype(jnp.float32)
                )
                _, d1, d2 = self._match2_jit(
                    emb, self._gal_aug, self.gallery
                )
            margin = np.asarray(self.ratio * self.ratio * d2 - d1)
            alive = alive & ~(margin > 0)
            fractions.append(float(alive.mean()))
        self.survivor_fractions = fractions
        caps = [b]
        for frac in fractions:
            c = max(1, _math.ceil(b * frac * slack))
            m = min(multiple, b)
            caps.append(min(b, ((c + m - 1) // m) * m))
        self._capacities = tuple(caps)
        return fractions

    def capacities_for(self, batch: int) -> Tuple[int, ...]:
        if self._capacities is not None and self._capacities[0] == batch:
            return self._capacities
        # uncalibrated default: geometric falloff (cap on forced exits is
        # the calibrate() path; this keeps the surface usable standalone)
        caps = [batch]
        for _ in range(self.num_levels - 1):
            caps.append(max(64, batch // 4) if batch >= 256 else batch)
        return tuple(caps)

    def _match_args(self) -> tuple:
        """Gallery tensors passed as jit ARGUMENTS (closure capture would
        bake multi-GB galleries into the lowered module as constants)."""
        if self.mode == "level":
            out = []
            for a in self._tap_assets:
                out.extend((a["aug"], a["gal"]))
            out.extend((self._gal_aug, self.gallery))
            return tuple(out)
        return (self._gal_aug, self.gallery)

    def identify_device(self, images, capacities=None):
        """Raw image batch -> device packed [2B+1] int32
        ([preds | exit_level | forced]) — the timing-loop surface."""
        import jax.numpy as jnp

        b = int(images.shape[0])
        caps = tuple(capacities) if capacities else self.capacities_for(b)
        key = (b, caps, images.shape[1:])
        if key not in self._fused_fns:
            self._fused_fns[key] = self._build_fused(b, caps)
        params = {"folded": self._folded, "readouts": self._readouts}
        return self._fused_fns[key](params, images, *self._match_args())

    def identify(self, images, capacities=None):
        """Raw image batch -> (gallery rows [B] int64, labels or None,
        stats dict with break_counts / forced_fraction)."""
        b = int(images.shape[0])
        packed = np.asarray(self.identify_device(images, capacities))
        idx = packed[:b].astype(np.int64)
        exit_level = packed[b : 2 * b]
        stats = {
            "break_counts": (
                np.bincount(exit_level, minlength=self.num_levels) / b
            ).tolist(),
            "forced_fraction": float(packed[2 * b]) / b,
        }
        return idx, (
            None if self.labels is None else self.labels[idx]
        ), stats


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


def build_cascade_service(
    variant: str,
    gallery,
    labels: Optional[np.ndarray] = None,
    *,
    seed: int = 0,
    variables=None,
    **kwargs,
) -> CascadeRecognitionService:
    """Convenience constructor for the early-exit serving cascade (same
    contract as :func:`build_service`)."""
    from fast_image_recognition_tpu.models import backbone_info, create_backbone

    info = backbone_info(variant)
    resolution = kwargs.pop("resolution", None) or int(info["resolution"])
    model, fresh = create_backbone(variant, 0, seed=seed, resolution=resolution)
    return CascadeRecognitionService(
        model,
        variables if variables is not None else fresh,
        info,
        gallery,
        labels=labels,
        resolution=resolution,
        **kwargs,
    )
