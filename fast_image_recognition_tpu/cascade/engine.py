"""End-to-end sequential (early-exit) inference over backbone segments.

Reference: the "proposed pipeline" of tf_keras/sequential_inference.py
:1278-1396 — trained LinearSVC weights are baked into Dense layers appended
to each exit tap after L2 normalization (:1350-1366), and true sequential
inference runs the backbone *segment by segment*, stopping each image at the
first exit whose max score clears the threshold (:1368-1394).

TPU design: early exit conflicts with lockstep batching (SURVEY.md §7 hard
part 3). Three batched execution strategies are provided:

- ``predict`` — host-decided batch compaction: after each segment only the
  [n, C] score matrix crosses to the host, which decides who exits;
  survivors are gathered on-device into the next static bucket shape.
  Exact sequential semantics, but one host round-trip per level — the
  round-trips dominate on a tunneled device.

- ``predict_fused`` — ONE jitted program for the whole cascade: each level
  runs at a static per-level CAPACITY (calibrated from the observed
  survivor fractions), survivors are compacted on-device (least-confident
  first) into the next capacity, and exit bookkeeping (predictions, exit
  level, done mask) is carried in device arrays. Zero host syncs; one
  transfer per batch. If more images survive a level than its capacity,
  the overflow — the *most confident* survivors, i.e. those closest to
  their threshold — is force-exited with the current level's prediction
  (counted in ``forced_fraction``); capacities carry slack so this is
  rare. This is the serving path that actually banks the early-exit FLOPs.

- ``predict_pooled`` — level-major over a large image POOL: each level
  runs the whole alive set in always-full ``bucket``-row dispatches, with
  survivors compacted ACROSS the pool (not per batch). Zero slack waste,
  zero forced exits, exact sequential semantics, one fetch per level per
  pool — the production shape when requests can be pooled; ``predict_fused``
  remains the latency shape for a single in-flight batch.

Segment engines: ``engine='bind'`` (default) runs segments through the
stock module (exact parity with ``model.apply``); ``engine='folded'`` runs
them through the BN-folded functional path of ``models/inference.py``
(MBConv families) — the same optimization the plain extractor ships, so the
cascade's savings are measured against the *optimized* baseline.

Exit heads: ``head_mode='linear'`` (default) is the baked-SVC rule above;
``head_mode='knn'`` is the sequential kNN rule of sequential_inference.py
:483-508 — 1-NN with cosine distance ``2 - 2 x.q`` against a per-level
gallery, exiting when every gallery row within ``d_min / ratio`` shares the
best label. That rule is equivalent to the scalar test
``ratio * d_other_min - d_min > 0`` (d_other_min = nearest different-label
distance), which is what the engine computes: one confidence scalar per
image feeds the same threshold/compaction machinery as the linear head, so
both policies share the fused one-dispatch program.
"""

from __future__ import annotations

import dataclasses
import math
import time
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _bucket(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@dataclasses.dataclass
class PipelineResult:
    predictions: np.ndarray
    exit_level: np.ndarray
    break_counts: np.ndarray
    ms_per_image: float
    forced_fraction: float = 0.0  # capacity-overflow forced exits (fused)


class SequentialInferencePipeline:
    """Backbone segments + baked linear exit heads + batch compaction."""

    def __init__(
        self,
        model,
        variables,
        taps: Sequence[str],
        coefs: Optional[Sequence[np.ndarray]] = None,  # per level [C, F_l]
        intercepts: Optional[Sequence[np.ndarray]] = None,
        thresholds: Optional[Sequence[float]] = None,  # per non-final level
        buckets: Sequence[int] = (32, 128, 512),
        l2_normalize: bool = True,
        engine: str = "bind",  # 'bind' | 'folded' (MBConv families)
        head_mode: str = "linear",  # 'linear' | 'knn'
        galleries: Optional[Sequence[np.ndarray]] = None,  # knn: [N, F_l]
        gallery_labels: Optional[np.ndarray] = None,  # knn: [N]
        ratio: float = 0.8,  # knn d_min/d_other rule (reference :496)
    ):
        self.model = model
        self.variables = variables
        plan = model.plan_configs()
        name_to_idx = {b["name"]: i for i, b in enumerate(plan)}
        tap_idx = [name_to_idx[t] for t in taps]
        assert tap_idx == sorted(tap_idx), "taps must be in network order"
        # segments: [0, t0+1), [t0+1, t1+1), ..., [t_last+1, n_blocks)
        bounds = [0] + [i + 1 for i in tap_idx] + [len(plan)]
        self.segments = list(zip(bounds[:-1], bounds[1:]))
        self.num_levels = len(self.segments)  # taps + final
        self.head_mode = head_mode
        self.ratio = float(ratio)
        if head_mode == "knn":
            assert galleries is not None and gallery_labels is not None
            assert len(galleries) == self.num_levels
            # gallery rows are L2-normalized once here (cosine distance
            # assumes unit rows, sequential_inference.py:469)
            self.galleries = [
                jnp.asarray(g, jnp.float32)
                / jnp.maximum(
                    jnp.linalg.norm(
                        jnp.asarray(g, jnp.float32), axis=1, keepdims=True
                    ),
                    1e-12,
                )
                for g in galleries
            ]
            self.gallery_labels = jnp.asarray(gallery_labels, jnp.int32)
            self.coefs = self.intercepts = None
        else:
            assert coefs is not None and len(coefs) == self.num_levels
            self.coefs = [jnp.asarray(c, jnp.float32) for c in coefs]
            self.intercepts = [
                jnp.asarray(b, jnp.float32) for b in intercepts
            ]
        if thresholds is None:
            thresholds = [0.0] * (self.num_levels - 1)
        self.thresholds = list(thresholds)
        self.buckets = sorted(buckets)
        self.l2_normalize = l2_normalize
        self.engine = engine
        if engine == "folded":
            from fast_image_recognition_tpu.models.inference import (
                fold_backbone,
            )

            # no preprocess fold: segment inputs match the bind-path stem
            self._seg_params, self._configs = fold_backbone(model, variables)
        else:
            self._seg_params = variables
        self.survivor_fractions: Optional[List[float]] = None
        self._seg_fns = {}
        self._fused_fns = {}

    # ------------------------------------------------------------------ #
    # segment functions                                                   #
    # ------------------------------------------------------------------ #

    def _head(self, emb, level: int):
        """(prediction [B] int32, confidence [B] f32) for one exit level.
        Exit fires when confidence > thresholds[level]."""
        emb = emb.astype(jnp.float32)
        if self.l2_normalize:
            emb = emb / jnp.maximum(
                jnp.linalg.norm(emb, axis=1, keepdims=True), 1e-12
            )
        if self.head_mode == "knn":
            # 1-NN cosine + reliability margin (sequential_inference.py
            # :483-508): reliable <=> every row within d_min/ratio shares
            # the best label <=> ratio * d_other_min - d_min > 0
            g = self.galleries[level]
            d = 2.0 - 2.0 * emb @ g.T  # [B, N]
            best = jnp.argmin(d, axis=1)
            d_min = jnp.take_along_axis(d, best[:, None], 1)[:, 0]
            y_best = jnp.take(self.gallery_labels, best)
            same = self.gallery_labels[None, :] == y_best[:, None]
            d_other = jnp.min(jnp.where(same, jnp.inf, d), axis=1)
            return y_best, self.ratio * d_other - d_min
        # baked Dense (sequential_inference.py:1350-1366)
        scores = emb @ self.coefs[level].T + self.intercepts[level]
        return (
            jnp.argmax(scores, axis=1).astype(jnp.int32),
            jnp.max(scores, axis=1),
        )

    def _trunk_impl(self, level: int, final: bool):
        """Pure fn(params, x) -> (h, emb): one backbone segment plus its
        exit-tap pooled embedding."""
        start, end = self.segments[level]

        if self.engine == "folded":
            from fast_image_recognition_tpu.models.inference import (
                folded_blocks,
                folded_head,
                folded_stem,
            )

            configs = self._configs
            act = configs[0].get("activation", "swish") if configs else "swish"

            def fn(params, x):
                if start == 0:
                    h = folded_stem(params, x.astype(jnp.bfloat16), activation=act)
                    h = folded_blocks(params, configs, h, 0, end)
                else:
                    h = folded_blocks(params, configs, x, start, end)
                if final:
                    emb = folded_head(params, h, activation=act)
                else:
                    emb = jnp.mean(h, axis=(1, 2), dtype=jnp.float32)
                return h, emb

            return fn

        model = self.model

        def fn(params, x):
            m = model.bind(params)
            if start == 0:
                x = m.stem(x.astype(m.dtype))
                h = m.run_blocks(x, 0, end)
            else:
                h = m.run_blocks(x, start, end)
            emb = m.head_pool(h) if final else jnp.mean(
                h, axis=(1, 2)
            ).astype(jnp.float32)
            return h, emb

        return fn

    def _segment_impl(self, level: int, final: bool):
        """Pure fn(params, x) -> (h, pred, conf); not jitted (predict_fused
        inlines several into one program, predict jits each)."""
        trunk = self._trunk_impl(level, final)

        def fn(params, x):
            h, emb = trunk(params, x)
            return (h,) + self._head(emb, level)

        return fn

    def level_embeddings(self, images) -> List[np.ndarray]:
        """Per-level pooled embeddings (L2-normalized if the pipeline
        normalizes) for the whole batch, no exits — the reference's
        embedding-cache pass (sequential_inference.py:823-886) used to
        build kNN galleries / train exit heads."""
        x = jnp.asarray(np.asarray(images, np.float32))
        out: List[np.ndarray] = []
        carry = x
        for level in range(self.num_levels):
            final = level == self.num_levels - 1
            key = ("emb", level)
            if key not in self._seg_fns:
                self._seg_fns[key] = jax.jit(self._trunk_impl(level, final))
            h, emb = self._seg_fns[key](self._seg_params, carry)
            emb = emb.astype(jnp.float32)
            if self.l2_normalize:
                emb = emb / jnp.maximum(
                    jnp.linalg.norm(emb, axis=1, keepdims=True), 1e-12
                )
            out.append(np.asarray(emb))
            carry = h
        return out

    def _get_seg(self, level: int):
        final = level == self.num_levels - 1
        if level not in self._seg_fns:
            self._seg_fns[level] = jax.jit(self._segment_impl(level, final))
        return self._seg_fns[level]

    # ------------------------------------------------------------------ #
    # calibration                                                         #
    # ------------------------------------------------------------------ #

    def calibrate(
        self, images, quantile: float = 0.5, tune: Optional[bool] = None
    ) -> List[float]:
        """Record the survivor fractions that size ``predict_fused``'s
        capacities, and (linear mode, or ``tune=True``) set per-level
        thresholds to the ``quantile`` of the confidence over the images
        still alive at that level (the reference FAR-tunes per level on
        held-out data, sequential_inference.py:609-631; this is the
        synthetic-workload analog). kNN mode defaults to ``tune=False``:
        its rule fires at the fixed margin 0 (reference :496-497), so only
        the fractions are measured."""
        if tune is None:
            tune = self.head_mode == "linear"
        x = jnp.asarray(np.asarray(images, np.float32))
        b = x.shape[0]
        alive = np.ones(b, dtype=bool)
        thresholds: List[float] = []
        fractions: List[float] = []
        carry = x
        for level in range(self.num_levels - 1):
            h, _, conf = self._get_seg(level)(self._seg_params, carry)
            conf = np.asarray(conf)
            if tune:
                t = (
                    float(np.quantile(conf[alive], quantile))
                    if alive.any()
                    else 0.0
                )
            else:
                t = float(self.thresholds[level])
            alive = alive & ~(conf > t)
            thresholds.append(t)
            fractions.append(float(alive.mean()))
            carry = h
        self.thresholds = thresholds
        self.survivor_fractions = fractions
        return thresholds

    def capacities_for(
        self, batch: int, slack: float = 1.3, multiple: int = 64
    ) -> Tuple[int, ...]:
        """Static per-level capacities from the calibrated survivor
        fractions: cap_l = roundup(batch * frac * slack). Level 0 is the
        full batch."""
        assert self.survivor_fractions is not None, "call calibrate() first"
        caps = [batch]
        for frac in self.survivor_fractions:
            c = _round_up(
                max(1, math.ceil(batch * frac * slack)), min(multiple, batch)
            )
            caps.append(min(batch, c))
        return tuple(caps)

    # ------------------------------------------------------------------ #
    # fused one-program cascade                                           #
    # ------------------------------------------------------------------ #

    def _build_fused(self, batch: int, caps: Tuple[int, ...]):
        impls = [
            self._segment_impl(l, l == self.num_levels - 1)
            for l in range(self.num_levels)
        ]
        thresholds = [float(t) for t in self.thresholds]
        num_levels = self.num_levels

        def fused(params, images):
            preds = jnp.zeros((batch,), jnp.int32)
            exit_level = jnp.zeros((batch,), jnp.int32)
            done = jnp.zeros((batch,), jnp.bool_)
            gidx = jnp.arange(batch, dtype=jnp.int32)
            carry = images
            forced = jnp.int32(0)
            for level in range(num_levels):
                h, lp, conf = impls[level](params, carry)
                live = ~done[gidx]  # padding rows never write
                fire = live if level == num_levels - 1 else (
                    (conf > thresholds[level]) & live
                )
                # provisional result for every live row; survivors that
                # continue get overwritten at their true exit level
                preds = preds.at[gidx].set(
                    jnp.where(live, lp, preds[gidx]), unique_indices=True
                )
                exit_level = exit_level.at[gidx].set(
                    jnp.where(live, level, exit_level[gidx]),
                    unique_indices=True,
                )
                done = done.at[gidx].set(done[gidx] | fire, unique_indices=True)
                if level == num_levels - 1:
                    break
                surv = live & ~fire
                c_next = min(caps[level + 1], int(gidx.shape[0]))
                # device-side compaction: least-confident survivors first;
                # overflow (closest to threshold) force-exits at this level
                order = jnp.argsort(jnp.where(surv, conf, jnp.inf))[:c_next]
                forced = forced + jnp.maximum(
                    jnp.sum(surv).astype(jnp.int32) - c_next, 0
                )
                gidx = gidx[order]
                carry = jnp.take(h, order, axis=0)
            # pack [preds | exit_level | forced] so the host needs exactly
            # ONE transfer per batch (each fetch is its own RPC round-trip
            # on a tunneled device)
            return jnp.concatenate(
                [preds, exit_level, forced[None]], axis=0
            )

        return jax.jit(fused)

    def predict_fused(
        self,
        images,
        capacities: Optional[Sequence[int]] = None,
        slack: float = 1.3,
    ) -> PipelineResult:
        """Whole-cascade single-dispatch inference (zero per-level host
        syncs). Requires calibrated thresholds + survivor fractions (or
        explicit ``capacities``, one per level, capacities[0] ignored)."""
        x = images if isinstance(images, jax.Array) else jnp.asarray(
            np.asarray(images, np.float32)
        )
        b = int(x.shape[0])
        caps = (
            tuple(capacities) if capacities is not None
            else self.capacities_for(b, slack=slack)
        )
        # thresholds are baked into the compiled program as constants — they
        # must key the cache or recalibration would silently reuse stale ones
        key = (b, caps, x.shape[1:], tuple(float(t) for t in self.thresholds))
        if key not in self._fused_fns:
            self._fused_fns[key] = self._build_fused(b, caps)
        t0 = time.perf_counter()
        packed = np.asarray(
            self._fused_fns[key](self._seg_params, x)
        )  # the one transfer
        elapsed = time.perf_counter() - t0
        preds, exit_level = packed[:b], packed[b : 2 * b]
        forced = int(packed[2 * b])
        counts = np.bincount(exit_level, minlength=self.num_levels) / b
        return PipelineResult(
            predictions=preds.astype(np.int64),
            exit_level=exit_level.astype(np.int64),
            break_counts=counts,
            ms_per_image=1000.0 * elapsed / b,
            forced_fraction=forced / b,
        )

    # ------------------------------------------------------------------ #
    # level-major pooled cascade (cross-batch compaction)                 #
    # ------------------------------------------------------------------ #

    def predict_pooled(
        self, images, bucket: int = 1024, warmup: bool = False,
        streams: int = 1,
    ) -> PipelineResult:
        """Level-major sequential inference over an image POOL.

        ``predict_fused`` sizes each level at calibrated capacity + slack
        PER BATCH — the slack lanes and the 64-row rounding are pure waste,
        and overflow force-exits. Here the whole pool runs level by level:
        all alive images are compacted ACROSS the pool into always-full
        ``bucket``-row dispatches, so lane waste is < bucket/n_alive per
        level, no image is ever force-exited, and the exit decisions are
        exactly ``predict``'s sequential semantics. Host traffic is ONE
        [2, n_alive] fetch per LEVEL per pool (vs per batch) — the
        production serving shape when requests can be pooled; activations
        for the full alive set stay device-resident between levels (size
        the pool to HBM: level-0 output dominates at ~H*W*C per image).

        ``streams > 1`` splits the pool into independent sub-pools that
        advance through the levels as an EVENT LOOP: each stream, on its
        turn, blocks on its own pending fetch, compacts, and immediately
        dispatches its NEXT level before any other stream is touched — so
        one stream's link round-trip can overlap the others' dispatched
        device work. Exit decisions are unchanged (streams partition the
        pool; decisions are per-image; a level-synchronous barrier has no
        semantic role).

        Measured honesty (r5, digits@32 pool 4096 on the tunneled v5e):
        streams 1/2/4 = 19.5k / 20.9k / 18.2k img/s — NO material win,
        because the tunnel serializes device->host transfers in its
        client (``copy_to_host_async`` does not start an overlapping
        transfer there), so the per-level RTT floor stands. On such
        links ``predict_fused`` is the answer (518k img/s on the same
        workload, one transfer per pool); ``streams`` ships for
        direct-attached devices where async copies actually overlap.

        Reference semantics: sequential_inference.py:1368-1394, with the
        compaction amortized over the pool instead of per image."""
        import jax

        x = images if isinstance(images, jax.Array) else jnp.asarray(
            np.asarray(images, np.float32)
        )
        n = int(x.shape[0])
        preds = np.zeros(n, dtype=np.int64)
        exit_level = np.full(n, self.num_levels - 1, dtype=np.int64)
        if warmup:  # compile every (level, n_pad) program untimed
            self.predict_pooled(
                images, bucket=bucket, warmup=False, streams=streams
            )

        streams = max(1, min(int(streams), max(1, n // bucket)))
        bounds = [n * s // streams for s in range(streams + 1)]
        states = [
            {
                "alive": np.arange(bounds[s], bounds[s + 1]),
                "carry": x[bounds[s] : bounds[s + 1]],
                "level": 0,
            }
            for s in range(streams)
        ]

        def dispatch(st):
            """Queue one stream's next-level buckets + async host copy."""
            seg = self._get_seg(st["level"])
            carry = st["carry"]
            n_alive = len(st["alive"])
            # fixed [bucket]-row dispatch shape: one compile per level,
            # tail waste < bucket rows per level per stream
            n_pad = _round_up(max(n_alive, 1), bucket)
            if int(carry.shape[0]) != n_pad:
                pad = jnp.zeros(
                    (n_pad - int(carry.shape[0]),) + tuple(carry.shape[1:]),
                    carry.dtype,
                )
                carry = jnp.concatenate([carry, pad], axis=0)
            hs, out_rows = [], []
            for s in range(0, n_pad, bucket):
                h, lp, cf = seg(self._seg_params, carry[s : s + bucket])
                hs.append(h)
                out_rows.append(
                    jnp.stack([lp.astype(jnp.float32), cf], axis=0)
                )
            st["hs"] = hs
            st["packed_dev"] = jnp.concatenate(out_rows, axis=1)
            try:  # start the device->host copy without blocking
                st["packed_dev"].copy_to_host_async()
            except (AttributeError, NotImplementedError):
                pass

        t0 = time.perf_counter()
        active = [st for st in states if len(st["alive"])]
        for st in active:
            dispatch(st)
        while active:
            for st in list(active):
                level = st["level"]
                final = level == self.num_levels - 1
                alive = st["alive"]
                n_alive = len(alive)
                # blocks on THIS stream only; other streams' dispatched
                # levels keep the device busy through this round trip
                packed = np.asarray(st.pop("packed_dev"))
                hs = st.pop("hs")
                level_pred = packed[0, :n_alive].astype(np.int64)
                conf = packed[1, :n_alive]
                fire = (
                    np.ones(n_alive, dtype=bool)
                    if final
                    else conf > self.thresholds[level]
                )
                preds[alive[fire]] = level_pred[fire]
                exit_level[alive[fire]] = level
                keep = np.nonzero(~fire)[0]
                st["alive"] = alive[keep]
                if final or not len(keep):
                    st["carry"] = None
                    active.remove(st)
                    continue
                h_all = hs[0] if len(hs) == 1 else jnp.concatenate(hs, axis=0)
                st["carry"] = jnp.take(h_all, jnp.asarray(keep), axis=0)
                st["level"] = level + 1
                dispatch(st)  # next level queued BEFORE other streams fetch
        elapsed = time.perf_counter() - t0

        counts = np.bincount(exit_level, minlength=self.num_levels) / n
        return PipelineResult(
            predictions=preds,
            exit_level=exit_level,
            break_counts=counts,
            ms_per_image=1000.0 * elapsed / n,
        )

    # ------------------------------------------------------------------ #
    # host-compaction cascade (exact sequential semantics)                #
    # ------------------------------------------------------------------ #

    def predict(self, images: np.ndarray, warmup: bool = False) -> PipelineResult:
        """Sequential inference with host-decided batch compaction.

        Activations never leave the device: after each segment only the
        small [n, C] score matrix crosses to the host (which decides who
        exits), and survivors are gathered on-device with ``jnp.take``
        into the next bucket shape."""
        b = images.shape[0]
        preds = np.zeros(b, dtype=np.int64)
        exit_level = np.full(b, self.num_levels - 1, dtype=np.int64)
        # accept a device-resident batch (serving path: upload once, predict
        # many) — only convert when handed host data
        x = images if isinstance(images, jax.Array) else np.asarray(
            images, np.float32
        )

        t0 = time.perf_counter()
        max_b = self.buckets[-1]
        for s in range(0, b, max_b):
            gidx = np.arange(s, min(s + max_b, b))
            chunk = x[s : s + max_b]
            bucket = _bucket(len(gidx), self.buckets)
            if chunk.shape[0] < bucket:
                pad = jnp.zeros(
                    (bucket - chunk.shape[0],) + chunk.shape[1:], chunk.dtype
                )
                chunk = jnp.concatenate([jnp.asarray(chunk), pad], axis=0)
            carry = jnp.asarray(chunk)  # device-resident from here on
            for level in range(self.num_levels):
                h, lp, cf = self._get_seg(level)(self._seg_params, carry)
                # the ONLY transfers: [n] predictions + [n] confidences
                level_pred = np.asarray(lp)[: len(gidx)]
                conf = np.asarray(cf)[: len(gidx)]
                if level == self.num_levels - 1:
                    fire = np.ones(len(gidx), dtype=bool)
                else:
                    fire = conf > self.thresholds[level]
                preds[gidx[fire]] = level_pred[fire]
                exit_level[gidx[fire]] = level
                keep = ~fire
                if not keep.any() or level == self.num_levels - 1:
                    break
                keep_idx = np.nonzero(keep)[0]
                gidx = gidx[keep]
                new_bucket = _bucket(len(keep_idx), self.buckets)
                take = np.zeros(new_bucket, np.int64)
                take[: len(keep_idx)] = keep_idx
                carry = jnp.take(h, jnp.asarray(take), axis=0)
        elapsed = time.perf_counter() - t0

        counts = np.bincount(exit_level, minlength=self.num_levels) / b
        return PipelineResult(
            predictions=preds,
            exit_level=exit_level,
            break_counts=counts,
            ms_per_image=1000.0 * elapsed / b,
        )

    def measure_segment_latency(
        self, images: np.ndarray, iters: int = 5
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Per-level and cumulative latency of the chained segments — the
        ``test_functions`` probe (sequential_inference.py:1252-1275,
        :888-896 cumulative per-level inference times). Timing queues
        ``iters`` dispatches per segment and fetches once (the TPU tunnel's
        block_until_ready is a no-op)."""
        x = np.asarray(images, np.float32)
        bucket = _bucket(x.shape[0], self.buckets)
        if x.shape[0] < bucket:
            x = np.concatenate(
                [x, np.zeros((bucket - x.shape[0],) + x.shape[1:], x.dtype)]
            )
        per_level = []
        carry = jnp.asarray(x)
        for level in range(self.num_levels):
            fn = self._get_seg(level)
            h, pred, _conf = fn(self._seg_params, carry)  # compile + warm
            _ = np.asarray(pred)
            t0 = time.perf_counter()
            out = None
            for _ in range(iters):
                out = fn(self._seg_params, carry)
            _ = np.asarray(out[1])
            per_level.append(
                1000.0 * (time.perf_counter() - t0) / (iters * images.shape[0])
            )
            carry = h
        per_level = np.asarray(per_level)
        return per_level, np.cumsum(per_level)
