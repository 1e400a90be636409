"""End-to-end sequential (early-exit) inference over backbone segments.

Reference: the "proposed pipeline" of tf_keras/sequential_inference.py
:1278-1396 — trained LinearSVC weights are baked into Dense layers appended
to each exit tap after L2 normalization (:1350-1366), and true sequential
inference runs the backbone *segment by segment*, stopping each image at the
first exit whose max score clears the threshold (:1368-1394).

TPU design: early exit conflicts with lockstep batching (SURVEY.md §7 hard
part 3), so the engine uses **batch compaction**: after each segment, probes
that exited are removed on the host and the surviving subset — padded to a
small set of static bucket sizes to bound recompilation — continues into the
next segment. Easy images really do stop paying FLOPs at cheap levels, and
every segment call stays a statically-shaped jitted computation.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np



def _bucket(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


@dataclasses.dataclass
class PipelineResult:
    predictions: np.ndarray
    exit_level: np.ndarray
    break_counts: np.ndarray
    ms_per_image: float


class SequentialInferencePipeline:
    """Backbone segments + baked linear exit heads + batch compaction."""

    def __init__(
        self,
        model,
        variables,
        taps: Sequence[str],
        coefs: Sequence[np.ndarray],  # per level [C, F_l] (+ final)
        intercepts: Sequence[np.ndarray],
        thresholds: Sequence[float],  # per non-final level
        buckets: Sequence[int] = (32, 128, 512),
        l2_normalize: bool = True,
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
        assert len(coefs) == self.num_levels
        self.coefs = [jnp.asarray(c, jnp.float32) for c in coefs]
        self.intercepts = [jnp.asarray(b, jnp.float32) for b in intercepts]
        self.thresholds = list(thresholds)
        self.buckets = sorted(buckets)
        self.l2_normalize = l2_normalize
        self._seg_fns = {}

    def _segment_fn(self, level: int, final: bool):
        start, end = self.segments[level]
        coef, intercept = self.coefs[level], self.intercepts[level]
        model = self.model
        l2 = self.l2_normalize

        def fn(variables, x):
            m = model.bind(variables)
            if start == 0:
                x = m.stem(x.astype(m.dtype))
                h = m.run_blocks(x, 0, end)
            else:
                h = m.run_blocks(x, start, end)
            if final:
                emb = m.head_pool(h)
            else:
                emb = jnp.mean(h, axis=(1, 2)).astype(jnp.float32)
            if l2:
                emb = emb / jnp.maximum(
                    jnp.linalg.norm(emb, axis=1, keepdims=True), 1e-12
                )
            scores = emb @ coef.T + intercept  # baked Dense (:1350-1366)
            return h, scores

        return jax.jit(fn)

    def _get_seg(self, level: int):
        final = level == self.num_levels - 1
        if level not in self._seg_fns:
            self._seg_fns[level] = self._segment_fn(level, final)
        return self._seg_fns[level]

    def predict(self, images: np.ndarray, warmup: bool = False) -> PipelineResult:
        """Sequential inference with DEVICE-side batch compaction.

        Activations never leave the device: after each segment only the
        small [n, C] score matrix crosses to the host (which decides who
        exits), and survivors are gathered on-device with ``jnp.take``
        into the next bucket shape. The original host-compaction variant
        shipped the full [n, H, W, C] carry back and forth per level —
        tens of MB per transfer, which dominated wall-clock over a
        host<->device link."""
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
                h, scores = self._get_seg(level)(self.variables, carry)
                sc = np.asarray(scores)[: len(gidx)]  # the ONLY transfer
                level_pred = sc.argmax(axis=1)
                if level == self.num_levels - 1:
                    fire = np.ones(len(gidx), dtype=bool)
                else:
                    fire = sc.max(axis=1) > self.thresholds[level]
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
            h, scores = fn(self.variables, carry)  # compile + warm
            _ = np.asarray(scores)
            t0 = time.perf_counter()
            out = None
            for _ in range(iters):
                out = fn(self.variables, carry)
            _ = np.asarray(out[1])
            per_level.append(
                1000.0 * (time.perf_counter() - t0) / (iters * images.shape[0])
            )
            carry = h
        per_level = np.asarray(per_level)
        return per_level, np.cumsum(per_level)
