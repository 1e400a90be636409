"""Video (YTF-style) frame-set recognition.

Reference: qt_cpp/video.cpp:156-267 —
- intersect the still-image gallery identities with the video identities
  (set_intersection / set_symmetric_difference, :182-210);
- probes = every 10th frame of each video, classified independently
  (:219-224);
- run BruteForce / SVM / DEM over check-budget ratios 0.1..0.7 (:243-264).

TPU extension (BASELINE.json config 5): fused per-video aggregation — all
sampled frames of a video are matched in one batch and their per-frame
evidence is reduced per video on device: min-distance vote, majority vote,
or summed log-posteriors over classes (softmax of -distances, the
maximum-likelihood frame fusion the per-frame loop approximates).
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from fast_image_recognition_tpu.data.feature_io import FeatureDB
from fast_image_recognition_tpu.data.video_io import VideoDB
from fast_image_recognition_tpu.ops.distances import pairwise_distances


@dataclasses.dataclass
class IdentityIntersection:
    """Common person set with BOTH sides remapped into one class-id space
    (the reference remaps both through person2indexMapNew,
    video.cpp:212-236) — callers must never mix old and new label ids."""

    gallery_mask: np.ndarray  # [N] stills belonging to common identities
    video_mask: np.ndarray  # [V] videos belonging to common identities
    new_id: Dict[str, int]  # common person name -> new class id
    gallery_labels: np.ndarray  # [N] new ids (-1 where masked)
    video_labels: np.ndarray  # [V] new ids (-1 where masked)

    @property
    def num_classes(self) -> int:
        return len(self.new_id)


def intersect_identities(db: FeatureDB, videos: VideoDB) -> IdentityIntersection:
    """Mirrors video.cpp:182-210 (set_intersection over sorted names)."""
    common = sorted(set(db.class_names) & set(videos.person_names))
    new_id = {name: i for i, name in enumerate(common)}
    g_old_to_new = np.asarray(
        [new_id.get(name, -1) for name in db.class_names], np.int64
    )
    v_old_to_new = np.asarray(
        [new_id.get(name, -1) for name in videos.person_names], np.int64
    )
    g_labels = g_old_to_new[db.labels]
    v_labels = v_old_to_new[videos.video_person]
    return IdentityIntersection(
        gallery_mask=g_labels >= 0,
        video_mask=v_labels >= 0,
        new_id=new_id,
        gallery_labels=g_labels,
        video_labels=v_labels,
    )


def sample_probe_frames(videos: VideoDB, step: int = 10) -> np.ndarray:
    """Every ``step``-th frame of each video (video.cpp:219)."""
    idx = []
    for v in range(videos.num_videos):
        frames = np.flatnonzero(videos.frame_video == v)
        idx.extend(frames[::step].tolist())
    return np.asarray(idx, np.int64)


@dataclasses.dataclass
class VideoEvalResult:
    frame_error: float  # per-frame error % (the reference's metric)
    video_error: float  # per-video error % after aggregation
    ms_per_frame: float
    aggregation: str


def _aggregate(
    frame_dists: np.ndarray,  # [F] best distance per probe frame
    frame_pred: np.ndarray,  # [F] predicted class per probe frame
    frame_video: np.ndarray,  # [F] video id
    num_classes: int,
    num_videos: int,
    mode: str,
) -> np.ndarray:
    """Per-video decision from per-frame evidence."""
    preds = np.zeros(num_videos, dtype=np.int64)
    for v in range(num_videos):
        mask = frame_video == v
        if not mask.any():
            preds[v] = -1
            continue
        if mode == "min_distance":
            preds[v] = frame_pred[mask][np.argmin(frame_dists[mask])]
        elif mode == "majority":
            preds[v] = np.bincount(frame_pred[mask], minlength=num_classes).argmax()
        else:
            raise ValueError(mode)
    return preds


def make_video_fusion_fn(
    gallery: np.ndarray,  # [N, D]
    gallery_labels: np.ndarray,
    num_classes: int,
    num_videos: int,
    dist_weight: float = 100.0,
):
    """Build the jitted per-video fusion step with the gallery device-put
    ONCE — the serving path dispatches it per frame-batch with no host
    round-trips or re-uploads (predictions stay on device until the caller
    fetches).

    Returns ``fn(probes, frame_video) -> [num_videos] device array`` of
    per-video argmax class ids."""
    g = jax.device_put(jnp.asarray(gallery, jnp.float32))
    gl = jax.device_put(jnp.asarray(gallery_labels))

    # g/gl are threaded as jit ARGUMENTS: a closure-captured device array
    # is baked into the lowered HLO as a literal, which re-serializes the
    # gallery into the compile payload (and the tunneled remote-compile
    # endpoint rejects gallery-sized bodies outright — HTTP 413).
    @jax.jit
    def fn(g, gl, probes, frame_video):
        d = pairwise_distances(probes.astype(jnp.float32), g)
        b = d.shape[0]
        cmin = jnp.full((b, num_classes), 1e30)
        cmin = cmin.at[jnp.arange(b)[:, None], gl[None, :]].min(d)
        logits = -dist_weight * cmin
        logp = jax.nn.log_softmax(logits, axis=1)  # [F, C]
        video_logp = jax.ops.segment_sum(
            logp, frame_video, num_segments=num_videos
        )
        return jnp.argmax(video_logp, axis=1)

    return lambda probes, frame_video: fn(g, gl, probes, frame_video)


def video_log_posterior_fusion(
    probes: np.ndarray,  # [F, D] sampled frames
    gallery: np.ndarray,  # [N, D]
    gallery_labels: np.ndarray,
    frame_video: np.ndarray,  # [F]
    num_classes: int,
    num_videos: int,
    dist_weight: float = 100.0,
) -> np.ndarray:
    """Fused aggregation: per-frame class log-posteriors (softmax over
    -w*min-class-distance, the exp(-100 d) posterior model of
    ImageTesting.cpp:119) summed per video in one segment reduction.

    One-shot convenience wrapper; loops should build
    ``make_video_fusion_fn`` once and dispatch it."""
    fn = make_video_fusion_fn(
        gallery, gallery_labels, num_classes, num_videos, dist_weight
    )
    return np.asarray(fn(jnp.asarray(probes), jnp.asarray(frame_video)))


def evaluate_video_recognition(
    matcher,
    gallery_labels: np.ndarray,
    videos: VideoDB,
    video_labels: np.ndarray,  # [V] class id per kept video
    probe_frames_idx: np.ndarray,
    num_classes: int,
    aggregation: str = "min_distance",
    batch_size: int = 1024,
) -> VideoEvalResult:
    """Frame-level recognition (reference metric) + per-video fusion."""
    import time

    probes = videos.frames[probe_frames_idx]
    frame_video = videos.frame_video[probe_frames_idx]
    frame_truth = video_labels[frame_video]

    t0 = time.perf_counter()
    preds = np.full(len(probes), -1, dtype=np.int64)
    dists = np.full(len(probes), np.inf)
    for s in range(0, len(probes), batch_size):
        res = matcher.search(probes[s : s + batch_size])
        ok = res.indices >= 0
        preds[s : s + batch_size][ok] = gallery_labels[res.indices[ok]]
        dists[s : s + batch_size] = res.distances
    elapsed = time.perf_counter() - t0

    frame_error = 100.0 * (preds != frame_truth).mean()
    video_pred = _aggregate(
        dists, preds, frame_video, num_classes, videos.num_videos, aggregation
    )
    valid = np.asarray(
        [np.any(frame_video == v) for v in range(videos.num_videos)]
    )
    video_error = 100.0 * (video_pred[valid] != video_labels[valid]).mean()
    return VideoEvalResult(
        frame_error=float(frame_error),
        video_error=float(video_error),
        ms_per_frame=1000.0 * elapsed / max(len(probes), 1),
        aggregation=aggregation,
    )
