"""Three-way-decision (TWD) sequential classifiers.

Reference: qt_cpp/ImageTesting.cpp:74-288.

- ``ConventionalTWD`` (ImageTesting.cpp:74-186): stage 1 computes distances
  on the first ``reduced_features_count`` dims; a reliability test (by type:
  posterior ratio / distance difference / distance ratio) decides whether to
  REFINE by extending the distances to 256 dims, reusing the stage-1 partial
  sums (165-180).
- ``ProposedTWD`` (ImageTesting.cpp:188-288, the paper's granular-computing
  method): grow the feature prefix in chunks, accumulate per-instance
  partial distances, prune instances whose running distance exceeds
  ``best / theta`` each round, stop when a single class remains.

TPU design: everything is batched over probes. Stage masks replace the
per-image ``break``; the prefix loop is a ``lax.scan`` over static feature
chunks carrying (accumulated distances, active mask, done mask). Chunk
distances ride the MXU via the windowed distance expansion; layout the
gallery as-is ([N, D]) since windows are contiguous lanes.

One deliberate deviation: the reference's ``secondBestDist`` only updates
when a new best appears during its scan (ImageTesting.cpp:123-127), so it
can be stale depending on gallery order. Here second-best is the true min
distance over instances of any class other than the best class — the
order-independent semantics the reliability tests intend.
"""

from __future__ import annotations

import dataclasses
import enum
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fast_image_recognition_tpu.config import DistanceKind
from fast_image_recognition_tpu.ops.distances import pairwise_distances

BIG = 1e30


class TWDType(str, enum.Enum):
    POSTERIORS = "posteriors"  # ImageTesting.cpp:139-156
    DIST_DIFF = "diff"  # :157-159
    DIST_RATIO = "ratio"  # :161-163


def _class_min(d: jax.Array, labels: jax.Array, num_classes: int) -> jax.Array:
    """Per-class min distance: [B, N] x [N] -> [B, C]."""
    b = d.shape[0]
    out = jnp.full((b, num_classes), BIG, dtype=d.dtype)
    return out.at[jnp.arange(b)[:, None], labels[None, :]].min(d)


@partial(
    jax.jit,
    static_argnames=(
        "num_classes",
        "reduced",
        "twd_type",
        "kind",
        "top_probabs",
    ),
)
def _twd_stage1(
    queries: jax.Array,
    gallery: jax.Array,
    labels: jax.Array,
    num_classes: int,
    reduced: int,
    threshold: float,
    twd_type: TWDType,
    kind: DistanceKind,
    top_probabs: int = 5,
    dist_weight: float = 100.0,
):
    """Stage-1 distances on the reduced prefix + reliability decision.
    Returns (d1 [B, N] — kept on device for refine reuse, best_idx, reliable)."""
    d1 = pairwise_distances(queries, gallery, 0, reduced, kind)  # [B, N]
    best_idx = jnp.argmin(d1, axis=1)
    best_dist = jnp.take_along_axis(d1, best_idx[:, None], 1)[:, 0]
    best_class = jnp.take(labels, best_idx)

    cmin = _class_min(d1, labels, num_classes)  # [B, C]
    other = cmin.at[jnp.arange(cmin.shape[0]), best_class].set(BIG)
    second_dist = jnp.min(other, axis=1)

    if twd_type == TWDType.POSTERIORS:
        probabs = jnp.exp(-cmin * dist_weight)  # exp(-100*d), :119
        top = jax.lax.top_k(probabs, min(top_probabs, num_classes))[0]
        max_probab = jnp.exp(-best_dist * dist_weight) / jnp.sum(top, axis=1)
        reliable = max_probab > threshold
    elif twd_type == TWDType.DIST_DIFF:
        reliable = (second_dist - best_dist) > threshold
    else:
        reliable = (best_dist / second_dist) < threshold
    return d1, best_idx.astype(jnp.int32), reliable


@partial(jax.jit, static_argnames=("reduced", "refine_to", "kind"))
def _twd_refine(
    queries: jax.Array,  # [U, D] — the compacted unreliable subset only
    d1: jax.Array,  # [U, N] stage-1 window means for that subset
    gallery: jax.Array,
    reduced: int,
    refine_to: int,
    kind: DistanceKind,
):
    """Refinement reusing stage-1 sums (ImageTesting.cpp:165-180). Runs on
    the host-compacted unreliable probes only, so refine FLOPs scale with
    the unreliable fraction (the TWD's compute-saving premise) instead of
    the whole batch."""
    d_delta = pairwise_distances(queries, gallery, reduced, refine_to, kind)
    d2 = (d1 * reduced + d_delta * (refine_to - reduced)) / refine_to
    return jnp.argmin(d2, axis=1).astype(jnp.int32)


def _pow2_bucket(n: int, lo: int = 8) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


@dataclasses.dataclass
class ConventionalTWD:
    """name format mirrors ImageTesting.cpp:90-106 printouts."""

    gallery: np.ndarray
    labels: np.ndarray
    num_classes: int
    twd_type: TWDType
    threshold: float
    reduced_features: int = 64
    refine_to: int = 256
    kind: DistanceKind = DistanceKind.L2

    def __post_init__(self):
        prefix = {
            TWDType.POSTERIORS: "TWD posteriors",
            TWDType.DIST_DIFF: "TWD diff",
            TWDType.DIST_RATIO: "TWD ratio",
        }[self.twd_type]
        self.name = f"{prefix}, {self.threshold}"
        self._g = jax.device_put(jnp.asarray(self.gallery, jnp.float32))
        self._l = jax.device_put(jnp.asarray(self.labels, jnp.int32))
        self._unreliable = 0

    def reset_counters(self):
        self._unreliable = 0

    @property
    def unreliable_count(self) -> int:
        return self._unreliable

    def predict(self, queries: np.ndarray) -> np.ndarray:
        q = jnp.asarray(queries, jnp.float32)
        d1, best_idx, reliable = _twd_stage1(
            q,
            self._g,
            self._l,
            self.num_classes,
            self.reduced_features,
            self.threshold,
            self.twd_type,
            self.kind,
        )
        reliable_np = np.asarray(reliable)
        final_idx = np.asarray(best_idx).copy()
        unrel = np.flatnonzero(~reliable_np)
        if unrel.size:
            # batch-compact the unreliable probes (padded to a power-of-2
            # bucket to bound recompilation), refine only those
            bucket = min(_pow2_bucket(unrel.size), int(q.shape[0]))
            sel = np.resize(unrel, bucket)
            sel_j = jnp.asarray(sel, jnp.int32)
            refined = _twd_refine(
                jnp.take(q, sel_j, axis=0),
                jnp.take(d1, sel_j, axis=0),
                self._g,
                self.reduced_features,
                self.refine_to,
                self.kind,
            )
            final_idx[unrel] = np.asarray(refined)[: unrel.size]
        self._unreliable += int(unrel.size)
        return np.asarray(self.labels)[final_idx]


@partial(
    jax.jit,
    static_argnames=("num_classes", "chunk", "max_features", "kind", "granularity"),
)
def _proposed_twd(
    queries: jax.Array,
    gallery: jax.Array,
    labels: jax.Array,
    num_classes: int,
    chunk: int,
    max_features: int,
    inv_theta: float,  # reference stores threshold = 1/theta (:191)
    kind: DistanceKind,
    granularity: str,  # 'instance' (CHECK_ALL_INSTANCES) or 'class'
):
    b = queries.shape[0]
    n = gallery.shape[0]
    n_chunks = max_features // chunk

    # Unrolled over chunks (n_chunks is small & static: 256/32 = 8 rounds),
    # letting XLA fuse each round's window distance + mask update.
    dist = jnp.zeros((b, n), dtype=jnp.float32)
    active = jnp.ones((b, n), dtype=bool)
    done = jnp.zeros((b,), dtype=bool)
    best_idx = jnp.zeros((b,), dtype=jnp.int32)
    needed_round2 = jnp.zeros((b,), dtype=bool)

    for ci in range(n_chunks):
        start = ci * chunk
        d_chunk = pairwise_distances(queries, gallery, start, start + chunk, kind)
        # accumulate chunk-mean distances (the reference adds the normalized
        # window distance each round, ImageTesting.cpp:243)
        dist = dist + jnp.where(done[:, None], 0.0, d_chunk)

        masked = jnp.where(active, dist, BIG)
        round_best_idx = jnp.argmin(masked, axis=1).astype(jnp.int32)
        round_best = jnp.take_along_axis(masked, round_best_idx[:, None], 1)[:, 0]
        best_idx = jnp.where(done, best_idx, round_best_idx)

        thresh = round_best * inv_theta
        if granularity == "instance":
            keep = masked <= thresh[:, None]
            best_class = jnp.take(labels, best_idx)
            other_alive = keep & (labels[None, :] != best_class[:, None])
            num_variants = 1 + jnp.sum(other_alive, axis=1)
        else:
            cmin = _class_min(masked, labels, num_classes)
            keep_class = cmin <= thresh[:, None]
            num_variants = jnp.sum(keep_class, axis=1)
            keep = jnp.take(keep_class, labels, axis=1)
        new_active = active & keep
        round_done = num_variants == 1
        if ci == 0:
            needed_round2 = ~round_done
        active = jnp.where(done[:, None], active, new_active)
        done = done | round_done

    return jnp.take(labels, best_idx), needed_round2, best_idx


@dataclasses.dataclass
class ProposedTWD:
    """'Proposed TWD, <chunk>, <1/theta>' (ImageTesting.cpp:201-205)."""

    gallery: np.ndarray
    labels: np.ndarray
    num_classes: int
    chunk_features: int = 32
    theta: float = 0.7
    max_features: int = 256
    kind: DistanceKind = DistanceKind.L2
    granularity: str = "instance"  # CHECK_ALL_INSTANCES default (:206)

    def __post_init__(self):
        self.name = f"Proposed TWD, {self.chunk_features}, {1.0 / self.theta}"
        self._g = jax.device_put(jnp.asarray(self.gallery, jnp.float32))
        self._l = jax.device_put(jnp.asarray(self.labels, jnp.int32))
        self._unreliable = 0

    def reset_counters(self):
        self._unreliable = 0

    @property
    def unreliable_count(self) -> int:
        return self._unreliable

    def predict(self, queries: np.ndarray) -> np.ndarray:
        preds, needed2, _ = _proposed_twd(
            jnp.asarray(queries, jnp.float32),
            self._g,
            self._l,
            self.num_classes,
            self.chunk_features,
            self.max_features,
            1.0 / self.theta,
            self.kind,
            self.granularity,
        )
        self._unreliable += int(np.asarray(needed2).sum())
        return np.asarray(preds)


# ---------------------------------------------------------------------------
# NumPy oracle — scalar-faithful to ImageTesting.cpp for parity tests
# ---------------------------------------------------------------------------

def proposed_twd_oracle(
    query: np.ndarray,
    gallery: np.ndarray,
    labels: np.ndarray,
    chunk: int,
    theta: float,
    max_features: int = 256,
) -> Tuple[int, bool]:
    """ImageTesting.cpp:207-288 (CHECK_ALL_INSTANCES), one probe.
    Returns (predicted class, needed_more_than_one_round)."""
    from fast_image_recognition_tpu.ops.distances import oracle_pairwise

    n = gallery.shape[0]
    inv_theta = 1.0 / theta
    distances = np.zeros(n)
    check = np.ones(n, dtype=bool)
    best_ind = -1
    needed2 = False
    for cur in range(0, max_features, chunk):
        best_dist = BIG
        d_chunk = oracle_pairwise(query[None], gallery, cur, cur + chunk)[0]
        for j in range(n):
            if not check[j]:
                continue
            distances[j] += d_chunk[j]
            if distances[j] < best_dist:
                best_dist = distances[j]
                best_ind = j
        num_variants = 1
        best_class = labels[best_ind]
        dist_threshold = best_dist * inv_theta
        for j in range(n):
            if check[j]:
                if distances[j] > dist_threshold:
                    check[j] = False
                elif labels[j] != best_class:
                    num_variants += 1
        if num_variants == 1:
            break
        if cur == 0:
            needed2 = True
    return int(labels[best_ind]), needed2
