"""Directed Enumeration Method (DEM) — maximum-likelihood approximate NN.

Reference: qt_cpp/ann.h:61-100, qt_cpp/ann.cpp:269-507 (the repo's signature
algorithm). Both compile-time variants are implemented:
``DirectedEnumerationMatcher`` is PIVOT mode (the compiled-in default,
ann.cpp:270); ``FullMatrixDEM`` is the non-PIVOT full-matrix variant
(ann.cpp:283-300, 474-499) with likelihood refinement after every probe.

Reference semantics (PIVOT mode):
- Build: N_p = max(5, 0.015*N) pivots (capped at 32, ann.cpp:332-333,
  371-379); the first pivot is random, each next is the gallery row
  maximizing the summed distance to all previous pivots (ann.cpp:302-331);
  P_matrix[p, n] = distance(pivot_p, row_n); the early-exit threshold is the
  FAR quantile of each pivot's min distance to another-class row
  (ann.cpp:327, 340-342, 84-93).
- Query: probe the pivots (each updates best-so-far and may early-exit,
  ann.cpp:441-462); accumulate likelihoods L[n] = sum_p (d(q, p) -
  P_matrix[p, n])^2; sort the remaining rows by likelihood (ann.cpp:469-470)
  and probe them *in that order* until bestDistance < threshold or the probe
  budget ``imageCountToCheck`` is exhausted (ann.cpp:472-501; with PIVOT,
  TRIALS = dbSize - start_index so the loop degenerates to one-by-one probes
  in likelihood order — there is no further likelihood refinement).

TPU-native formulation: the likelihood is one MXU matmul —
``L = |d_qp|^2 - 2 d_qp @ P + |P|^2`` per column — the probe order is an
argsort, and the sequential early-exit is a cumulative-min scan over
distances in probe order. The result (prediction AND probes-checked count)
is semantically equivalent to the reference's probe sequence — identical up
to fp32 likelihood near-ties, which can reorder adjacent probes — while
running fully batched. The returned ``checked_fraction`` preserves the reference's
``distanceCalcCount / N`` accounting (ann.cpp:505).

Note on compute: on the MXU a full [B, N] distance matrix is one matmul, so
this implementation computes all candidate distances and *selects* what the
sequential algorithm would have probed. The accuracy/%checked trade-off
(what the reference's experiments measure) is exactly preserved; wall-clock
savings on TPU come instead from the budget-limited gather variant
(``probe_mode='gather'``) when budget << N.

Measured crossover vs the fused brute-force kernel (TPU v5e, D=1536,
class-clustered galleries, benchmarks/ann_crossover_r3.jsonl, 0% label
error at every point — the early exit stops after ~0.003-0.03% of the
gallery): dem-gather wins whenever budget*B rows gathered stay small
relative to the full scan's N-row stream — 10-11x at B=1 / 0.1% budget
(both 100k and 1M galleries), 2.3-2.4x at B=32 / 0.1%, parity at B=1 /
2% budget, and it LOSES at B=128+ or budgets >=0.5% where the scattered
gather traffic exceeds the dense scan's sequential HBM stream. Serving
guidance: latency-bound single/small-batch lookups -> dem-gather;
throughput-bound batched matching -> ``topk_l2`` (or the int8 scan).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fast_image_recognition_tpu.config import DistanceKind
from fast_image_recognition_tpu.evaluation.harness import get_threshold
from fast_image_recognition_tpu.ops.distances import oracle_pairwise, pairwise_distances

BIG = 3.4e38


def select_pivots(
    features: np.ndarray,
    labels: np.ndarray,
    rng: np.random.Generator,
    pivot_fraction: float = 0.015,
    min_pivots: int = 5,
    max_pivots: int = 32,
    kind: DistanceKind = DistanceKind.L2,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Greedy most-far pivot selection + P_matrix build (ann.cpp:302-331).

    Returns (pivot_indices [P], P_matrix [P, N] float32, other_class_min
    [P] — per-pivot min distance to a row of another class)."""
    n = features.shape[0]
    num = int(n * pivot_fraction)
    num = max(num, min_pivots)
    num = min(num, max_pivots, n)

    pivots = [int(rng.integers(n))]
    rows = []
    other_min = []
    cum_far = np.zeros(n, dtype=np.float64)
    for ii in range(num):
        p = pivots[ii]
        d = oracle_pairwise(features[p : p + 1], features, kind=kind)[0]
        rows.append(d.astype(np.float32))
        other = d[labels != labels[p]]
        other_min.append(float(other.min()) if other.size else np.float32(BIG))
        cum_far += d
        if ii < num - 1:
            far = cum_far.copy()
            far[np.asarray(pivots)] = -1e12
            pivots.append(int(np.argmax(far)))
    return (
        np.asarray(pivots, dtype=np.int64),
        np.stack(rows),
        np.asarray(other_min, dtype=np.float32),
    )


def select_pivots_device(
    gallery: jax.Array,  # [N, D] device-resident (bf16 or fp32)
    labels,  # [N] int — host or device
    seed: int = 0,
    pivot_fraction: float = 0.015,
    min_pivots: int = 5,
    max_pivots: int = 32,
) -> Tuple[np.ndarray, jax.Array, np.ndarray]:
    """Device-side greedy pivot selection + P_matrix build (L2 only).

    The host ``select_pivots`` needs the full fp32 gallery in host memory;
    at production scale (1M x 1536) shipping that over the tunneled device
    link costs minutes (~7 MB/s), so the index build itself runs on the
    chip: each greedy far-point step (ann.cpp:302-331) is one [N, D] @ [D]
    contraction on the MXU and the P_matrix is the stack of the per-pivot
    distance rows. Semantics match ``select_pivots`` up to the gallery
    storage dtype's rounding. The whole build queues ~P dispatches and
    fetches only the [P] pivot ids + other-class minima.

    Returns (pivot_indices [P] int64 host, p_matrix [P, N] fp32 DEVICE,
    other_class_min [P] fp32 host).
    """
    gallery = jnp.asarray(gallery)
    n, dim = gallery.shape
    num = int(n * pivot_fraction)
    num = max(num, min_pivots)
    num = min(num, max_pivots, n)
    labels_d = jax.device_put(jnp.asarray(np.asarray(labels), jnp.int32))

    @jax.jit
    def sqnorms(g):
        return jnp.sum(jnp.square(g.astype(jnp.float32)), axis=1)  # [N]

    gal_sq = sqnorms(gallery)

    # NB: gallery/gal_sq/labels are explicit ARGUMENTS, not closure
    # captures — a jit-captured device array is baked into the lowered HLO
    # as a literal, and the tunneled remote-compile endpoint rejects
    # request bodies at gallery scale (HTTP 413 at 300 MB+).
    @jax.jit
    def step(gallery, gal_sq, labels_d, p_idx, cum_far, chosen):
        pf = gallery[p_idx]  # [D] storage dtype
        cross = jnp.einsum(
            "nd,d->n", gallery, pf, preferred_element_type=jnp.float32
        )
        p_sq = jnp.sum(jnp.square(pf.astype(jnp.float32)))
        d = jnp.maximum(gal_sq + p_sq - 2.0 * cross, 0.0) / dim  # window-mean
        other = jnp.where(labels_d != labels_d[p_idx], d, BIG)
        other_min = jnp.min(other)
        cum_far = cum_far + d
        far = jnp.where(chosen, -1e12, cum_far)
        nxt = jnp.argmax(far).astype(jnp.int32)
        chosen = chosen.at[nxt].set(True)
        return d, other_min, cum_far, chosen, nxt

    rng = np.random.default_rng(seed)
    p_idx = jnp.int32(int(rng.integers(n)))  # first pivot random (ann.cpp:302)
    chosen = jnp.zeros((n,), jnp.bool_).at[p_idx].set(True)
    cum_far = jnp.zeros((n,), jnp.float32)
    rows, other_mins, idxs = [], [], [p_idx]
    for ii in range(num):
        d, om, cum_far, chosen, nxt = step(
            gallery, gal_sq, labels_d, p_idx, cum_far, chosen
        )
        rows.append(d)
        other_mins.append(om)
        if ii < num - 1:
            idxs.append(nxt)
            p_idx = nxt
    p_matrix = jnp.stack(rows)  # [P, N] fp32, stays device-resident
    pivot_idx = np.asarray(jnp.stack(idxs)).astype(np.int64)  # one tiny fetch
    other_min = np.asarray(jnp.stack(other_mins)).astype(np.float32)
    return pivot_idx, p_matrix, other_min


@partial(jax.jit, static_argnames=("budget", "kind"))
def _dem_search(
    queries: jax.Array,  # [B, D]
    gallery: jax.Array,  # [N, D]
    p_matrix: jax.Array,  # [P, N]
    pivot_idx: jax.Array,  # [P] int32
    threshold: jax.Array,  # scalar
    budget: int,
    kind: DistanceKind = DistanceKind.L2,
):
    b, _ = queries.shape
    n = gallery.shape[0]
    p = p_matrix.shape[0]

    # All query->gallery distances in one MXU pass (window-mean semantics).
    d_all = pairwise_distances(queries, gallery, kind=kind)  # [B, N]
    d_qp = jnp.take(d_all, pivot_idx, axis=1)  # [B, P] pivot probes

    # --- pivot probing phase (ann.cpp:441-462) -----------------------------
    # Pivots are probed in order; the first pivot with dist < threshold ends
    # the query. Track best over the pivots actually probed.
    below = d_qp < threshold  # [B, P]
    any_below = jnp.any(below, axis=1)
    first_below = jnp.argmax(below, axis=1)  # index of first early exit
    pcols = jnp.arange(p)[None, :]
    probed_pivot = jnp.where(
        any_below[:, None], pcols <= first_below[:, None], jnp.ones_like(below)
    )
    d_qp_masked = jnp.where(probed_pivot, d_qp, BIG)
    best_p_arg = jnp.argmin(d_qp_masked, axis=1)
    best_p_dist = jnp.take_along_axis(d_qp_masked, best_p_arg[:, None], 1)[:, 0]
    best_p_idx = jnp.take(pivot_idx, best_p_arg)
    pivots_checked = jnp.where(any_below, first_below + 1, p)
    exited_at_pivots = any_below

    if budget == 0:
        # budget <= n_pivots: the pivot phase exhausts imageCountToCheck and
        # zero candidates are probed (ann.cpp:472 loop condition).
        return (
            best_p_idx.astype(jnp.int32),
            best_p_dist,
            pivots_checked.astype(jnp.int32),
        )

    # --- likelihood ranking (ann.cpp:453-461, 469-470) ----------------------
    # L[b, n] = sum_p (d_qp[b,p] - P[p,n])^2, one matmul via expansion.
    # The expansion cancels ~|d_qp|^2+|P|^2 (~256) down to a ~0.1 signal, so
    # the cross term MUST be computed with fp32 multiplications: the MXU's
    # default fp32-matmul precision is bf16 multiplies, whose ~0.4% rounding
    # is 10x the signal and randomizes the candidate ranking (measured: the
    # true match drops from rank 0 to rank 200-30,000 at batch>=8, where XLA
    # switches from VPU fp32 to MXU bf16). P<=32 makes the 6-pass HIGHEST
    # matmul free relative to the rest of the search.
    qp_sq = jnp.sum(d_qp * d_qp, axis=1, keepdims=True)  # [B, 1]
    pm_sq = jnp.sum(p_matrix * p_matrix, axis=0, keepdims=True)  # [1, N]
    cross = jnp.einsum(
        "bp,pn->bn", d_qp, p_matrix, precision=jax.lax.Precision.HIGHEST
    )  # [B, N] MXU
    lik = qp_sq + pm_sq - 2.0 * cross
    # pivots were already probed — exclude from the candidate ranking
    pivot_mask = jnp.zeros((n,), jnp.bool_).at[pivot_idx].set(True)
    lik = jnp.where(pivot_mask[None, :], BIG, lik)

    # probe order = ascending likelihood; take the first ``budget``
    order = jnp.argsort(lik, axis=1)[:, :budget]  # [B, budget]
    d_ordered = jnp.take_along_axis(d_all, order, axis=1)  # [B, budget]

    # --- sequential probe simulation (ann.cpp:472-501) ----------------------
    # Probe j stops the scan when its distance < threshold. The number of
    # probes actually performed is (first index below threshold) + 1, else
    # budget. Best = min over probed prefix (and the pivot best).
    below_t = d_ordered < threshold
    any_bt = jnp.any(below_t, axis=1)
    first_bt = jnp.argmax(below_t, axis=1)
    checked_rows = jnp.where(any_bt, first_bt + 1, budget)  # [B]
    cols = jnp.arange(budget)[None, :]
    probed = cols < checked_rows[:, None]
    d_probed = jnp.where(probed, d_ordered, BIG)
    best_arg = jnp.argmin(d_probed, axis=1)
    best_dist = jnp.take_along_axis(d_probed, best_arg[:, None], 1)[:, 0]
    best_idx = jnp.take_along_axis(order, best_arg[:, None], 1)[:, 0]

    # queries that exited at the pivot phase never rank/probe candidates
    final_best_dist = jnp.where(
        exited_at_pivots | (best_p_dist <= best_dist), best_p_dist, best_dist
    )
    final_best_idx = jnp.where(
        exited_at_pivots | (best_p_dist <= best_dist), best_p_idx, best_idx
    )
    checked = jnp.where(exited_at_pivots, pivots_checked, pivots_checked + checked_rows)
    return final_best_idx.astype(jnp.int32), final_best_dist, checked.astype(jnp.int32)


@partial(jax.jit, static_argnames=("budget",))
def _dem_search_gather(
    queries: jax.Array,  # [B, D] (small B — the low-latency serving path)
    gallery: jax.Array,  # [N, D] (bf16 HBM-resident)
    pivot_feats: jax.Array,  # [P, D]
    p_matrix: jax.Array,  # [P, N]
    pivot_idx: jax.Array,  # [P]
    threshold: jax.Array,
    budget: int,
):
    """Budget-limited probe: only the top-``budget`` candidates by
    likelihood are *gathered* and get true distances — O(B * budget * D)
    compute and HBM traffic instead of the full O(B * N * D) scan. This is
    where DEM's sub-linear search actually pays off in wall-clock on TPU
    (small batches / latency-bound serving); the exact path computes the
    full distance matrix and merely selects."""
    b, dim = queries.shape
    n = gallery.shape[0]
    p = p_matrix.shape[0]

    d_qp = pairwise_distances(queries, pivot_feats)  # [B, P]

    below = d_qp < threshold
    any_below = jnp.any(below, axis=1)
    first_below = jnp.argmax(below, axis=1)
    pcols = jnp.arange(p)[None, :]
    probed_pivot = jnp.where(
        any_below[:, None], pcols <= first_below[:, None], jnp.ones_like(below)
    )
    d_qp_masked = jnp.where(probed_pivot, d_qp, BIG)
    best_p_arg = jnp.argmin(d_qp_masked, axis=1)
    best_p_dist = jnp.take_along_axis(d_qp_masked, best_p_arg[:, None], 1)[:, 0]
    best_p_idx = jnp.take(pivot_idx, best_p_arg)
    pivots_checked = jnp.where(any_below, first_below + 1, p)
    exited_at_pivots = any_below

    if budget == 0:
        return (
            best_p_idx.astype(jnp.int32),
            best_p_dist,
            pivots_checked.astype(jnp.int32),
        )

    qp_sq = jnp.sum(d_qp * d_qp, axis=1, keepdims=True)
    pm_sq = jnp.sum(p_matrix * p_matrix, axis=0, keepdims=True)
    # fp32 multiplies are REQUIRED here — see the likelihood-cancellation
    # note in _dem_search_exact (bf16 MXU rounding at batch>=8 randomizes
    # the ranking the whole gather path depends on).
    lik = qp_sq + pm_sq - 2.0 * jnp.einsum(
        "bp,pn->bn", d_qp, p_matrix, precision=jax.lax.Precision.HIGHEST
    )  # [B, N]
    pivot_mask = jnp.zeros((n,), jnp.bool_).at[pivot_idx].set(True)
    lik = jnp.where(pivot_mask[None, :], BIG, lik)

    # Candidate selection: exact top-k over [B, N] dominates the query at
    # production budgets (measured 23-100 ms for k=1000 over 100k rows,
    # tunnel-state dependent, vs 6-10 ms for the TPU-native approx_min_k).
    # Use the approximate selector when the budget is a genuine subset and
    # re-sort the selected set so the sequential probe ORDER stays
    # likelihood-ranked; the approximation risks dropping ~5% of the true
    # candidate tail (recall_target=0.95), far inside DEM's own heuristic
    # slack — and both halves of the trade are measured in checked_fraction.
    if budget * 4 <= n:
        sel_lik, sel_idx = jax.lax.approx_min_k(lik, budget)
        srt = jnp.argsort(sel_lik, axis=1)
        order = jnp.take_along_axis(sel_idx, srt, axis=1)  # [B, budget]
    else:
        _, order = jax.lax.top_k(-lik, budget)  # ascending likelihood
    # Gathered candidate rows stay in the gallery's storage dtype (bf16) —
    # upcasting to fp32 here would double the HBM traffic of the gather,
    # the dominant cost of this path; the contractions accumulate in fp32
    # on the MXU, so only the (already approximate) per-element distances
    # carry bf16 rounding — measured in error_pct/checked_fraction.
    rows = jnp.take(gallery, order, axis=0)  # [B, k, D]
    qq = queries.astype(rows.dtype)
    cross = jnp.einsum(
        "bd,bkd->bk", qq, rows, preferred_element_type=jnp.float32
    )
    rsq = jnp.einsum(
        "bkd,bkd->bk", rows, rows, preferred_element_type=jnp.float32
    )
    q32 = queries.astype(jnp.float32)
    d_ordered = (
        jnp.sum(q32 * q32, axis=1, keepdims=True) + rsq - 2.0 * cross
    ) / dim

    below_t = d_ordered < threshold
    any_bt = jnp.any(below_t, axis=1)
    first_bt = jnp.argmax(below_t, axis=1)
    checked_rows = jnp.where(any_bt, first_bt + 1, budget)
    cols = jnp.arange(budget)[None, :]
    probed = cols < checked_rows[:, None]
    d_probed = jnp.where(probed, d_ordered, BIG)
    best_arg = jnp.argmin(d_probed, axis=1)
    best_dist = jnp.take_along_axis(d_probed, best_arg[:, None], 1)[:, 0]
    best_idx = jnp.take_along_axis(order, best_arg[:, None], 1)[:, 0]

    final_best_dist = jnp.where(
        exited_at_pivots | (best_p_dist <= best_dist), best_p_dist, best_dist
    )
    final_best_idx = jnp.where(
        exited_at_pivots | (best_p_dist <= best_dist), best_p_idx, best_idx
    )
    checked = jnp.where(
        exited_at_pivots, pivots_checked, pivots_checked + checked_rows
    )
    return final_best_idx.astype(jnp.int32), final_best_dist, checked.astype(jnp.int32)


@dataclasses.dataclass
class DEMIndex:
    pivot_indices: np.ndarray
    p_matrix: np.ndarray
    threshold: float


class DirectedEnumerationMatcher:
    """Matcher-protocol DEM ("dem" in reference printouts)."""

    def __init__(
        self,
        gallery_features: np.ndarray,
        gallery_labels: np.ndarray,
        false_accept_rate: float = 0.01,
        threshold: float = 0.0,
        image_count_to_check: int = 0,
        kind: DistanceKind = DistanceKind.L2,
        seed: int = 0,
        pivot_fraction: float = 0.015,
        max_pivots: int = 32,
        probe_mode: str = "exact",  # 'exact' | 'gather'
    ):
        """probe_mode='exact' computes the full distance matrix and selects
        the reference's probe set (best throughput at large batch);
        'gather' only touches the top-budget candidates — sub-linear HBM
        traffic and compute, the latency win for small batches (L2 only)."""
        self.name = "dem" if probe_mode == "exact" else "dem(gather)"
        self.kind = kind
        self.probe_mode = probe_mode
        if probe_mode == "gather" and kind != DistanceKind.L2:
            raise ValueError("gather mode supports L2 only")
        self._n = gallery_features.shape[0]
        rng = np.random.default_rng(seed)
        pivots, p_matrix, other_min = select_pivots(
            gallery_features,
            gallery_labels,
            rng,
            pivot_fraction=pivot_fraction,
            max_pivots=max_pivots,
            kind=kind,
        )
        if threshold <= 0:
            threshold = get_threshold(other_min, false_accept_rate)
        self.index = DEMIndex(pivots, p_matrix, float(threshold))
        dtype = jnp.bfloat16 if probe_mode == "gather" else jnp.float32
        self.gallery = jax.device_put(jnp.asarray(gallery_features, dtype))
        self._pivot_feats = jax.device_put(
            jnp.asarray(gallery_features[pivots], jnp.float32)
        )
        self._p_matrix = jax.device_put(jnp.asarray(p_matrix, jnp.float32))
        self._pivot_idx = jax.device_put(jnp.asarray(pivots, jnp.int32))
        self.set_budget(image_count_to_check)

    @classmethod
    def from_device(
        cls,
        gallery_dev: jax.Array,  # [N, D] already device-resident
        labels,
        false_accept_rate: float = 0.01,
        threshold: float = 0.0,
        image_count_to_check: int = 0,
        seed: int = 0,
        pivot_fraction: float = 0.015,
        max_pivots: int = 32,
        probe_mode: str = "gather",
    ) -> "DirectedEnumerationMatcher":
        """Build the DEM index without ever materializing the gallery on
        the host (L2 only): pivot selection and the P_matrix run on device
        (``select_pivots_device``) and only the [P] pivot ids / minima are
        fetched. This is the production build path — a 1M x 1536 gallery
        upload over the tunneled link costs minutes, while the device build
        is ~P matvec dispatches."""
        self = object.__new__(cls)
        self.name = "dem" if probe_mode == "exact" else "dem(gather)"
        self.kind = DistanceKind.L2
        self.probe_mode = probe_mode
        self._n = int(gallery_dev.shape[0])
        dtype = jnp.bfloat16 if probe_mode == "gather" else jnp.float32
        gallery_dev = jnp.asarray(gallery_dev, dtype)
        pivots, p_matrix_dev, other_min = select_pivots_device(
            gallery_dev,
            labels,
            seed=seed,
            pivot_fraction=pivot_fraction,
            max_pivots=max_pivots,
        )
        if threshold <= 0:
            threshold = get_threshold(other_min, false_accept_rate)
        # p_matrix stays device-resident (it can be 100s of MB at scale);
        # DEMIndex carries None in its host slot by design here.
        self.index = DEMIndex(pivots, None, float(threshold))
        self.gallery = gallery_dev
        self._pivot_feats = gallery_dev[jnp.asarray(pivots, jnp.int32)].astype(
            jnp.float32
        )
        self._p_matrix = p_matrix_dev
        self._pivot_idx = jax.device_put(jnp.asarray(pivots, jnp.int32))
        self.set_budget(image_count_to_check)
        return self

    def set_budget(self, image_count_to_check: int) -> None:
        # Reference semantics: the budget counts ALL distance evaluations,
        # pivots included (distanceCalcCount, ann.cpp:429, 472), and clamps
        # to the gallery size (ann.h:20-22).
        n_pivots = len(self.index.pivot_indices)
        n_cand = self._n - n_pivots
        if image_count_to_check <= 0 or image_count_to_check >= self._n:
            image_count_to_check = self._n
        # budget <= n_pivots leaves ZERO candidate probes (the reference's
        # while distanceCalcCount < imageCountToCheck never enters the
        # candidate loop, ann.cpp:472) — do not clamp up to 1.
        self.budget = int(np.clip(image_count_to_check - n_pivots, 0, n_cand))

    def search_device(self, queries_dev):
        """Device-in/device-out single-dispatch search (no host sync) — the
        serving/bench path queues many of these and fetches once (on the
        tunnel a per-call ``np.asarray`` round-trip would dominate)."""
        if self.probe_mode == "gather":
            return _dem_search_gather(
                queries_dev,
                self.gallery,
                self._pivot_feats,
                self._p_matrix,
                self._pivot_idx,
                jnp.float32(self.index.threshold),
                self.budget,
            )
        return _dem_search(
            queries_dev,
            self.gallery,
            self._p_matrix,
            self._pivot_idx,
            jnp.float32(self.index.threshold),
            self.budget,
            self.kind,
        )

    def search(self, queries: np.ndarray):
        from fast_image_recognition_tpu.search.base import SearchResult

        q = jnp.asarray(queries, dtype=jnp.float32)
        if self.probe_mode == "gather":
            # keep the gathered candidate block under ~1 GB (bf16 rows)
            d = q.shape[1]
            max_chunk = max(1, int(1e9 // max(self.budget * d * 2, 1)))
            outs = [
                self.search_device(q[s : s + max_chunk])
                for s in range(0, q.shape[0], max_chunk)
            ]
            idx = jnp.concatenate([o[0] for o in outs])
            dist = jnp.concatenate([o[1] for o in outs])
            checked = jnp.concatenate([o[2] for o in outs])
        else:
            idx, dist, checked = self.search_device(q)
        return SearchResult(
            indices=np.asarray(idx),
            distances=np.asarray(dist),
            checked_fraction=np.asarray(checked, dtype=np.float32) / self._n,
        )


# ---------------------------------------------------------------------------
# Non-PIVOT (full-matrix) DEM — ann.cpp:283-300, 474-499 under #ifndef PIVOT
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("budget", "n_start", "kind"))
def _dem_full_search(
    queries: jax.Array,  # [B, D]
    gallery: jax.Array,  # [N, D]
    p_full: jax.Array,  # [N, N] full distance matrix
    start_idx: jax.Array,  # [S] int32 greedy-far start images
    threshold: jax.Array,
    budget: int,
    n_start: int,
    kind: DistanceKind = DistanceKind.L2,
):
    """Batched directed enumeration with per-probe likelihood refinement.

    Reference (non-PIVOT): after every probed image nu with distance d, the
    likelihood of every unchecked mu gains (d - P[nu, mu])^2 (ann.cpp:
    487-497) — the probe ORDER is re-derived after each probe, unlike PIVOT
    mode where the ranking is fixed once. The reference re-sorts every
    TRIALS=2 probes (a partial_sort cost optimization); here the argmin is
    re-evaluated every probe, which probes in at-least-as-directed order.
    One lax.fori_loop step probes one candidate per query, all queries in
    lockstep; early-exited queries are masked out of updates and counting.
    """
    b = queries.shape[0]
    n = gallery.shape[0]
    d_all = pairwise_distances(queries, gallery, kind=kind)  # [B, N]
    rows = jnp.arange(b)

    steps = min(budget, n)

    def body(i, state):
        lik, probed, best_d, best_i, done, checked = state
        # start images probe in fixed order; afterwards most-likely first
        cand_seed = start_idx[jnp.minimum(i, n_start - 1)]
        cand_lik = jnp.argmin(jnp.where(probed, BIG, lik), axis=1)
        cand = jnp.where(i < n_start, cand_seed, cand_lik).astype(jnp.int32)
        cand = jnp.broadcast_to(cand, (b,)) if cand.ndim == 0 else cand
        d = jnp.take_along_axis(d_all, cand[:, None], axis=1)[:, 0]
        act = ~done
        improved = jnp.logical_and(act, d < best_d)
        best_d = jnp.where(improved, d, best_d)
        best_i = jnp.where(improved, cand, best_i)
        checked = checked + act.astype(jnp.int32)
        done = jnp.logical_or(done, jnp.logical_and(act, d < threshold))
        # refinement: lik[mu] += (d - P[cand, mu])^2 for active queries
        p_rows = p_full[cand]  # [B, N] gather
        delta = d[:, None] - p_rows
        lik = lik + jnp.where(act[:, None], delta * delta, 0.0)
        probed = probed.at[rows, cand].set(True)
        return lik, probed, best_d, best_i, done, checked

    init = (
        jnp.zeros((b, n), jnp.float32),
        jnp.zeros((b, n), jnp.bool_),
        jnp.full((b,), BIG, jnp.float32),
        jnp.full((b,), -1, jnp.int32),
        jnp.zeros((b,), jnp.bool_),
        jnp.zeros((b,), jnp.int32),
    )
    _, _, best_d, best_i, _, checked = jax.lax.fori_loop(0, steps, body, init)
    return best_i, best_d, checked


class FullMatrixDEM:
    """Non-PIVOT DEM ("dem" with ``#ifndef PIVOT``): the full N x N model
    distance matrix drives likelihood refinement after EVERY probe.

    The reference compiles this variant out by default (ann.cpp:270
    ``#define PIVOT``) because the O(N^2) matrix doesn't scale; it is kept
    here with the same small-gallery constraint for algorithmic parity —
    build cost O(N^2 / MXU) (one blocked self-distance pass), memory
    O(N^2) fp32 on device."""

    def __init__(
        self,
        gallery_features: np.ndarray,
        gallery_labels: np.ndarray,
        false_accept_rate: float = 0.01,
        threshold: float = 0.0,
        image_count_to_check: int = 0,
        kind: DistanceKind = DistanceKind.L2,
        seed: int = 0,
        pivot_fraction: float = 0.015,
        max_pivots: int = 32,
    ):
        self.name = "dem(full)"
        self.kind = kind
        self._n = n = gallery_features.shape[0]
        rng = np.random.default_rng(seed)
        # same greedy most-far start-image selection as PIVOT init
        starts, _, _ = select_pivots(
            gallery_features, gallery_labels, rng,
            pivot_fraction=pivot_fraction, max_pivots=max_pivots, kind=kind,
        )
        g = jnp.asarray(gallery_features, jnp.float32)
        p_full = np.asarray(pairwise_distances(g, g, kind=kind), np.float32)
        if threshold <= 0:
            # FAR quantile of each row's min distance to another class
            # (ann.cpp:286-297 collects the first other-class neighbor)
            other = np.where(
                gallery_labels[None, :] != gallery_labels[:, None], p_full, BIG
            ).min(axis=1)
            threshold = get_threshold(other.astype(np.float32), false_accept_rate)
        self.threshold = float(threshold)
        self.gallery = jax.device_put(g)
        self._p_full = jax.device_put(jnp.asarray(p_full))
        self._start_idx = jax.device_put(jnp.asarray(starts, jnp.int32))
        self.set_budget(image_count_to_check)

    def set_budget(self, image_count_to_check: int) -> None:
        if image_count_to_check <= 0 or image_count_to_check >= self._n:
            image_count_to_check = self._n
        self.budget = int(image_count_to_check)

    def search(self, queries: np.ndarray):
        from fast_image_recognition_tpu.search.base import SearchResult

        q = jnp.asarray(queries, jnp.float32)
        idx, dist, checked = _dem_full_search(
            q,
            self.gallery,
            self._p_full,
            self._start_idx,
            jnp.float32(self.threshold),
            self.budget,
            int(self._start_idx.shape[0]),
            self.kind,
        )
        return SearchResult(
            indices=np.asarray(idx),
            distances=np.asarray(dist),
            checked_fraction=np.asarray(checked, np.float32) / self._n,
        )


def dem_full_oracle_search(
    query: np.ndarray,
    gallery: np.ndarray,
    p_full: np.ndarray,
    start_idx: np.ndarray,
    threshold: float,
    budget: int,
    kind: DistanceKind = DistanceKind.L2,
) -> Tuple[int, float, int]:
    """Sequential non-PIVOT walk (ann.cpp:474-499) with per-probe
    refinement. Returns (best_index, best_distance, checked)."""
    n = gallery.shape[0]
    if budget <= 0 or budget >= n:
        budget = n
    lik = np.zeros(n, np.float64)
    probed = np.zeros(n, np.bool_)
    best_idx, best_dist, checked = -1, np.inf, 0
    for step in range(budget):
        if step < len(start_idx):
            cand = int(start_idx[step])
            if probed[cand]:
                continue
        else:
            masked = np.where(probed, np.inf, lik)
            cand = int(np.argmin(masked))
        d = oracle_pairwise(query[None], gallery[cand : cand + 1], kind=kind)[0, 0]
        checked += 1
        if d < best_dist:
            best_dist, best_idx = d, cand
            if d < threshold:
                break
        delta = d - p_full[cand]
        lik += np.where(probed, 0.0, delta * delta)
        probed[cand] = True
    return best_idx, float(best_dist), checked


# ---------------------------------------------------------------------------
# NumPy oracle — per-query sequential loop faithful to ann.cpp PIVOT mode
# ---------------------------------------------------------------------------

def dem_oracle_search(
    query: np.ndarray,
    gallery: np.ndarray,
    index: DEMIndex,
    budget: int,
    kind: DistanceKind = DistanceKind.L2,
) -> Tuple[int, float, int]:
    """Sequential reference walk (ann.cpp:416-507, PIVOT). Returns
    (best_index, best_distance, distance_calc_count)."""
    n = gallery.shape[0]
    if budget <= 0 or budget >= n:
        budget = n
    threshold = index.threshold
    checked = 0
    best_idx, best_dist = -1, np.inf

    d_qp = np.empty(len(index.pivot_indices), dtype=np.float64)
    for i, p in enumerate(index.pivot_indices):
        d = oracle_pairwise(query[None], gallery[p : p + 1], kind=kind)[0, 0]
        checked += 1
        d_qp[i] = d
        if d < best_dist:
            best_dist, best_idx = d, int(p)
            if d < threshold:
                return best_idx, float(best_dist), checked

    lik = ((d_qp[:, None] - index.p_matrix) ** 2).sum(axis=0)
    lik[index.pivot_indices] = np.inf
    order = np.argsort(lik, kind="stable")
    n_pivots = len(index.pivot_indices)
    cand_budget = int(np.clip(budget - n_pivots, 0, n - n_pivots))
    for j in range(cand_budget):
        cand = int(order[j])
        d = oracle_pairwise(query[None], gallery[cand : cand + 1], kind=kind)[0, 0]
        checked += 1
        if d < best_dist:
            best_dist, best_idx = d, cand
            if d < threshold:
                break
    return best_idx, float(best_dist), checked
