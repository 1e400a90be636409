"""Small-world graph ANN — the NMSLIB ``small_world_rand`` counterpart.

Reference: qt_cpp/ann.h:121-157, ann.cpp:214-235 — the NMSLIB navigable
small-world index (``small_world_rand``, NN=15 efConstruction-era NSW) with
query-time budget tied to ``imageCountToCheck`` via distance-computation
counting (ann.cpp:262 ``DistanceComputations``).

TPU-native redesign (NOT a port of NMSLIB's pointer graph):

- **Build**: the navigable graph is a dense ``[N, K]`` int32 neighbor table
  — ``k_nn`` exact nearest neighbors (computed with the fused Pallas top-k
  kernel, so the O(N²) build runs at MXU rate in gallery tiles) plus
  ``k_rand`` seeded random long-range edges. NSW obtains both edge kinds
  implicitly from randomized insertion; here they are explicit, which is
  equivalent in search behavior (short edges give local convergence, random
  edges give the small-world hops) and is a one-shot dense computation
  instead of N sequential inserts.
- **Search**: batched best-first beam search, one ``lax.while_loop`` for the
  whole query batch. Each step expands the current beam's neighbor lists
  with one gather, computes true distances with one batched contraction
  (``einsum`` — MXU), masks already-visited nodes via a per-query visited
  bitmap, and keeps the top-``beam`` frontier. All queries advance in
  lockstep; per-query state is carried in arrays, not host control flow.
- **Visited state**: a bit-packed ``[B, ceil(N/32)]`` uint32 map (32x less
  HBM than a bool map — 128 MB instead of 4 GB at B=1024 x N=1M, so the
  production gallery scale fits). Marking is an exact-once scatter-ADD of
  per-candidate bits: entry points are host-deduplicated and per-wave
  candidates are masked to first-occurrence-and-unseen before the add, so
  no (row, word) bit is ever added twice and the add equals a bitwise OR.
  (This also removes the unspecified-order duplicate-scatter hazard a
  boolean ``.set`` scatter had.)
- **Budget**: true distance computations are counted per query (visited
  nodes are never recounted — same semantics as NMSLIB's
  ``DistanceComputations``); a query stops expanding when its count reaches
  the budget or its beam stops improving. ``checked_fraction`` reports
  count/N like DEM's ``avgCheckedPercent`` (ann.h:29-30).
- **Entry routing + restarts** (the production ``search_device`` path):
  a pure graph walk from random entries saturates after ~beam*K probes and
  stops — at 100k+ rows in high D that threw away >99% of the budget and
  the walk never left its local minimum. ``_sw_search_routed`` spends up to
  half the budget on a coarse scan of a seeded gallery sample (ONE MXU
  matmul — the TPU-native analog of HNSW's upper routing layers), starts
  the walk from the best-ranked sample rows, and when the beam saturates
  with budget remaining it RESTARTS from the next-ranked sample slice
  (NMSLIB's ``initSearchAttempts`` analog, driven by the budget instead of
  a fixed attempt count) while carrying the global best-so-far.

Unlike the 'exact'-mode DEM accounting, the work here is genuinely
sub-linear: only the sample scan and gathered rows are touched after the
build. Measured honestly (benchmarks/ann_crossover_r3.jsonl): on
high-dimensional identity-clustered galleries the graph walk carries
almost no routing signal — non-matching identities are all nearly
equidistant (concentration of measure), so error is dominated by whether
the sample scan hits the true identity; DEM's pivot triangulation beats it
at every operating point, which is the reference paper's own thesis
(small_world is its weak baseline, ann.cpp:216-218 keeps it compiled out).

DOCUMENTED NEGATIVE RESULT (round 4). ``pca_dim`` builds and walks the
graph in PCA space with an exact full-D beam rescore — the same
candidates+rescore contract as the serving match path. That FIXED the
accuracy axis (benchmarks/ann_crossover_r4.jsonl: 0% error at ~4.8% of
the gallery checked, vs 59% error in round 3), but the throughput axis
still loses everywhere: 25 q/s at B=1 / 62 q/s at B=32 against brute
force's 2,351 / 72,361 on the same 102,400-row gallery — the while_loop
walk dispatches hundreds of dependent gather+einsum waves where the
brute-force kernel streams the whole gallery through the MXU in one.
On TPU the crossover where pointer-chasing beats streaming does not
exist at these gallery sizes: the MXU's sequential-scan rate is ~3
orders of magnitude above the gather rate, so "check 5% of rows in 300
waves" loses to "check 100% of rows in one dispatch". Kept as the
working NMSLIB-counterpart (correctness-tested, budget-accounted) and as
this measured negative result; dropped from ``cli/run_ann.py`` defaults
— use DEM (pivot triangulation, one matmul per wave) for budgeted search
on TPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

BIG = 3.4e38


def build_neighbor_table(
    gallery: jax.Array,  # [N, D] float32
    k_nn: int = 11,
    k_rand: int = 4,
    seed: int = 0,
    batch: int = 1024,
) -> jax.Array:
    """[N, k_nn + k_rand] int32 neighbor ids (self-loops excluded)."""
    from fast_image_recognition_tpu.ops.distance_kernel import pad_gallery, topk_l2

    n = int(gallery.shape[0])
    padded = pad_gallery(jnp.asarray(gallery, jnp.bfloat16))
    knn_rows = []
    for s in range(0, n, batch):
        q = gallery[s : s + batch]
        # k_nn + 1 then drop the self column (distance ~0 ranks first; on
        # ties with duplicates dropping any one duplicate is equivalent).
        _, idx = topk_l2(q, padded, k=k_nn + 1, n_valid=n)
        idx = np.asarray(idx)  # [m, k_nn+1]
        m = idx.shape[0]
        own = (s + np.arange(m))[:, None]
        # vectorized self-removal: stable-sort each row by is-self, then
        # take the first k_nn columns (self, if present, sorts last)
        order = np.argsort(idx == own, axis=1, kind="stable")[:, :k_nn]
        knn_rows.append(np.take_along_axis(idx, order, axis=1).astype(np.int32))
    knn = np.concatenate(knn_rows, axis=0)
    rng = np.random.default_rng(seed)
    rand = rng.integers(0, n, size=(n, k_rand), dtype=np.int64).astype(np.int32)
    return jnp.asarray(np.concatenate([knn, rand], axis=1))


@partial(jax.jit, static_argnames=("beam", "budget", "max_steps"))
def _sw_search(
    queries: jax.Array,  # [B, D]
    gallery: jax.Array,  # [N, D]
    gallery_sqnorm: jax.Array,  # [N]
    neighbors: jax.Array,  # [N, K]
    entry_ids: jax.Array,  # [B, beam] initial frontier
    beam: int,
    budget: int,
    max_steps: int,
):
    b, d = queries.shape
    n = gallery.shape[0]
    k = neighbors.shape[1]
    q32 = queries.astype(jnp.float32)
    qn = jnp.sum(q32 * q32, axis=1)  # [B]

    def true_dist(ids):  # ids [B, M] -> window-mean L2 (db_features.cpp:40)
        feats = gallery[ids]  # [B, M, D] gather — the sub-linear touch
        dots = jnp.einsum(
            "bmd,bd->bm", feats.astype(jnp.float32), q32,
            preferred_element_type=jnp.float32,
        )
        return (qn[:, None] + gallery_sqnorm[ids] - 2.0 * dots) / d

    rows = jnp.arange(b)[:, None]
    nw = (n + 31) // 32  # packed visited words per query
    one = jnp.uint32(1)

    def bit_of(ids):
        return one << (ids & 31).astype(jnp.uint32)

    # Seed: evaluate the entry points (host-deduplicated per row, so the
    # bit-add below marks each entry exactly once).
    d0 = true_dist(entry_ids)
    visited0 = jnp.zeros((b, nw), jnp.uint32).at[
        rows, entry_ids >> 5
    ].add(bit_of(entry_ids))
    checked0 = jnp.full((b,), entry_ids.shape[1], jnp.int32)
    order = jnp.argsort(d0, axis=1)[:, :beam]
    front_ids0 = jnp.take_along_axis(entry_ids, order, axis=1)
    front_d0 = jnp.take_along_axis(d0, order, axis=1)
    front_exp0 = jnp.zeros((b, beam), jnp.bool_)  # expanded yet?
    active0 = jnp.ones((b,), jnp.bool_)

    def cond(state):
        _, _, _, _, _, active, step = state
        return jnp.logical_and(step < max_steps, jnp.any(active))

    def body(state):
        front_ids, front_d, front_exp, visited, checked, active, step = state
        # Best-first: expand the closest not-yet-expanded beam slots. The
        # wave width scales with remaining budget (>=1 so the walk always
        # progresses), giving NMSLIB-like one-node-at-a-time granularity
        # near the budget edge and full-beam waves when budget is ample.
        w_act = jnp.clip((budget - checked) // k, 1, beam)
        unexp = ~front_exp
        expand_slot = jnp.logical_and(
            jnp.logical_and(unexp, jnp.cumsum(unexp, axis=1) <= w_act[:, None]),
            active[:, None],
        )  # [B, beam]
        cand = neighbors[front_ids].reshape(b, beam * k)  # [B, beam*K]
        slot_mask = jnp.repeat(expand_slot, k, axis=1)  # candidate came from
        # an expanded slot this wave
        seen = (visited[rows, cand >> 5] & bit_of(cand)) != 0
        # Dedup: keep each distinct candidate id once (duplicates inside the
        # row would double-count AND double-add its visited bit). Keys of
        # non-expanded slots are offset so they never alias a real id's
        # dedup group.
        key = jnp.where(slot_mask, cand, cand + n)
        srt = jnp.argsort(key, axis=1)
        ks = jnp.take_along_axis(key, srt, axis=1)
        dup_sorted = jnp.concatenate(
            [jnp.zeros((b, 1), jnp.bool_), ks[:, 1:] == ks[:, :-1]], axis=1
        )
        inv = jnp.argsort(srt, axis=1)
        first = ~jnp.take_along_axis(dup_sorted, inv, axis=1)
        fresh = (~seen) & slot_mask & first
        dc = jnp.where(fresh, true_dist(cand), BIG)
        new_count = jnp.sum(fresh, axis=1).astype(jnp.int32)

        # Mark exactly the fresh candidates: each appears once per row
        # (``first``) and its bit is unset (``~seen``), so scatter-add of
        # the bit equals a race-free bitwise OR.
        visited = visited.at[rows, cand >> 5].add(
            jnp.where(fresh, bit_of(cand), jnp.uint32(0))
        )
        checked_new = checked + new_count
        front_exp = jnp.logical_or(front_exp, expand_slot)

        merged_d = jnp.concatenate([front_d, dc], axis=1)
        merged_i = jnp.concatenate([front_ids, cand], axis=1)
        merged_e = jnp.concatenate(
            [front_exp, jnp.ones((b, beam * k), jnp.bool_) & False], axis=1
        )
        order = jnp.argsort(merged_d, axis=1)[:, :beam]
        nd = jnp.take_along_axis(merged_d, order, axis=1)
        ni = jnp.take_along_axis(merged_i, order, axis=1)
        ne = jnp.take_along_axis(merged_e, order, axis=1)
        # Queries active THIS step keep their expansion results (even if it
        # was their last — the probes were already paid for and counted).
        keep = active[:, None]
        front_ids = jnp.where(keep, ni, front_ids)
        front_d = jnp.where(keep, nd, front_d)
        front_exp = jnp.where(keep, ne, front_exp)
        # NSW/efSearch stop rule: the walk ends when every beam slot has
        # been expanded (no expansion produced a closer candidate) or the
        # distance-computation budget is spent.
        active = jnp.logical_and(
            active,
            jnp.logical_and(jnp.any(~front_exp, axis=1), checked_new < budget),
        )
        return front_ids, front_d, front_exp, visited, checked_new, active, step + 1

    front_ids, front_d, _, _, checked, _, _ = jax.lax.while_loop(
        cond, body, (front_ids0, front_d0, front_exp0, visited0, checked0, active0, 0)
    )
    return front_ids[:, 0], front_d[:, 0], checked


@partial(jax.jit, static_argnames=("beam", "budget", "max_steps"))
def _sw_search_routed(
    queries: jax.Array,  # [B, D]
    gallery: jax.Array,  # [N, D]
    gallery_sqnorm: jax.Array,  # [N]
    neighbors: jax.Array,  # [N, K]
    sample_ids: jax.Array,  # [S] distinct seeded sample (S multiple of beam)
    beam: int,
    budget: int,
    max_steps: int,
):
    """Coarse-routed, restarting beam search (see module docstring).

    The S sample rows are scanned up front (counted against the budget) and
    ranked; the walk starts from the top ``beam`` and, whenever the beam
    saturates with budget left, restarts from the next-ranked slice while a
    global best-so-far is carried. Returns (best_id, best_d, checked)."""
    b, d = queries.shape
    n = gallery.shape[0]
    k = neighbors.shape[1]
    s = sample_ids.shape[0]
    q32 = queries.astype(jnp.float32)
    qn = jnp.sum(q32 * q32, axis=1)  # [B]

    def true_dist(ids):  # ids [B, M]
        feats = gallery[ids]
        dots = jnp.einsum(
            "bmd,bd->bm", feats.astype(jnp.float32), q32,
            preferred_element_type=jnp.float32,
        )
        return (qn[:, None] + gallery_sqnorm[ids] - 2.0 * dots) / d

    # --- routing scan: one [B, S] matmul over the sample -------------------
    sfeats = gallery[sample_ids].astype(jnp.float32)  # [S, D]
    d_s = (
        qn[:, None]
        + gallery_sqnorm[sample_ids][None, :]
        - 2.0 * q32 @ sfeats.T
    ) / d  # [B, S]
    order_s = jnp.argsort(d_s, axis=1)  # [B, S] ranked entry schedule
    sorted_ids = sample_ids[order_s]  # [B, S]
    sorted_d = jnp.take_along_axis(d_s, order_s, axis=1)

    rows = jnp.arange(b)[:, None]
    nw = (n + 31) // 32
    one = jnp.uint32(1)

    def bit_of(ids):
        return one << (ids & 31).astype(jnp.uint32)

    # every sample row is visited by every query: build the mask once, share
    base = jnp.zeros((nw,), jnp.uint32).at[sample_ids >> 5].add(
        bit_of(sample_ids)
    )
    visited0 = jnp.broadcast_to(base, (b, nw)) | jnp.zeros((b, nw), jnp.uint32)
    checked0 = jnp.full((b,), s, jnp.int32)
    front_ids0 = sorted_ids[:, :beam]
    front_d0 = sorted_d[:, :beam]
    front_exp0 = jnp.zeros((b, beam), jnp.bool_)
    best_id0 = front_ids0[:, 0]
    best_d0 = front_d0[:, 0]
    r0 = jnp.ones((b,), jnp.int32)  # next restart slice
    active0 = jnp.full((b,), s < budget, jnp.bool_)
    n_slices = s // beam

    def cond(state):
        return jnp.logical_and(state[-1] < max_steps, jnp.any(state[-2]))

    def body(state):
        (front_ids, front_d, front_exp, visited, checked,
         best_id, best_d, r, active, step) = state
        w_act = jnp.clip((budget - checked) // k, 1, beam)
        unexp = ~front_exp
        expand_slot = jnp.logical_and(
            jnp.logical_and(unexp, jnp.cumsum(unexp, axis=1) <= w_act[:, None]),
            active[:, None],
        )
        cand = neighbors[front_ids].reshape(b, beam * k)
        slot_mask = jnp.repeat(expand_slot, k, axis=1)
        seen = (visited[rows, cand >> 5] & bit_of(cand)) != 0
        key = jnp.where(slot_mask, cand, cand + n)
        srt = jnp.argsort(key, axis=1)
        ks = jnp.take_along_axis(key, srt, axis=1)
        dup_sorted = jnp.concatenate(
            [jnp.zeros((b, 1), jnp.bool_), ks[:, 1:] == ks[:, :-1]], axis=1
        )
        inv = jnp.argsort(srt, axis=1)
        first = ~jnp.take_along_axis(dup_sorted, inv, axis=1)
        fresh = (~seen) & slot_mask & first
        dc = jnp.where(fresh, true_dist(cand), BIG)
        visited = visited.at[rows, cand >> 5].add(
            jnp.where(fresh, bit_of(cand), jnp.uint32(0))
        )
        checked_new = checked + jnp.sum(fresh, axis=1).astype(jnp.int32)
        front_exp = jnp.logical_or(front_exp, expand_slot)

        merged_d = jnp.concatenate([front_d, dc], axis=1)
        merged_i = jnp.concatenate([front_ids, cand], axis=1)
        merged_e = jnp.concatenate(
            [front_exp, jnp.zeros((b, beam * k), jnp.bool_)], axis=1
        )
        order = jnp.argsort(merged_d, axis=1)[:, :beam]
        nd = jnp.take_along_axis(merged_d, order, axis=1)
        ni = jnp.take_along_axis(merged_i, order, axis=1)
        ne = jnp.take_along_axis(merged_e, order, axis=1)
        keep = active[:, None]
        front_ids = jnp.where(keep, ni, front_ids)
        front_d = jnp.where(keep, nd, front_d)
        front_exp = jnp.where(keep, ne, front_exp)

        # fold the frontier head into the global best BEFORE any restart
        better = front_d[:, 0] < best_d
        best_d = jnp.where(better, front_d[:, 0], best_d)
        best_id = jnp.where(better, front_ids[:, 0], best_id)

        # restart saturated rows from the next-ranked sample slice
        saturated = ~jnp.any(~front_exp, axis=1)
        in_budget = checked_new < budget
        want_restart = active & saturated & in_budget & (r < n_slices)
        cols = jnp.clip(
            r[:, None] * beam + jnp.arange(beam)[None, :], 0, s - 1
        )
        rid = jnp.take_along_axis(sorted_ids, cols, axis=1)
        rd = jnp.take_along_axis(sorted_d, cols, axis=1)
        rmask = want_restart[:, None]
        front_ids = jnp.where(rmask, rid, front_ids)
        front_d = jnp.where(rmask, rd, front_d)
        front_exp = jnp.where(rmask, False, front_exp)
        r = r + want_restart.astype(jnp.int32)
        active = active & in_budget & (~saturated | want_restart)
        return (front_ids, front_d, front_exp, visited, checked_new,
                best_id, best_d, r, active, step + 1)

    state = (front_ids0, front_d0, front_exp0, visited0, checked0,
             best_id0, best_d0, r0, active0, 0)
    (front_ids, front_d, _, _, checked,
     best_id, best_d, _, _, _) = jax.lax.while_loop(cond, body, state)
    better = front_d[:, 0] < best_d
    best_d = jnp.where(better, front_d[:, 0], best_d)
    best_id = jnp.where(better, front_ids[:, 0], best_id)
    # final beam also returned: the PCA-space mode rescores it in full D
    return best_id, best_d, checked, front_ids


@partial(jax.jit, static_argnames=("pca_dim",))
def rescore_full_d(
    q_full: jax.Array,  # [B, D]
    best_id: jax.Array,  # [B]
    front_ids: jax.Array,  # [B, beam] final beam from the walk
    checked_walk: jax.Array,  # [B] walk-space probe counts
    gallery: jax.Array,  # [N, D] full-D rows
    gallery_sqnorm: jax.Array,  # [N]
    pca_dim: int,
):
    """Exact full-D rescore of a PCA-space walk's final beam (+ its global
    best): the candidates+rescore contract of the e2e match applied to the
    graph search. ``checked`` converts to full-D-equivalent distance
    computations (walk probes cost pca_dim/D each; the rescores cost 1
    each) so checked_fraction stays comparable with DEM/BF accounting."""
    d = q_full.shape[1]
    ids = jnp.concatenate([best_id[:, None], front_ids], axis=1)
    feats = gallery[ids]  # [B, R, D]
    dots = jnp.einsum(
        "brd,bd->br", feats, q_full, preferred_element_type=jnp.float32
    )
    qn = jnp.sum(q_full * q_full, axis=1)
    dist = (qn[:, None] + gallery_sqnorm[ids] - 2.0 * dots) / d
    j = jnp.argmin(dist, axis=1)
    out_i = jnp.take_along_axis(ids, j[:, None], 1)[:, 0]
    out_d = jnp.take_along_axis(dist, j[:, None], 1)[:, 0]
    eq = checked_walk.astype(jnp.float32) * (pca_dim / d) + ids.shape[1]
    return out_i, out_d, eq


class SmallWorldMatcher:
    """Budgeted graph-ANN matcher ("small_world_rand" in reference
    printouts, ann.cpp:214)."""

    def __init__(
        self,
        gallery_features: np.ndarray,
        k_nn: int = 11,
        k_rand: int = 4,  # NN=15 total, the reference's initIndexParams
        beam: int = 8,
        image_count_to_check: int = 0,
        seed: int = 0,
        sample_pool: int = 8192,
        pca_dim: int = 0,  # >0: build + walk in a PCA projection
    ):
        self.name = f"small_world_rand(NN={k_nn + k_rand},beam={beam})"
        self._n, self._d = gallery_features.shape
        self.beam = int(beam)
        self.seed = seed
        self.gallery = jax.device_put(jnp.asarray(gallery_features, jnp.float32))
        self.gallery_sqnorm = jnp.sum(self.gallery * self.gallery, axis=1)
        self.pca_dim = int(pca_dim) if 0 < pca_dim < self._d else 0
        if self.pca_dim:
            # PCA-space graph (VERDICT r3 #3): neighborhoods in the
            # pca_dim projection are the candidates+rescore trick of the
            # e2e match applied to the graph — gathers shrink D/P-fold,
            # the O(N^2) build runs over the projected gallery, and the
            # same arithmetic budget buys D/P more walk probes. The final
            # beam is rescored EXACTLY in full D below.
            from fast_image_recognition_tpu.ops.pca import fit_pca

            g_host = np.asarray(gallery_features, np.float32)
            sample = g_host[: min(self._n, 8192)]
            pca = fit_pca(sample, num_components=self.pca_dim)
            self._mu = jnp.asarray(pca.mean, jnp.float32)
            self._w = jnp.asarray(pca.components.T, jnp.float32)  # [D, P]
            self._walk_gallery = jax.jit(
                lambda g: (g - self._mu) @ self._w
            )(self.gallery)
            self._walk_sqnorm = jnp.sum(
                self._walk_gallery * self._walk_gallery, axis=1
            )
            self._budget_scale = max(1, self._d // self.pca_dim)
            self.name += f",pca{self.pca_dim}"
        else:
            self._walk_gallery = self.gallery
            self._walk_sqnorm = self.gallery_sqnorm
            self._budget_scale = 1
        self.neighbors = build_neighbor_table(
            self._walk_gallery, k_nn=k_nn, k_rand=k_rand, seed=seed
        )
        # seeded routing pool: a fixed permutation sample; search slices the
        # first S = min(pool, max(4*beam, budget//2)) rows (budget-scaled)
        rng = np.random.default_rng(seed + 2)
        pool = min(self._n, int(sample_pool))
        self._sample_pool = jnp.asarray(
            rng.choice(self._n, size=pool, replace=False).astype(np.int32)
        )
        self.set_budget(image_count_to_check)

    def _sample_size(self, walk_budget: int) -> int:
        """Routing-scan size in WALK-space probe units (= the budget the
        walk itself is metered in, so pca mode routes D/P more broadly for
        the same arithmetic)."""
        beam = min(self.beam, self._n)
        s = min(
            int(self._sample_pool.shape[0]),
            max(4 * beam, walk_budget // 2),
            max(beam, walk_budget),  # never let routing alone blow the budget
        )
        return max(beam, (s // beam) * beam)  # multiple of beam, >= beam

    def set_budget(self, image_count_to_check: int) -> None:
        if image_count_to_check <= 0 or image_count_to_check > self._n:
            image_count_to_check = self._n
        self.budget = int(image_count_to_check)

    def _entry_ids(self, b: int) -> jax.Array:
        """Seeded per-row-distinct random entry points [b, beam] int32."""
        rng = np.random.default_rng(self.seed + 1)
        beam = min(self.beam, self._n)
        entries_np = rng.integers(0, self._n, size=(b, beam), dtype=np.int64)
        # per-row distinct entry points (the packed visited map adds each
        # entry's bit exactly once); collisions are rare for n >> beam, so
        # resample only the offending rows
        for _ in range(64):
            srt = np.sort(entries_np, axis=1)
            dup_rows = (srt[:, 1:] == srt[:, :-1]).any(axis=1)
            if not dup_rows.any():
                break
            entries_np[dup_rows] = rng.integers(
                0, self._n, size=(int(dup_rows.sum()), beam), dtype=np.int64
            )
        else:  # pragma: no cover - n ~ beam fallback: deterministic fill
            entries_np = (
                np.argsort(rng.random((b, self._n)), axis=1)[:, :beam]
            )
        return jnp.asarray(entries_np.astype(np.int32))

    def search_device(self, queries_dev, entries=None):
        """Device-in/device-out search (no host fetch) — the serving/bench
        path queues many of these and fetches once; on the tunneled device
        a per-call fetch would dominate the measured latency.

        Default is the routed+restarting search; passing explicit
        ``entries`` selects the pure graph walk from those entry points
        (kernel-level testing / NMSLIB-walk parity)."""
        beam = min(self.beam, self._n)
        k = int(self.neighbors.shape[1])
        if entries is not None:
            # pure graph walk from explicit entries (kernel-level testing);
            # always in the walk space
            q = jnp.asarray(queries_dev, jnp.float32)
            if self.pca_dim:
                q = (q - self._mu) @ self._w
            max_steps = self.budget + beam * k + 8
            return _sw_search(
                q,
                self._walk_gallery,
                self._walk_sqnorm,
                self.neighbors,
                entries,
                beam=beam,
                budget=self.budget,
                max_steps=max_steps,
            )
        # PCA mode: the same ARITHMETIC budget buys D/P walk probes per
        # full-D equivalent (each PCA distance costs pca_dim/D of a full
        # one); the beam+1 exact rescores are charged at full weight.
        if self.pca_dim:
            walk_budget = min(
                self._n, max(1, self.budget - beam - 1) * self._budget_scale
            )
        else:
            walk_budget = self.budget
        # Every step expands >=1 beam slot and each beam entrant was a
        # counted evaluation, so <= budget + beam expansions can ever
        # happen; the cap below is a safety net, not the usual stop.
        max_steps = walk_budget + beam * k + 8
        q_full = jnp.asarray(queries_dev, jnp.float32)
        q_walk = (
            (q_full - self._mu) @ self._w if self.pca_dim else q_full
        )
        best_id, best_d, checked, front_ids = _sw_search_routed(
            q_walk,
            self._walk_gallery,
            self._walk_sqnorm,
            self.neighbors,
            self._sample_pool[: self._sample_size(walk_budget)],
            beam=beam,
            budget=walk_budget,
            max_steps=max_steps,
        )
        if not self.pca_dim:
            return best_id, best_d, checked
        return self._rescore_full(q_full, best_id, front_ids, checked)

    def _rescore_full(self, q_full, best_id, front_ids, checked_walk):
        return rescore_full_d(
            q_full, best_id, front_ids, checked_walk,
            self.gallery, self.gallery_sqnorm, self.pca_dim,
        )

    def search(self, queries: np.ndarray):
        from fast_image_recognition_tpu.search.base import SearchResult

        q = jnp.asarray(queries, jnp.float32)
        idx, dist, checked = self.search_device(q)
        return SearchResult(
            indices=np.asarray(idx, np.int32),
            distances=np.asarray(dist, np.float32),
            checked_fraction=np.asarray(checked, np.float32) / self._n,
        )
