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

``KDTreeMatcher`` is the host-side FLANN stand-in (a baseline, not the
product — like the reference's FLANN-on-CPU role): a randomized kd-forest
in flat numpy arrays with the best-first checks-budget traversal run
vectorized across the probe batch (per-probe binary heaps, lockstep
descent, bitmap dedup) — the numpy analogue of how the device kernels
replace pointer-chasing with dense batched ops.
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


class _FlatForest:
    """Randomized kd-forest stored as flat numpy arrays (structure-of-
    arrays) so the best-first search can run vectorized across a whole
    probe batch — the FLANN counterpart re-shaped for numpy's execution
    model the way the device kernels are shaped for the TPU's: no
    per-node Python objects, no per-probe interpreter loop.

    Build follows FLANN's recipe (KDTreeIndexParams randomization,
    ann.cpp:180): each split picks a random dimension among the
    ``top_dims`` highest-variance dims of a row *sample* and splits at
    the sampled mean; nodes smaller than ``small_node`` skip the
    variance scan and draw the split dim from a one-pass global
    high-variance pool (the deep levels are where a full per-node
    variance pass used to cost whole-dataset sweeps per level).
    Degenerate splits (duplicate-heavy columns) fall back to a count-
    median split of the node's own rows, which always produces two
    non-empty halves for nodes of >= 2 rows — so leaf sizes stay capped
    at ``leaf_size`` and the bail-to-leaf branch is a pure safety net.
    Worst case (noted per ADVICE r4): if that net ever fired,
    ``leaf_ids`` pads every leaf to the GLOBAL max leaf length, so one
    oversized leaf would tax every batched leaf gather; the count-median
    recursion is what prevents that state from being reachable."""

    def __init__(
        self,
        data: np.ndarray,
        num_trees: int,
        leaf_size: int,
        rng,
        top_dims: int = 5,
        sample: int = 128,
        pool_dims: int = 32,
    ):
        n, d = data.shape
        small_node = max(2 * sample, 4 * leaf_size)
        gpool = np.argpartition(data.var(axis=0), -min(pool_dims, d))[
            -min(pool_dims, d):
        ]
        dim_l, val_l, left_l, right_l, leaf_of = [], [], [], [], []
        leaves = []  # list of id arrays, padded later
        roots = []

        def new_node():
            dim_l.append(-1)
            val_l.append(0.0)
            left_l.append(-1)
            right_l.append(-1)
            leaf_of.append(-1)
            return len(dim_l) - 1

        for _ in range(num_trees):
            root = new_node()
            roots.append(root)
            stack = [(root, np.arange(n))]
            while stack:
                node, idx = stack.pop()
                if len(idx) <= leaf_size:
                    leaf_of[node] = len(leaves)
                    leaves.append(idx)
                    continue
                if len(idx) > small_node:
                    srows = rng.choice(idx, sample, replace=False)
                    sub = data[srows]
                    var = sub.var(axis=0)
                    cand = np.argpartition(var, -top_dims)[-top_dims:]
                    dim = int(rng.choice(cand))
                    val = float(sub[:, dim].mean())
                else:
                    dim = int(rng.choice(gpool))
                    val = float(data[idx, dim].mean())
                col = data[idx, dim]
                mask = col < val
                if not mask.any() or mask.all():
                    # degenerate: median split on the node's OWN rows
                    order = np.argsort(col)
                    half = len(idx) // 2
                    li, ri = idx[order[:half]], idx[order[half:]]
                    val = float(col[order[min(half, len(order) - 1)]])
                    if len(li) == 0 or len(ri) == 0:
                        leaf_of[node] = len(leaves)
                        leaves.append(idx)
                        continue
                else:
                    li, ri = idx[mask], idx[~mask]
                dim_l[node], val_l[node] = dim, val
                lnode, rnode = new_node(), new_node()
                left_l[node], right_l[node] = lnode, rnode
                stack.append((lnode, li))
                stack.append((rnode, ri))

        self.dim = np.asarray(dim_l, np.int32)
        self.val = np.asarray(val_l, np.float32)
        self.left = np.asarray(left_l, np.int32)
        self.right = np.asarray(right_l, np.int32)
        self.leaf_of = np.asarray(leaf_of, np.int32)
        self.roots = np.asarray(roots, np.int32)
        # degenerate fallbacks can leave an oversized leaf; pad to the max
        lmax = max((len(ids) for ids in leaves), default=leaf_size)
        self.leaf_size = max(leaf_size, lmax)
        self.leaf_ids = np.full((len(leaves), self.leaf_size), -1, np.int32)
        for i, ids in enumerate(leaves):
            self.leaf_ids[i, : len(ids)] = ids


def _heap_push(hb, hn, hs, rows, bound, node):
    """Vectorized binary-heap push: for each probe row in ``rows`` insert
    (bound, node) and sift up. All probes advance one swap per iteration
    (lockstep); finished probes drop out of the active set."""
    i = hs[rows].copy()
    hb[rows, i] = bound
    hn[rows, i] = node
    hs[rows] += 1
    r = rows
    while len(r):
        live = i > 0
        r, i = r[live], i[live]
        if not len(r):
            break
        p = (i - 1) // 2
        swap = hb[r, i] < hb[r, p]
        rs, is_, ps = r[swap], i[swap], p[swap]
        tb, tn = hb[rs, is_].copy(), hn[rs, is_].copy()
        hb[rs, is_], hn[rs, is_] = hb[rs, ps], hn[rs, ps]
        hb[rs, ps], hn[rs, ps] = tb, tn
        r, i = rs, ps


def _heap_pop(hb, hn, hs, rows):
    """Vectorized binary-heap pop for probe rows (all must be non-empty):
    returns (bound, node) of the root, then sifts the last element down.
    Invariant: every slot at index >= hs is +inf, so child comparisons
    need no size masks — out-of-size children always lose."""
    bound = hb[rows, 0].copy()
    node = hn[rows, 0].copy()
    last = hs[rows] - 1
    hb[rows, 0] = hb[rows, last]
    hn[rows, 0] = hn[rows, last]
    hb[rows, last] = np.inf
    hs[rows] -= 1
    r, i = rows, np.zeros(len(rows), np.int64)
    sz = hs[rows]
    while len(r):
        l = 2 * i + 1
        live = l < sz  # also guarantees l, l+1 are in-array (sz <= H-1)
        r, i, sz = r[live], i[live], sz[live]
        if not len(r):
            break
        l = 2 * i + 1
        lb, rb = hb[r, l], hb[r, l + 1]
        c = np.where(rb < lb, l + 1, l)
        cb = np.minimum(lb, rb)
        swap = cb < hb[r, i]
        rs, is_, cs = r[swap], i[swap], c[swap]
        tb, tn = hb[rs, is_].copy(), hn[rs, is_].copy()
        hb[rs, is_], hn[rs, is_] = hb[rs, cs], hn[rs, cs]
        hb[rs, cs], hn[rs, cs] = tb, tn
        r, i, sz = rs, cs, sz[swap]
    return bound, node


class KDTreeMatcher:
    """Host-side kd-forest baseline — the FLANN role ("flann" printouts,
    ann.cpp:172-196): ``KDTreeIndexParams(4)`` randomized trees with the
    ``SearchParams(checks)`` budget tied to ``imageCountToCheck``
    (ann.cpp:190). Best-first traversal over a priority queue shared across
    trees, counting true point-distance evaluations (deduplicated across
    trees, like FLANN's checked bitmap); the search stops when the budget
    is spent. ``image_count_to_check<=0`` = unlimited = exact.

    A host baseline by design (like the reference's FLANN-on-CPU role) —
    the TPU-native budgeted methods are DEM / proj_incsort / small_world."""

    def __init__(
        self,
        gallery_features: np.ndarray,
        leaf_size: int = 16,
        num_trees: int = 4,  # KDTreeIndexParams(4), ann.cpp:180
        image_count_to_check: int = 0,
        seed: int = 0,
    ):
        self.name = "flann"
        self.data = np.asarray(gallery_features, np.float32)
        self._n, self._d = self.data.shape
        self._norms = np.einsum("nd,nd->n", self.data, self.data)
        rng = np.random.default_rng(seed)
        self.forest = _FlatForest(self.data, num_trees, leaf_size, rng)
        self.set_budget(image_count_to_check)

    def set_budget(self, image_count_to_check: int) -> None:
        if image_count_to_check <= 0 or image_count_to_check > self._n:
            image_count_to_check = self._n
        self.checks = int(image_count_to_check)

    def _search_batch(self, q: np.ndarray):
        """Best-first kd-forest search, vectorized across the probe batch.

        Every probe runs the classic FLANN traversal — pop the smallest
        lower bound, descend greedily to a leaf queueing far siblings,
        evaluate the leaf's rows, repeat until the checks budget is spent
        or the popped bound proves no better row exists (min-heap => that
        pop certifies exactness). The batch executes those probes in
        LOCKSTEP: one vectorized heap pop per round, one lockstep descent
        (all probes step one tree level per iteration), one gathered
        leaf-distance evaluation ``|g|^2 - 2 g.q`` for the whole batch.
        Per-probe state (heap, visited bitmap, budget) stays exact, so
        semantics match the sequential walk — only the interpreter-loop
        cost is amortized ~B-fold."""
        f = self.forest
        B = q.shape[0]
        n, L = self._n, f.leaf_size
        qn = np.einsum("bd,bd->b", q, q)
        # per-probe binary heaps (grown on demand)
        H = 64
        hb = np.full((B, H), np.inf, np.float32)
        hn = np.zeros((B, H), np.int32)
        hs = np.zeros(B, np.int64)
        for root in f.roots:
            _heap_push(
                hb, hn, hs, np.arange(B),
                np.zeros(B, np.float32), np.full(B, root, np.int32),
            )
        visited = np.zeros((B, (n + 7) // 8), np.uint8)  # bitmap dedup
        best_d = np.full(B, np.inf, np.float32)
        best_i = np.full(B, -1, np.int64)
        checked = np.zeros(B, np.int64)
        active = np.ones(B, bool)
        while active.any():
            rows = np.nonzero(active)[0]
            # a probe is finished when its heap is empty, its budget is
            # spent, or the next bound certifies the current best
            done = hs[rows] == 0
            if not done.all():
                live = rows[~done]
                bound, node = _heap_pop(hb, hn, hs, live)
                certified = bound >= best_d[live]
                active[live[certified]] = False
                live, node = live[~certified], node[~certified]
                bound = bound[~certified]
            else:
                live = rows[:0]
            active[rows[done]] = False
            if len(live) == 0:
                continue
            # lockstep greedy descent: queue far sibling, step to near
            cur = node
            while True:
                internal = f.left[cur] >= 0
                if not internal.any():
                    break
                li, ci = live[internal], cur[internal]
                if hs.max() + 1 >= hb.shape[1]:  # grow heaps
                    pad = np.full_like(hb, np.inf)
                    hb = np.concatenate([hb, pad], axis=1)
                    hn = np.concatenate([hn, np.zeros_like(hn)], axis=1)
                diff = q[li, f.dim[ci]] - f.val[ci]
                near = np.where(diff < 0, f.left[ci], f.right[ci])
                far = np.where(diff < 0, f.right[ci], f.left[ci])
                _heap_push(
                    hb, hn, hs, li,
                    bound[internal] + diff * diff, far.astype(np.int32),
                )
                nxt = cur.copy()
                nxt[internal] = near
                cur = nxt
            # gathered leaf evaluation with exact per-probe budgets
            ids = f.leaf_ids[f.leaf_of[cur]]  # [b, L]
            safe = np.maximum(ids, 0)
            fresh = (ids >= 0) & (
                (visited[live[:, None], safe >> 3] >> (safe & 7)) & 1 == 0
            )
            room = (self.checks - checked[live])[:, None]
            keep = fresh & (np.cumsum(fresh, axis=1) <= room)
            kl, kp = np.nonzero(keep)
            kid = ids[kl, kp]
            np.bitwise_or.at(
                visited, (live[kl], kid >> 3), (1 << (kid & 7)).astype(np.uint8)
            )
            checked[live] += keep.sum(axis=1)
            dd = (
                self._norms[safe]
                - 2.0 * np.einsum("bld,bd->bl", self.data[safe], q[live])
                + qn[live, None]
            )
            dd[~keep] = np.inf
            j = np.argmin(dd, axis=1)
            cand_d = dd[np.arange(len(live)), j]
            better = cand_d < best_d[live]
            upd = live[better]
            best_d[upd] = cand_d[better]
            best_i[upd] = ids[better, j[better]]
            active[live[checked[live] >= self.checks]] = False
        return best_i, best_d, checked

    def search(self, queries: np.ndarray):
        from fast_image_recognition_tpu.search.base import SearchResult

        q = np.asarray(queries, np.float32)
        best_i, best_d, checked = self._search_batch(q)
        return SearchResult(
            indices=best_i.astype(np.int32),
            # window-mean squared distance of db_features.cpp:40
            distances=np.maximum(best_d, 0.0) / self._d,
            checked_fraction=checked.astype(np.float32) / self._n,
        )
