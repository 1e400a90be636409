"""Mesh-sharded gallery search with top-k merge over ICI.

The TP analog of SURVEY.md §2.3: the [N, D] gallery is sharded on N across
the ``gallery`` mesh axis (each chip holds an HBM-resident slice), every
chip runs the fused Pallas distance/top-k kernel over its local slice, and
the per-chip top-k candidate sets — k entries each, not the full score
row — are merged with one ``all_gather`` over ICI followed by an O(devices*k)
selection. Communication per query is ``devices * k * 8`` bytes regardless
of gallery size.

Queries can additionally be sharded over the ``data`` axis (pure DP — no
collective needed on that axis since each query's result is independent).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fast_image_recognition_tpu.ops.distance_kernel import (
    pack_gallery_aug,
    pad_gallery,
    topk_candidates_l2_packed,
    topk_l2,
)

BIG_DIST = 3.4e38


def _merge_gathered(
    gat_d: jax.Array,  # [S, B, k] distances from all shards
    gat_i: jax.Array,  # [S, B, k] global indices from all shards
    k: int,
) -> Tuple[jax.Array, jax.Array]:
    s, b, _ = gat_d.shape
    flat_d = jnp.moveaxis(gat_d, 0, 1).reshape(b, s * k)
    flat_i = jnp.moveaxis(gat_i, 0, 1).reshape(b, s * k)
    merged_d, pos = jax.lax.top_k(-flat_d, k)
    merged_i = jnp.take_along_axis(flat_i, pos, axis=1)
    return -merged_d, merged_i


def sharded_topk_l2(
    queries: jax.Array,
    gallery_sharded: jax.Array,  # [N_pad, D] sharded over 'gallery' on dim 0
    mesh: Mesh,
    k: int = 1,
    *,
    n_valid_per_shard: Optional[np.ndarray] = None,
    window: Optional[Tuple[int, int]] = None,
    precise: bool = False,
    tile_g: int = 512,
    axes: Tuple[str, ...] = ("gallery",),
) -> Tuple[jax.Array, jax.Array]:
    """Global top-k over a gallery sharded across ``mesh`` axes ``axes``.

    ``gallery_sharded`` must already be placed with
    ``NamedSharding(mesh, P(axes, None))`` and row-padded so each shard has
    the same row count (use ``shard_gallery``). Returns global (distances
    [B, k], indices [B, k]) — indices refer to the unpadded concatenated
    gallery.

    Multi-slice galleries (SURVEY.md §5 distributed backend): pass
    ``axes=('dcn', 'gallery')`` over a 2-axis mesh — each slice's chips
    merge over ICI first ('gallery' is the minor/fastest axis), then one
    k-sized candidate set per slice crosses DCN; the all_gather over the
    flattened axes realizes exactly that two-level merge with per-query
    traffic of ``total_shards * k * 8`` bytes.
    """
    n_shards = 1
    for a in axes:
        n_shards *= mesh.shape[a]
    rows_per_shard = gallery_sharded.shape[0] // n_shards
    if n_valid_per_shard is None:
        n_valid_per_shard = np.full(n_shards, rows_per_shard, dtype=np.int32)
    nv = jnp.asarray(n_valid_per_shard, dtype=jnp.int32)

    def local_search(q, g_local, nv_local):
        shard = jax.lax.axis_index(axes)
        # Rows beyond this shard's valid count are zero padding whose
        # distance (|q|^2/width) can undercut real matches — they must be
        # masked inside the kernel (n_valid), not after top-k extraction.
        d, i = topk_l2(
            q,
            g_local,
            k=k,
            n_valid=nv_local[0],
            window=window,
            precise=precise,
            tile_g=tile_g,
        )
        valid = i < nv_local[0]
        d = jnp.where(valid, d, BIG_DIST)
        i = jnp.where(valid, i + shard * rows_per_shard, -1)
        # k candidates per shard cross the interconnect (ICI within the
        # minor axis; DCN only for the major axis of a multi-slice mesh)
        gat_d = jax.lax.all_gather(d, axes)  # [S, B, k]
        gat_i = jax.lax.all_gather(i, axes)
        return _merge_gathered(gat_d, gat_i, k)

    fn = jax.shard_map(
        local_search,
        mesh=mesh,
        in_specs=(P(), P(axes, None), P(axes)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    # topk_l2 already returns final window-mean distances per shard.
    return fn(queries, gallery_sharded, nv)


def shard_gallery_pca_aug(
    gallery_sharded: jax.Array,  # [S*rows, D] bf16/f32, sharded on dim 0
    n_valid_per_shard: np.ndarray,
    mesh: Mesh,
    mu: jax.Array,  # [D] PCA mean
    w: jax.Array,  # [D, P] PCA components
    *,
    tile_g: int = 1024,
    axes: Tuple[str, ...] = ("gallery",),
) -> jax.Array:
    """Per-shard augmented PCA gallery for the packed tile-min scan.

    Each shard projects its full-D slice into the PCA space and packs it
    with ``pack_gallery_aug`` (augmented |g|^2 columns, per-shard padding
    rows masked at 1e38) in ONE shard_map — no host round trip, no
    cross-shard traffic. The result is sharded identically to the input
    gallery, so the packed candidate scan below is fully shard-local."""
    nv = jnp.asarray(n_valid_per_shard, dtype=jnp.int32)
    mu32 = jnp.asarray(mu, jnp.float32)
    w32 = jnp.asarray(w, jnp.float32)

    def project_pack(g_local, nv_local):
        gp = (g_local.astype(jnp.float32) - mu32) @ w32
        return pack_gallery_aug(gp, nv_local[0], tile_g=tile_g)

    return jax.shard_map(
        project_pack,
        mesh=mesh,
        in_specs=(P(axes, None), P(axes)),
        out_specs=P(axes, None),
        check_vma=False,
    )(gallery_sharded, nv)


def sharded_topk_pca_packed(
    queries: jax.Array,  # [B, D] fp32 (full-D embeddings)
    gal_aug_sharded: jax.Array,  # shard_gallery_pca_aug(...) output
    gallery_sharded: jax.Array,  # [S*rows, D] full-D rows (exact rescore)
    mesh: Mesh,
    mu: jax.Array,
    w: jax.Array,  # [D, P]
    *,
    k: int = 1,
    rescore: int = 48,
    n_valid_per_shard: Optional[np.ndarray] = None,
    tile_g: int = 1024,
    select: str = "exact",
    axes: Tuple[str, ...] = ("gallery",),
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Global top-k via the e2e-winning candidates+rescore plan, sharded.

    Per shard: the packed single-reduce tile-min scan over the local
    PCA-projected slice yields ``rescore`` candidate rows, which are
    rescored EXACTLY against the shard's own full-D bf16 rows (candidates
    are shard-local, so the rescore needs no cross-chip gather); only the
    per-shard top-k (d, global index) pairs — ``shards * k * 8`` bytes per
    query — cross the interconnect in one ``all_gather``, followed by the
    O(shards*k) merge. Same communication volume as ``sharded_topk_l2``
    with ~pca_dim/D of its per-chip FLOPs and HBM stream.

    Returns (window-mean squared distances [B, k], global indices [B, k]).
    Exactness contract matches the single-chip pca path: the true NN is
    contained up to bf16 scan rounding, then rescored exactly — and the
    merge is over exact rescored values, so sharding adds no further
    approximation. Reference role: db_features.cpp:164 extractPCA +
    SURVEY.md §2.3 gallery axis."""
    n_shards = 1
    for a in axes:
        n_shards *= mesh.shape[a]
    rows_per_shard = gallery_sharded.shape[0] // n_shards
    if n_valid_per_shard is None:
        n_valid_per_shard = np.full(n_shards, rows_per_shard, dtype=np.int32)
    nv = jnp.asarray(n_valid_per_shard, dtype=jnp.int32)
    pca_dim = int(w.shape[1])
    d_full = int(queries.shape[1])
    qf = jnp.asarray(queries, jnp.float32)
    qp = (qf - jnp.asarray(mu, jnp.float32)) @ jnp.asarray(w, jnp.float32)
    qsq = jnp.einsum("bd,bd->b", qf, qf, preferred_element_type=jnp.float32)

    def local_search(q, q_pca, q_sq, ga_local, g_local, nv_local):
        shard = jax.lax.axis_index(axes)
        cand = topk_candidates_l2_packed(
            q_pca, ga_local, pca_dim, rescore,
            tile_g=tile_g, select=select, interpret=interpret,
        )  # [B, R] shard-local row ids
        rows = jnp.take(g_local, cand, axis=0)  # [B, R, D]
        cross = jnp.einsum(
            "bd,brd->br", q.astype(rows.dtype), rows,
            preferred_element_type=jnp.float32,
        )
        rsq = jnp.einsum(
            "brd,brd->br", rows, rows, preferred_element_type=jnp.float32
        )
        dloc = (rsq - 2.0 * cross + q_sq[:, None]) / d_full
        # padding rows (possible only when a shard has < R valid rows)
        dloc = jnp.where(cand < nv_local[0], dloc, BIG_DIST)
        kk = min(k, dloc.shape[1])
        neg_top, pos = jax.lax.top_k(-dloc, kk)
        top_i = jnp.take_along_axis(cand, pos, axis=1)
        top_d = -neg_top
        top_i = jnp.where(
            top_d < BIG_DIST / 2, top_i + shard * rows_per_shard, -1
        )
        gat_d = jax.lax.all_gather(top_d, axes)  # [S, B, k]
        gat_i = jax.lax.all_gather(top_i, axes)
        return _merge_gathered(gat_d, gat_i, kk)

    fn = jax.shard_map(
        local_search,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(axes, None), P(axes, None), P(axes)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(qf, qp, qsq, gal_aug_sharded, gallery_sharded, nv)


def shard_gallery(
    gallery: np.ndarray,
    mesh: Mesh,
    tile_g: int = 512,
    dtype=jnp.bfloat16,
    axes: Tuple[str, ...] = ("gallery",),
) -> Tuple[jax.Array, np.ndarray]:
    """Pad + place a host gallery across the mesh's gallery axes.

    Returns (device array [S*rows, D] sharded on dim 0, per-shard valid row
    counts)."""
    n_shards = 1
    for a in axes:
        n_shards *= mesh.shape[a]
    n, d = gallery.shape
    rows = -(-n // n_shards)  # ceil
    rows = -(-rows // tile_g) * tile_g  # round up to kernel tile
    n_valid = np.asarray(
        [max(0, min(rows, n - s * rows)) for s in range(n_shards)],
        dtype=np.int32,
    )
    padded = np.zeros((n_shards * rows, d), dtype=np.float32)
    padded[:n] = gallery
    sharding = NamedSharding(mesh, P(axes, None))
    arr = jax.device_put(jnp.asarray(padded, dtype=dtype), sharding)
    return arr, n_valid


class ShardedGalleryMatcher:
    """Matcher-protocol wrapper: exact 1-NN over a mesh-sharded gallery."""

    def __init__(
        self,
        gallery_features: np.ndarray,
        mesh: Mesh,
        kind=None,  # only L2 is accelerated; kept for API symmetry
        precise: bool = False,
        tile_g: int = 512,
    ):
        self.name = f"BF(sharded x{mesh.shape['gallery']})"
        self.mesh = mesh
        self.precise = precise
        self.tile_g = tile_g
        dtype = jnp.float32 if precise else jnp.bfloat16
        self.gallery, self.n_valid = shard_gallery(
            gallery_features, mesh, tile_g=tile_g, dtype=dtype
        )
        self._n = gallery_features.shape[0]

    def set_budget(self, image_count_to_check: int) -> None:
        pass

    def search(self, queries: np.ndarray):
        from fast_image_recognition_tpu.search.base import SearchResult

        q = jnp.asarray(queries, dtype=jnp.float32)
        d, i = sharded_topk_l2(
            q,
            self.gallery,
            self.mesh,
            k=1,
            n_valid_per_shard=self.n_valid,
            precise=self.precise,
            tile_g=self.tile_g,
        )
        b = int(q.shape[0])
        return SearchResult(
            indices=np.asarray(i)[:, 0],
            distances=np.asarray(d)[:, 0],
            checked_fraction=np.ones(b, dtype=np.float32),
        )
