"""Distance kernels (reference: qt_cpp/db_features.cpp:22-42).

``feature_distance(lhs, rhs, start, end)`` in the reference is a scalar fp32
loop computing, over the feature window [start, end):

- L2:   sum (a-b)^2
- chi2: sum (a-b)^2 / (a+b)            where a+b > 0
- KL:   sum a*log(2a/(a+b)) + b*log(2b/(a+b)), each term gated on > 0

normalized by the window length. **Partial windows are the primitive under
every sequential / three-way-decision method** (TWD prefix refinement,
ImageTesting.cpp:224-243; PNN 32-dim chunks, classification.cpp:245-266).

This module provides:
- ``oracle_distance`` — bit-faithful scalar fp32 sequential accumulation
  (the parity anchor for all tests);
- ``oracle_pairwise`` — vectorized float64 NumPy for larger tolerance checks;
- ``pairwise_distances`` — the jnp implementation: L2 goes through the MXU
  via the |q|^2 + |g|^2 - 2 q.g expansion, chi2/KL are VPU elementwise.

The production path (streamed gallery blocks, fused top-k, HBM-resident
gallery) is the Pallas kernel in ``ops/distance_kernel.py``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from fast_image_recognition_tpu.config import DistanceKind


# ---------------------------------------------------------------------------
# NumPy oracles
# ---------------------------------------------------------------------------

def oracle_distance(
    lhs: np.ndarray,
    rhs: np.ndarray,
    start: int = 0,
    end: int | None = None,
    kind: DistanceKind = DistanceKind.L2,
) -> np.float32:
    """Scalar fp32 sequential accumulation, semantically identical to
    qt_cpp/db_features.cpp:22-42 (same operation order, same dtype)."""
    lhs = np.asarray(lhs, dtype=np.float32)
    rhs = np.asarray(rhs, dtype=np.float32)
    if end is None:
        end = lhs.shape[-1]
    dist = np.float32(0)
    for i in range(start, end):
        a = lhs[i]
        b = rhs[i]
        if kind == DistanceKind.L2:
            dist += (a - b) * (a - b)
        else:
            s = a + b
            if s > 0:
                if kind == DistanceKind.CHI2:
                    dist += (a - b) * (a - b) / s
                else:  # KL (the commented variant, db_features.cpp:33-36)
                    if a > 0:
                        dist += a * np.float32(np.log(2 * a / s))
                    if b > 0:
                        dist += b * np.float32(np.log(2 * b / s))
    return np.float32(dist / np.float32(end - start))


def oracle_pairwise(
    queries: np.ndarray,
    gallery: np.ndarray,
    start: int = 0,
    end: int | None = None,
    kind: DistanceKind = DistanceKind.L2,
) -> np.ndarray:
    """Vectorized float64 NumPy pairwise distances [B, N]."""
    q = np.asarray(queries, dtype=np.float64)
    g = np.asarray(gallery, dtype=np.float64)
    if end is None:
        end = q.shape[-1]
    qw = q[:, None, start:end]
    gw = g[None, :, start:end]
    if kind == DistanceKind.L2:
        d = ((qw - gw) ** 2).sum(-1)
    elif kind == DistanceKind.CHI2:
        s = qw + gw
        d = np.where(s > 0, (qw - gw) ** 2 / np.where(s > 0, s, 1.0), 0.0).sum(-1)
    else:
        s = qw + gw
        safe = np.where(s > 0, s, 1.0)
        ta = np.where((s > 0) & (qw > 0), qw * np.log(2 * np.where(qw > 0, qw, 1.0) / safe), 0.0)
        tb = np.where((s > 0) & (gw > 0), gw * np.log(2 * np.where(gw > 0, gw, 1.0) / safe), 0.0)
        d = (ta + tb).sum(-1)
    return d / (end - start)


# ---------------------------------------------------------------------------
# JAX implementations
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("start", "end", "kind", "precise"))
def pairwise_distances(
    queries: jax.Array,
    gallery: jax.Array,
    start: int = 0,
    end: int | None = None,
    kind: DistanceKind = DistanceKind.L2,
    precise: bool = True,
) -> jax.Array:
    """Pairwise window distances [B, N] on device.

    L2 uses the MXU-friendly expansion ``|q|^2 + |g|^2 - 2 q.g`` over the
    static window; ``precise=True`` keeps fp32 accumulation
    (``HIGHEST`` matmul precision) for parity with the scalar reference,
    ``precise=False`` lets the MXU run bf16 inputs / fp32 accumulate for
    speed. chi2/KL are elementwise on the VPU.
    """
    if end is None:
        end = queries.shape[-1]
    width = end - start
    q = jax.lax.slice_in_dim(queries, start, end, axis=1)
    g = jax.lax.slice_in_dim(gallery, start, end, axis=1)
    if kind == DistanceKind.L2:
        prec = jax.lax.Precision.HIGHEST if precise else jax.lax.Precision.DEFAULT
        if not precise:
            q = q.astype(jnp.bfloat16)
            g = g.astype(jnp.bfloat16)
        cross = jax.lax.dot_general(
            q,
            g,
            dimension_numbers=(((1,), (1,)), ((), ())),
            precision=prec,
            preferred_element_type=jnp.float32,
        )
        qn = jnp.sum(jnp.square(q.astype(jnp.float32)), axis=1, keepdims=True)
        gn = jnp.sum(jnp.square(g.astype(jnp.float32)), axis=1, keepdims=True).T
        d = qn + gn - 2.0 * cross
        d = jnp.maximum(d, 0.0)
    else:
        d = _elementwise_blocked(q, g, kind)
    return d / width


def _elementwise_tile(q: jax.Array, g_tile: jax.Array, kind: DistanceKind) -> jax.Array:
    """Unnormalized chi2/KL sums for one gallery tile: [B, D] x [T, D] -> [B, T].

    These distances have no matmul form, so they run on the VPU; the [B, T, D]
    broadcast is bounded by the tile size (the full [B, N, D] broadcast OOMs at
    production gallery sizes — db_features.cpp:29-36 scaled because it was one
    scalar pair at a time)."""
    qw = q[:, None, :]
    gw = g_tile[None, :, :]
    s = qw + gw
    safe = jnp.where(s > 0, s, 1.0)
    if kind == DistanceKind.CHI2:
        d = jnp.where(s > 0, jnp.square(qw - gw) / safe, 0.0)
        return jnp.sum(d, axis=-1)
    ta = jnp.where(
        (s > 0) & (qw > 0),
        qw * jnp.log(2.0 * jnp.where(qw > 0, qw, 1.0) / safe),
        0.0,
    )
    tb = jnp.where(
        (s > 0) & (gw > 0),
        gw * jnp.log(2.0 * jnp.where(gw > 0, gw, 1.0) / safe),
        0.0,
    )
    return jnp.sum(ta + tb, axis=-1)


def _elementwise_block_size(b: int, d: int, budget_elems: int = 1 << 26) -> int:
    """Gallery tile size keeping the [B, tile, D] broadcast under ~256 MB fp32."""
    tile = max(128, budget_elems // max(b * d, 1))
    return (tile // 128) * 128 or 128


def _elementwise_blocked(q: jax.Array, g: jax.Array, kind: DistanceKind) -> jax.Array:
    """chi2/KL pairwise sums [B, N] computed gallery-tile-by-tile."""
    b, dim = q.shape
    n = g.shape[0]
    tile = _elementwise_block_size(b, dim)
    if n <= tile:
        return _elementwise_tile(q, g, kind)
    n_tiles = -(-n // tile)
    g_pad = jnp.pad(g, ((0, n_tiles * tile - n), (0, 0)))
    tiles = g_pad.reshape(n_tiles, tile, dim)
    d = jax.lax.map(lambda gt: _elementwise_tile(q, gt, kind), tiles)
    return jnp.moveaxis(d, 0, 1).reshape(b, n_tiles * tile)[:, :n]


@partial(jax.jit, static_argnames=("k", "start", "end", "kind", "tile_n"))
def streamed_topk(
    queries: jax.Array,
    gallery: jax.Array,
    k: int = 1,
    start: int = 0,
    end: int | None = None,
    kind: DistanceKind = DistanceKind.CHI2,
    tile_n: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Top-k smallest window distances over an arbitrarily large gallery
    without materializing [B, N] (or [B, N, D] for chi2/KL): a ``lax.scan``
    streams gallery tiles and carries a running [B, k] candidate set — the
    same ring-shaped loop as the Pallas L2 kernel, usable for the distances
    that have no MXU form (chi2/KL, db_features.cpp:29-36).

    Returns (distances [B, k], indices [B, k]) with window-mean semantics.
    """
    if end is None:
        end = queries.shape[-1]
    width = end - start
    q = jax.lax.slice_in_dim(queries, start, end, axis=1).astype(jnp.float32)
    g = jax.lax.slice_in_dim(gallery, start, end, axis=1).astype(jnp.float32)
    b, dim = q.shape
    n = g.shape[0]
    if tile_n is None:
        tile_n = _elementwise_block_size(b, dim)
    n_tiles = -(-n // tile_n)
    g_pad = jnp.pad(g, ((0, n_tiles * tile_n - n), (0, 0)))
    tiles = g_pad.reshape(n_tiles, tile_n, dim)

    big = jnp.float32(3.4e38)

    def step(carry, inp):
        best_d, best_i = carry  # [B, k]
        t, g_tile = inp
        offset = t * tile_n
        if kind == DistanceKind.L2:
            cross = jax.lax.dot_general(
                q, g_tile, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            d = (
                jnp.sum(q * q, axis=1, keepdims=True)
                + jnp.sum(g_tile * g_tile, axis=1)[None, :]
                - 2.0 * cross
            )
            d = jnp.maximum(d, 0.0)
        else:
            d = _elementwise_tile(q, g_tile, kind)
        idx = offset + jnp.arange(tile_n, dtype=jnp.int32)[None, :]
        d = jnp.where(idx < n, d, big)  # mask padding rows
        cat_d = jnp.concatenate([best_d, d], axis=1)
        cat_i = jnp.concatenate([best_i, jnp.broadcast_to(idx, d.shape)], axis=1)
        neg_top, pos = jax.lax.top_k(-cat_d, k)
        return (-neg_top, jnp.take_along_axis(cat_i, pos, axis=1)), None

    init = (
        jnp.full((b, k), big, dtype=jnp.float32),
        jnp.full((b, k), -1, dtype=jnp.int32),
    )
    (best_d, best_i), _ = jax.lax.scan(
        step, init, (jnp.arange(n_tiles, dtype=jnp.int32), tiles)
    )
    return best_d / width, best_i


def window_distance_update(
    partial_sum: jax.Array,
    queries: jax.Array,
    gallery: jax.Array,
    start: int,
    end: int,
    total_start: int,
    kind: DistanceKind = DistanceKind.L2,
) -> jax.Array:
    """Extend running window-mean distances from [total_start, start) to
    [total_start, end), reusing the existing partial sums — the refinement
    identity of ImageTesting.cpp:165-180:

        d_new = (d_old * (start-total_start) + d_delta * (end-start)) / (end-total_start)
    """
    old_w = start - total_start
    new_w = end - total_start
    delta = pairwise_distances(queries, gallery, start=start, end=end, kind=kind)
    return (partial_sum * old_w + delta * (end - start)) / new_w
