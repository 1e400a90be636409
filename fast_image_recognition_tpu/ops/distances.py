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
    elif kind == DistanceKind.CHI2:
        qw = q[:, None, :]
        gw = g[None, :, :]
        s = qw + gw
        d = jnp.where(s > 0, jnp.square(qw - gw) / jnp.where(s > 0, s, 1.0), 0.0)
        d = jnp.sum(d, axis=-1)
    else:
        qw = q[:, None, :]
        gw = g[None, :, :]
        s = qw + gw
        safe = jnp.where(s > 0, s, 1.0)
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
        d = jnp.sum(ta + tb, axis=-1)
    return d / width


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
