"""Symmetric int8 row quantization for the gallery match path.

The match kernel is MXU-bound at production scale (measured: 1M x 1536
bf16 at ~81% of v5e bf16 peak), and the v5e MXU runs int8 contractions at
2x the bf16 rate with half the HBM stream — so an int8-quantized gallery
scan is the next rung of the serving-speed ladder. The reference has no
quantized path (its scalar loops are bandwidth-bound either way,
qt_cpp/db_features.cpp:319-335); this is a TPU-native extension in the
same spirit as its PCA prefix truncation (db_features.cpp:164): a cheap
approximate scan that proposes candidates, followed by an exact rescore.

Scheme: per-row symmetric absmax — ``q_i8[i, :] = round(x[i, :] / s[i])``
with ``s[i] = max|x[i, :]| / 127``. Dot products reconstruct as
``s_q * s_g[j] * dot_i32`` exactly up to the rounding of the inputs; the
L2 expansion keeps the TRUE ``|g|^2`` (computed pre-quantization) so the
only approximation is the cross term.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def quantize_rows(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-row symmetric int8 quantization.

    Returns (values int8 [N, D], scales fp32 [N]) with
    ``values[i] * scales[i] ~= x[i]``. All-zero rows get scale 1 (values
     0) so dequantization never divides by zero.
    """
    x = jnp.asarray(x)
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=1)
    scales = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q = jnp.clip(
        jnp.round(x.astype(jnp.float32) / scales[:, None]), -127, 127
    ).astype(jnp.int8)
    return q, scales


def dequantize_rows(values: jax.Array, scales: jax.Array) -> jax.Array:
    """Inverse of :func:`quantize_rows` (fp32)."""
    return values.astype(jnp.float32) * scales[:, None]
