"""Fast math approximations.

``fasterlog2`` is the bit-hack log2 approximation the reference uses for the
FPNN log-density sums (qt_cpp/classification.cpp:64-79, Paul Mineiro's
fastapprox family). Reproduced with ``lax.bitcast_convert_type`` so the FPNN
classifier's outputs match the reference numerically, and because on the VPU
it is still cheaper than a transcendental ``log``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def fasterlog2(x: jax.Array) -> jax.Array:
    """Elementwise float32 approximation of log2(x); matches
    classification.cpp:64-73 bit-for-bit in exact arithmetic."""
    x = jnp.asarray(x, dtype=jnp.float32)
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    mantissa_bits = (bits & np.uint32(0x007FFFFF)) | np.uint32(0x7E << 23)
    m = jax.lax.bitcast_convert_type(mantissa_bits, jnp.float32)
    y = bits.astype(jnp.float32) * jnp.float32(1.0 / (1 << 23))
    return (
        y
        - jnp.float32(124.22544637)
        - jnp.float32(1.498030302) * m
        - jnp.float32(1.72587999) / (jnp.float32(0.3520887068) + m)
    )


def fasterlog2_np(x: np.ndarray) -> np.ndarray:
    """NumPy oracle for fasterlog2 (same bit manipulation)."""
    x = np.asarray(x, dtype=np.float32)
    bits = x.view(np.uint32)
    mantissa_bits = (bits & np.uint32(0x007FFFFF)) | np.uint32(0x7E << 23)
    m = mantissa_bits.view(np.float32)
    y = bits.astype(np.float32) * np.float32(1.0 / (1 << 23))
    return (
        y
        - np.float32(124.22544637)
        - np.float32(1.498030302) * m
        - np.float32(1.72587999) / (np.float32(0.3520887068) + m)
    ).astype(np.float32)
