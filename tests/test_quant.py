"""Int8-quantized gallery scan (ops/quant.py + the quant tile-min kernel):
quantization numerics, candidate containment vs the bf16 tile-min, and
exact-rescored top-k agreement with the fp32 reference path."""

import jax.numpy as jnp
import numpy as np
import pytest

from fast_image_recognition_tpu.ops.distance_kernel import (
    gallery_sq_norms,
    pad_gallery,
    quant_gallery_scales,
    tile_min_l2_quant,
    topk_l2,
    topk_l2_quant,
)
from fast_image_recognition_tpu.ops.quant import dequantize_rows, quantize_rows


def test_quantize_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    x = rng.normal(0, 0.1, (64, 256)).astype(np.float32)
    x[3] = 0.0  # all-zero row must not divide by zero
    q, s = quantize_rows(x)
    assert q.dtype == jnp.int8
    back = np.asarray(dequantize_rows(q, s))
    # symmetric rounding: |err| <= scale/2 elementwise
    err = np.abs(back - x)
    bound = np.asarray(s)[:, None] / 2 + 1e-8
    assert (err <= bound).all()
    assert np.asarray(s)[3] == 1.0 and (np.asarray(q)[3] == 0).all()


def _planted(n, d, b, seed=0, sigma=0.15):
    """Class-clustered gallery + probes near known rows (the face-gallery
    regime the match path serves)."""
    rng = np.random.default_rng(seed)
    g = rng.normal(0, 1, (n, d)).astype(np.float32)
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    true = rng.choice(n, b, replace=False)
    p = g[true] + sigma * rng.normal(0, 1, (b, d)).astype(np.float32) / np.sqrt(d)
    return g, p.astype(np.float32), true


@pytest.mark.parametrize("compute", ["int8", "bf16"])
def test_quant_topk_matches_exact_on_planted(compute):
    n, d, b = 4096, 256, 64
    g, p, true = _planted(n, d, b)
    gal = pad_gallery(jnp.asarray(g, jnp.bfloat16))
    q_i8, scales = quantize_rows(g)
    gal_q = pad_gallery(q_i8)
    gsq = gallery_sq_norms(jnp.asarray(g), n)
    gsc = quant_gallery_scales(scales, n)

    dq, iq = topk_l2_quant(
        jnp.asarray(p), gal_q, gsq, gsc, gal, k=1, r=16, compute=compute
    )
    dx, ix = topk_l2(jnp.asarray(p), jnp.asarray(g), k=1, precise=True)
    agree = float(np.mean(np.asarray(iq)[:, 0] == np.asarray(ix)[:, 0]))
    assert agree == 1.0
    assert (np.asarray(iq)[:, 0] == true).all()
    np.testing.assert_allclose(
        np.asarray(dq)[:, 0], np.asarray(dx)[:, 0], rtol=5e-2, atol=1e-4
    )


def test_quant_tilemin_contains_near_nn():
    """Pure-random (hardest case: distances nearly tie): the true NN's tile
    must appear among the best few tiles despite int8 rounding."""
    n, d, b = 8192, 128, 32
    rng = np.random.default_rng(3)
    g = rng.normal(0, 1, (n, d)).astype(np.float32)
    p = rng.normal(0, 1, (b, d)).astype(np.float32)
    q_i8, scales = quantize_rows(g)
    d_t, i_t = tile_min_l2_quant(
        jnp.asarray(p),
        pad_gallery(q_i8),
        gallery_sq_norms(jnp.asarray(g), n),
        quant_gallery_scales(scales, n),
    )
    _, ix = topk_l2(jnp.asarray(p), jnp.asarray(g), k=1, precise=True)
    true_tile = np.asarray(ix)[:, 0] // 1024
    order = np.argsort(np.asarray(d_t), axis=1)
    rank = np.argmax(order == true_tile[:, None], axis=1)
    assert float(np.mean(rank < 4)) >= 0.9


def test_quant_topk_k_gt_1():
    # k candidates come one-per-tile: need n/1024 >= r >= k
    n, d, b = 8192, 128, 16
    g, p, _ = _planted(n, d, b, seed=5)
    q_i8, scales = quantize_rows(g)
    dq, iq = topk_l2_quant(
        jnp.asarray(p),
        pad_gallery(q_i8),
        gallery_sq_norms(jnp.asarray(g), n),
        quant_gallery_scales(scales, n),
        pad_gallery(jnp.asarray(g, jnp.bfloat16)),
        k=4,
        r=8,
    )
    assert iq.shape == (b, 4) and dq.shape == (b, 4)
    d_np = np.asarray(dq)
    assert (np.diff(d_np, axis=1) >= -1e-6).all()  # ascending


def test_bruteforce_matcher_int8():
    """Matcher-level surface: precision='int8' must agree with the fp32
    matcher on a separable recognition workload."""
    from fast_image_recognition_tpu.search.brute_force import BruteForceMatcher

    n, d, b = 4096, 256, 48
    g, p, true = _planted(n, d, b, seed=9)
    m8 = BruteForceMatcher(g, precision="int8")
    mf = BruteForceMatcher(g)
    r8 = m8.search(p)
    rf = mf.search(p)
    assert (r8.indices == rf.indices).all()
    assert (r8.indices == true).all()
    np.testing.assert_allclose(r8.distances, rf.distances, rtol=5e-2, atol=1e-4)
    with pytest.raises(ValueError):
        BruteForceMatcher(g, max_features=128, precision="int8")
