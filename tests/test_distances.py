"""Distance kernel parity vs the scalar fp32 oracle
(qt_cpp/db_features.cpp:22-42), including partial feature windows."""

import numpy as np
import pytest

from fast_image_recognition_tpu.config import DistanceKind
from fast_image_recognition_tpu.data import make_synthetic_gallery
from fast_image_recognition_tpu.ops import (
    oracle_distance,
    oracle_pairwise,
    pairwise_distances,
)
from fast_image_recognition_tpu.ops.distances import window_distance_update
from fast_image_recognition_tpu.ops.fastmath import fasterlog2, fasterlog2_np

KINDS = [DistanceKind.L2, DistanceKind.CHI2, DistanceKind.KL]


@pytest.fixture(scope="module")
def small_sets():
    g, _ = make_synthetic_gallery(8, 8, 64, seed=11)
    q, _ = make_synthetic_gallery(8, 2, 64, seed=12)
    return q[:6], g[:40]


@pytest.mark.parametrize("kind", KINDS)
@pytest.mark.parametrize("window", [(0, None), (0, 32), (16, 48), (32, 64)])
def test_oracle_vs_vectorized_numpy(small_sets, kind, window):
    q, g = small_sets
    start, end = window
    dense = oracle_pairwise(q, g, start=start, end=end, kind=kind)
    for i in [0, 3]:
        for j in [0, 17, 39]:
            scalar = oracle_distance(q[i], g[j], start=start, end=end, kind=kind)
            np.testing.assert_allclose(dense[i, j], scalar, rtol=2e-5)


@pytest.mark.parametrize("kind", KINDS)
@pytest.mark.parametrize("window", [(0, None), (0, 32), (16, 48)])
def test_jax_matches_oracle(small_sets, kind, window):
    q, g = small_sets
    start, end = window
    got = np.asarray(pairwise_distances(q, g, start=start, end=end, kind=kind))
    want = oracle_pairwise(q, g, start=start, end=end, kind=kind)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-7)


def test_l2_fast_path_close_to_precise(small_sets):
    q, g = small_sets
    fast = np.asarray(pairwise_distances(q, g, precise=False))
    precise = np.asarray(pairwise_distances(q, g, precise=True))
    # bf16 inputs: expect ~1e-2 relative agreement on O(1e-3) distances
    np.testing.assert_allclose(fast, precise, rtol=0.05, atol=1e-4)


def test_l2_argmin_parity_fast_vs_precise():
    g, labels = make_synthetic_gallery(32, 16, 128, seed=2)
    q, qlabels = make_synthetic_gallery(32, 4, 128, seed=3)
    fast = np.asarray(pairwise_distances(q, g, precise=False)).argmin(1)
    precise = np.asarray(pairwise_distances(q, g, precise=True)).argmin(1)
    # top-1 decisions must agree between precisions on separable data
    # (bf16 may flip a couple of genuinely ambiguous probes)
    assert (labels[fast] == labels[precise]).mean() > 0.96


def test_window_refinement_identity(small_sets):
    """Refinement reuses stage-1 partial sums (ImageTesting.cpp:165-180):
    extending [0,32) to [0,64) must equal a fresh [0,64) distance."""
    q, g = small_sets
    d32 = pairwise_distances(q, g, start=0, end=32)
    d64 = window_distance_update(d32, q, g, start=32, end=64, total_start=0)
    want = np.asarray(pairwise_distances(q, g, start=0, end=64))
    np.testing.assert_allclose(np.asarray(d64), want, rtol=1e-5, atol=1e-8)


def test_fasterlog2_matches_c_formula():
    xs = np.asarray(
        [1e-6, 0.01, 0.3, 0.5, 1.0, 1.5, 2.0, 7.3, 100.0, 1e6], dtype=np.float32
    )
    got = np.asarray(fasterlog2(xs))
    want = fasterlog2_np(xs)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    # ... and the approximation itself is close to true log2
    np.testing.assert_allclose(got, np.log2(xs), atol=1.2e-2)


@pytest.mark.parametrize("kind", KINDS)
def test_streamed_topk_matches_dense(kind):
    from fast_image_recognition_tpu.ops.distances import streamed_topk

    g, _ = make_synthetic_gallery(16, 40, 64, seed=21)  # N=640
    q, _ = make_synthetic_gallery(16, 1, 64, seed=22)
    # tile_n=96 forces multiple tiles plus a ragged padded tail (640 = 6*96+64)
    d, i = streamed_topk(q, g, k=3, kind=kind, tile_n=96)
    d, i = np.asarray(d), np.asarray(i)
    dense = oracle_pairwise(q, g, kind=kind)
    want_i = np.argsort(dense, axis=1, kind="stable")[:, :3]
    want_d = np.take_along_axis(dense, want_i, axis=1)
    np.testing.assert_allclose(d, want_d, rtol=3e-5, atol=1e-7)
    # indices may swap under fp32 near-ties; distances above are the contract
    assert (np.abs(np.sort(d, 1) - d) < 1e-12).all()
    agree = (i == want_i).mean()
    assert agree > 0.95


@pytest.mark.parametrize("kind", [DistanceKind.CHI2, DistanceKind.KL])
def test_streamed_topk_window(kind):
    from fast_image_recognition_tpu.ops.distances import streamed_topk

    g, _ = make_synthetic_gallery(8, 16, 64, seed=31)
    q, _ = make_synthetic_gallery(8, 1, 64, seed=32)
    d, i = streamed_topk(q, g, k=1, start=0, end=32, kind=kind, tile_n=48)
    dense = oracle_pairwise(q, g, start=0, end=32, kind=kind)
    np.testing.assert_allclose(
        np.asarray(d)[:, 0], dense.min(axis=1), rtol=3e-5, atol=1e-7
    )


def test_chi2_blocked_pairwise_matches_single_tile():
    """The tiled chi2/KL path must agree with a one-tile computation."""
    from fast_image_recognition_tpu.ops.distances import _elementwise_blocked
    import jax.numpy as jnp

    g, _ = make_synthetic_gallery(8, 40, 32, seed=41)  # N=320
    q, _ = make_synthetic_gallery(8, 1, 32, seed=42)
    for kind in (DistanceKind.CHI2, DistanceKind.KL):
        want = oracle_pairwise(q, g, kind=kind) * g.shape[1]  # unnormalized
        got = np.asarray(_elementwise_blocked(jnp.asarray(q), jnp.asarray(g), kind))
        np.testing.assert_allclose(got, want, rtol=3e-5, atol=1e-6)
