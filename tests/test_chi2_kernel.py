"""Parity tests for the streamed chi-square Pallas kernel
(ops/chi2_kernel.py) against the fp64 scalar-faithful oracle
(ops/distances.py, re-implementing qt_cpp/db_features.cpp:27-42)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from fast_image_recognition_tpu.ops.chi2_kernel import chi2_nn  # noqa: E402
from fast_image_recognition_tpu.ops.distances import (  # noqa: E402
    DistanceKind,
    oracle_pairwise,
)


def _features(n, d, seed):
    """Non-negative L2-normalized rows — the loader's contract
    (db_features.cpp:80-101 on pooled-relu embeddings)."""
    rng = np.random.default_rng(seed)
    x = np.abs(rng.standard_normal((n, d))).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


@pytest.mark.parametrize("n,d,b", [(300, 64, 5), (1024, 128, 17)])
def test_chi2_nn_matches_oracle(n, d, b):
    g = _features(n, d, 0)
    q = _features(b, d, 1)
    od = oracle_pairwise(q, g, kind=DistanceKind.CHI2)
    dist, idx = chi2_nn(jnp.asarray(q), jnp.asarray(g))
    assert np.array_equal(np.asarray(idx), od.argmin(1))
    np.testing.assert_allclose(
        np.asarray(dist), od.min(1), rtol=2e-5, atol=1e-7
    )


def test_chi2_nn_masks_padding():
    # n_valid must exclude zero-padded rows (a zero row has chi2 = sum q
    # which can undercut real rows)
    g = _features(40, 32, 2)
    q = _features(4, 32, 3)
    gp = np.concatenate([g, np.zeros((24, 32), np.float32)])
    od = oracle_pairwise(q, g, kind=DistanceKind.CHI2)
    _, idx = chi2_nn(jnp.asarray(q), jnp.asarray(gp), n_valid=40)
    assert np.array_equal(np.asarray(idx), od.argmin(1))


def test_chi2_nn_bf16_gallery_agrees():
    g = _features(512, 96, 4)
    q = _features(8, 96, 5)
    od = oracle_pairwise(q, g, kind=DistanceKind.CHI2)
    _, idx = chi2_nn(jnp.asarray(q), jnp.asarray(g, jnp.bfloat16))
    # bf16 storage rounds operands; top-1 must still agree on spread rows
    assert (np.asarray(idx) == od.argmin(1)).mean() >= 0.9
