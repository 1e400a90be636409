"""RecognitionService: the fused extract+match serving surface.

Covers the one-jit raw-images -> gallery-rows path the e2e bench ships
(reference flow: qt_cpp/dnn_feature_extractor.py:127-128 feature dump +
qt_cpp/main.cpp match, collapsed into one device program)."""

import numpy as np
import pytest

from fast_image_recognition_tpu.serving import build_service


@pytest.fixture(scope="module")
def setup():
    """Small b0 service over a gallery that CONTAINS the probe images'
    own embeddings (planted rows), so the true 1-NN is known."""
    service = None
    rng = np.random.default_rng(0)
    images = (rng.random((8, 32, 32, 3)) * 255).astype(np.float32)
    # build with a throwaway gallery first to get embeddings cheaply
    dim_probe = build_service(
        "b0", np.eye(8, 1280, dtype=np.float32), resolution=32, match="exact"
    )
    emb = dim_probe.embed(images)
    n = 512
    gal = rng.normal(size=(n, emb.shape[1])).astype(np.float32)
    gal /= np.linalg.norm(gal, axis=1, keepdims=True)
    true_idx = rng.choice(n, size=len(images), replace=False)
    gal[true_idx] = emb
    labels = rng.integers(0, 10, n).astype(np.int32)
    service = build_service(
        "b0", gal, labels, resolution=32, match="pca", pca_dim=32, rescore=8,
        pca_sample=256,
    )
    return service, images, gal, true_idx, labels


def test_identify_finds_planted_rows(setup):
    service, images, gal, true_idx, labels = setup
    idx, lab = service.identify(images)
    np.testing.assert_array_equal(idx, true_idx)
    np.testing.assert_array_equal(lab, labels[true_idx])


def test_pca_match_agrees_with_exact(setup):
    service, images, gal, true_idx, labels = setup
    exact = build_service(
        "b0", gal, resolution=32, match="exact"
    )
    # same weights so embeddings match: reuse the pca service's params
    exact.sparams = service.sparams
    idx_pca, _ = service.identify(images)
    idx_exact, _ = exact.identify(images)
    np.testing.assert_array_equal(idx_pca, idx_exact)


def test_embed_normalized(setup):
    service, images, *_ = setup
    emb = service.embed(images)
    np.testing.assert_allclose(
        np.linalg.norm(emb, axis=1), 1.0, rtol=1e-5
    )


def test_match_flops_positive(setup):
    service, *_ = setup
    assert service.match_flops(8) > 0
    assert service.match_flops(16) == 2 * service.match_flops(8)


def test_int8_match_finds_planted_rows(setup):
    """match='int8' (quantized scan + exact bf16 rescore) recovers the
    planted true rows — int8 rounding only perturbs the candidate scan,
    and the rescore is exact."""
    service, images, gal, true_idx, labels = setup
    q = build_service("b0", gal, labels, resolution=32, match="int8")
    q.sparams = service.sparams
    idx, lab = q.identify(images)
    np.testing.assert_array_equal(idx, true_idx)
    np.testing.assert_array_equal(lab, labels[true_idx])


@pytest.mark.parametrize("pca_scan", ["bf16", "int8", "packed"])
def test_pca_scan_variants_find_planted_rows(setup, pca_scan):
    """The cheaper candidate-scan precisions (bf16 reduction passes /
    int8 quantized gallery) must still recover the planted rows — the
    full-D exact rescore absorbs scan rounding."""
    service, images, gal, true_idx, labels = setup
    v = build_service(
        "b0", gal, labels, resolution=32, match="pca", pca_dim=32,
        rescore=8, pca_sample=256, pca_scan=pca_scan,
    )
    v.sparams = service.sparams
    idx, lab = v.identify(images)
    np.testing.assert_array_equal(idx, true_idx)
    np.testing.assert_array_equal(lab, labels[true_idx])


def test_pca_approx_select_finds_planted_rows(setup):
    """select='approx' (lax.approx_min_k tile selection) keeps the planted
    1-NN in the candidate set — its tile ranks #1 by a wide margin."""
    service, images, gal, true_idx, labels = setup
    v = build_service(
        "b0", gal, labels, resolution=32, match="pca", pca_dim=32,
        rescore=8, pca_sample=256, select="approx",
    )
    v.sparams = service.sparams
    idx, _ = v.identify(images)
    np.testing.assert_array_equal(idx, true_idx)


def test_escalation_exact_on_pca_hostile_gallery(setup):
    """A pca_dim=2 packed scan over an unplanted random gallery misses
    the true 1-NN almost surely; the second-min certificate must detect
    every such probe and escalate to the exact full-D scan, making the
    default packed path EXACT regardless of workload (VERDICT r4 #6)."""
    service, images, gal, true_idx, labels = setup
    rng = np.random.default_rng(11)
    hostile = rng.normal(size=gal.shape).astype(np.float32)
    hostile /= np.linalg.norm(hostile, axis=1, keepdims=True)
    esc = build_service(
        "b0", hostile, resolution=32, match="pca", pca_dim=2, rescore=2,
        pca_sample=256, pca_scan="packed",
    )
    esc.sparams = service.sparams
    assert esc.escalate is not None  # packed+exact-select default ON
    exact = build_service("b0", hostile, resolution=32, match="exact")
    exact.sparams = service.sparams
    idx_esc, _ = esc.identify(images)
    idx_exact, _ = exact.identify(images)
    np.testing.assert_array_equal(idx_esc, idx_exact)
    # teeth: the UNescalated pca_dim=2 path really does miss here
    off = build_service(
        "b0", hostile, resolution=32, match="pca", pca_dim=2, rescore=2,
        pca_sample=256, pca_scan="packed", escalate=None,
    )
    off.sparams = service.sparams
    idx_off, _ = off.identify(images)
    assert (idx_off != idx_exact).any()


def test_sharded_match_agrees_with_exact(setup):
    """match='sharded' (8-way gallery shards + ICI top-k merge) returns
    the same rows as the single-device exact path."""
    service, images, gal, true_idx, labels = setup
    sharded = build_service("b0", gal, labels, resolution=32, match="sharded")
    sharded.sparams = service.sparams
    idx, lab = sharded.identify(images)
    np.testing.assert_array_equal(idx, true_idx)
    np.testing.assert_array_equal(lab, labels[true_idx])
