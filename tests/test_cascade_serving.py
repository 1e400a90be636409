"""CascadeRecognitionService: early-exit recognition serving.

Covers the one-dispatch taps -> ratio-rule exits -> survivor-compaction
pipeline (reference ideas: multi-exit backbones of
tf_keras/sequential_inference.py:456-508 + the d1/d2 ratio acceptance of
qt_cpp/ImageTesting.cpp:533-535, recast as fused TPU serving). On RANDOM
weights the tap readouts are uninformative, so the safety property under
test is: no exit fires, every probe reaches the final level, and the
answers equal the exact packed-PCA service's. The fire path is exercised
white-box by planting a zero-distance readout."""

import numpy as np
import pytest

from fast_image_recognition_tpu.serving import (
    build_cascade_service,
    build_service,
)

BATCH = 16
RES = 32
N_GAL = 512


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    images = (rng.random((BATCH, RES, RES, 3)) * 255).astype(np.float32)
    probe = build_service(
        "b0", np.eye(8, 1280, dtype=np.float32), resolution=RES,
        match="exact",
    )
    emb = probe.embed(images)
    gal = rng.normal(size=(N_GAL, emb.shape[1])).astype(np.float32)
    gal /= np.linalg.norm(gal, axis=1, keepdims=True)
    true_idx = rng.choice(N_GAL, size=BATCH, replace=False)
    gal[true_idx] = emb
    # same seed as the probe service => identical weights => the planted
    # rows are the cascade's own final-level embeddings
    svc = build_cascade_service(
        "b0", gal, resolution=RES, pca_dim=32, rescore=8, pca_sample=256,
        calib_total=64, calib_batch=32,
    )
    return svc, images, gal, true_idx


def test_structure(setup):
    svc, *_ = setup
    assert svc.num_levels == 3  # two taps + final
    assert len(svc._readouts) == 2
    assert svc.segments[0][0] == 0
    assert svc.segments[-1][1] == len(svc._configs)
    # segments tile the block ladder with no gaps
    for (a, b), (c, d) in zip(svc.segments[:-1], svc.segments[1:]):
        assert b == c


def test_random_weights_reach_final_and_match_exact(setup):
    """Safety: uninformative readouts must not fire the ratio rule, and
    the final level must reproduce the exact service's packed-PCA match."""
    svc, images, gal, true_idx = setup
    idx, lab, stats = svc.identify(images)
    assert lab is None
    # every probe exited at the final level with the planted answer
    assert stats["break_counts"][-1] == pytest.approx(1.0)
    assert stats["forced_fraction"] == 0.0
    np.testing.assert_array_equal(idx, true_idx)


def test_capacity_overflow_forces_exits(setup):
    """Tight capacities must force-exit the overflow (counted), keeping
    the dispatch shape static."""
    svc, images, gal, true_idx = setup
    caps = (BATCH, 4, 4)
    idx, _, stats = svc.identify(images, capacities=caps)
    # nothing fires on random weights, so level-0 overflow = BATCH - 4
    assert stats["forced_fraction"] == pytest.approx((BATCH - 4) / BATCH)
    counts = np.asarray(stats["break_counts"]) * BATCH
    assert counts[0] == BATCH - 4
    assert counts[-1] == 4


def test_planted_readout_fires_level0(setup):
    """White-box: a readout predicting gallery row 5 exactly gives d1=0
    => ratio 0 < 0.7 => every probe exits at level 0 with row 5."""
    import jax.numpy as jnp

    svc, images, gal, true_idx = setup
    saved = svc._readouts
    try:
        fake = []
        for A in saved:
            z = np.zeros(A.shape, np.float32)
            z[-1] = gal[5]
            fake.append(jnp.asarray(z))
        svc._readouts = fake
        svc._fused_fns = {}
        idx, _, stats = svc.identify(images)
        assert stats["break_counts"][0] == pytest.approx(1.0)
        np.testing.assert_array_equal(idx, np.full(BATCH, 5))
    finally:
        svc._readouts = saved
        svc._fused_fns = {}


def test_pad_tiles_never_win_rescore():
    """Regression (ADVICE r4): galleries small enough to shrink _tile_g
    below the 1024-row pad granularity create whole all-padding tiles;
    with rescore >= #valid tiles those tiles' argmins (zero rows, exact
    d = 1.0) entered the rescore and beat every real row whenever the
    true NN distance exceeded 1.0 (typical for an unplanted gallery:
    d = 2 - 2cos ~ 2). Pad candidates must be masked to +inf."""
    rng = np.random.default_rng(3)
    images = (rng.random((BATCH, RES, RES, 3)) * 255).astype(np.float32)
    n = 300  # pads to 1024; _tile_g shrinks to 128 => 5 all-pad tiles
    gal = rng.normal(size=(n, 1280)).astype(np.float32)
    gal /= np.linalg.norm(gal, axis=1, keepdims=True)
    labels = np.arange(n, dtype=np.int32) % 37
    svc = build_cascade_service(
        "b0", gal, labels, resolution=RES, pca_dim=32, rescore=16,
        pca_sample=256, calib_total=64, calib_batch=32, d2_rule="class",
    )
    assert svc._tile_g < 1024  # the shrink actually happened
    idx, lab, stats = svc.identify(images)
    assert np.all(idx < n), f"pad row leaked into top-1: {idx}"
    assert np.all(np.asarray(lab) == labels[np.asarray(idx)])
    # random weights: fail closed, everyone reaches the final level
    assert stats["break_counts"][-1] == pytest.approx(1.0)
    # the bug's signature: every real row has d ~ 2 - 2cos ~ 2 here, so
    # unmasked pad rows (exact d = 1.0) would win EVERY probe -> the
    # idx < n assertion above is the discriminating check; additionally
    # the chosen rows must be real rows with plausible distances
    exact = build_service("b0", gal, resolution=RES, match="exact")
    emb = np.asarray(exact.embed(images), np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    d_chosen = ((emb - gal[np.asarray(idx)]) ** 2).sum(-1)
    assert np.all(np.isfinite(d_chosen)) and np.all(d_chosen > 1.0)


def test_calibrate_sizes_capacities(setup):
    svc, images, *_ = setup
    fracs = svc.calibrate(images, slack=1.2)
    assert len(fracs) == svc.num_levels - 1
    # random weights: everyone survives every ratio test
    assert all(f == pytest.approx(1.0) for f in fracs)
    caps = svc.capacities_for(BATCH)
    assert caps[0] == BATCH and all(c <= BATCH for c in caps)


# --------------------------------------------------------------------- #
# level-gallery mode (per-tap galleries, serving.py mode='level')        #
# --------------------------------------------------------------------- #


def _norm_np(x):
    x = np.asarray(x, np.float32)
    return x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-30)


def test_level_gallery_exact_probe_exits_level0():
    """Probes identical to the enrolled instances must all exit at level 0
    with the right identity: d1 ~ sigma while d2 spans classes."""
    import jax.numpy as jnp

    from fast_image_recognition_tpu.data.synthetic_device import device_dataset
    from fast_image_recognition_tpu.models import backbone_info, create_backbone
    from fast_image_recognition_tpu.serving import (
        CascadeRecognitionService,
        make_tap_embed_fn,
    )

    res, k, per = 32, 12, 8
    info = backbone_info("b0")
    model, variables = create_backbone("b0", 0, resolution=res)
    taps = ["block4a", "block5c"]
    fwd = make_tap_embed_fn(model, variables, res, taps)
    imgs, _ = device_dataset(k, 1, res, seed=0, chunk=12)
    feats, emb = fwd(imgs)
    rng = np.random.default_rng(0)

    def mk_gal(e):
        rows = np.repeat(_norm_np(e), per, axis=0)
        rows += (1e-4 / np.sqrt(rows.shape[1])) * rng.standard_normal(
            rows.shape
        ).astype(np.float32)
        return rows / np.linalg.norm(rows, axis=1, keepdims=True)

    g_labels = np.repeat(np.arange(k), per).astype(np.int32)
    svc = CascadeRecognitionService(
        model, variables, info, mk_gal(emb), labels=g_labels,
        resolution=res, taps=taps, galleries=[mk_gal(f) for f in feats],
        d2_rule="class", rescore=8, ratio=0.7,
    )
    assert svc.mode == "level" and svc.grid == 1
    svc.calibrate(imgs, slack=1.5)
    idx, plabels, stats = svc.identify(imgs)
    assert np.array_equal(plabels, np.arange(k))
    assert stats["break_counts"][0] == pytest.approx(1.0)


def test_level_gallery_rejects_misaligned_rows():
    from fast_image_recognition_tpu.models import backbone_info, create_backbone
    from fast_image_recognition_tpu.serving import CascadeRecognitionService

    info = backbone_info("b0")
    model, variables = create_backbone("b0", 0, resolution=32)
    g_final = _norm_np(np.random.default_rng(0).standard_normal((64, info["embedding_dim"])))
    bad_tap = _norm_np(np.random.default_rng(1).standard_normal((32, 80)))
    with pytest.raises(ValueError, match="row-aligned"):
        CascadeRecognitionService(
            model, variables, info, g_final, resolution=32,
            taps=["block4a"], galleries=[bad_tap],
        )
