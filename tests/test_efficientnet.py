"""EfficientNet backbone: shapes, taps, segment execution, preprocessing.

Reference parity targets: pooled_features_only extraction
(dnn_feature_extractor.py:120-122), MEAN/STDDEV_RGB preprocessing (116-119),
exit taps + shared forward pass (sequential_inference.py:359, 418-435).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_image_recognition_tpu.models import (
    VARIANTS,
    create_efficientnet,
    default_taps,
    preprocess_images,
)
from fast_image_recognition_tpu.models.efficientnet import (
    MEAN_RGB,
    STDDEV_RGB,
    block_plan,
    round_filters,
    round_repeats,
)


@pytest.fixture(scope="module")
def b0():
    return create_efficientnet("b0", num_classes=7, resolution=32)


def test_scaling_math():
    # canonical EfficientNet scaling values
    assert round_filters(32, 1.0) == 32
    assert round_filters(32, 1.1) == 32  # b2 stem (rounding keeps 32)
    assert round_filters(32, 2.0) == 64  # b7 stem
    assert round_filters(1280, 2.0) == 2560  # b7 head
    assert round_repeats(3, 3.1) == 10
    assert len(block_plan("b0")) == 16
    assert len(block_plan("b7")) == 55


def test_param_count_b0(b0):
    _, variables = b0
    n = sum(p.size for p in jax.tree.leaves(variables["params"]))
    # 4.0M backbone + 1280*7 head ~= 4.03M (official b0 is 5.3M with a
    # 1000-class head: 4.0M + 1.28M)
    assert 3.9e6 < n < 4.2e6


def test_forward_shapes_and_taps(b0):
    model, variables = b0
    taps = default_taps("b0")
    x = jnp.ones((2, 32, 32, 3), dtype=jnp.float32)
    out = model.apply(variables, x, taps=taps)
    assert out["embedding"].shape == (2, 1280)
    assert out["embedding"].dtype == jnp.float32
    assert out["logits"].shape == (2, 7)
    assert set(out["taps"].keys()) == set(taps)
    # taps must be GAP vectors over the block output channels
    plan = {b["name"]: b for b in block_plan("b0")}
    for name, emb in out["taps"].items():
        assert emb.shape == (2, plan[name]["out_filters"])


def test_segment_execution_matches_full(b0):
    """run_blocks over [0,k) then [k,end) must equal the full forward — the
    cascade's resume-where-you-stopped contract
    (sequential_inference.py:418-435)."""
    model, variables = b0
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 32, 32, 3))

    def full(v, x):
        return model.apply(v, x, train=False)["embedding"]

    def segmented(v, x, split):
        def run(v, x):
            m = model.bind(v)
            h = m.stem(x.astype(m.dtype))
            h = m.run_blocks(h, 0, split)
            h = m.run_blocks(h, split, len(m.blocks))
            return m.head_pool(h)

        return run(v, x)

    want = full(variables, x)
    got = segmented(variables, x, 5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-2, atol=1e-4)


def test_preprocess_parity():
    img = np.full((1, 8, 8, 3), 128.0, dtype=np.float32)
    out = np.asarray(preprocess_images(jnp.asarray(img)))
    want = (128.0 - np.asarray(MEAN_RGB)) / np.asarray(STDDEV_RGB)
    np.testing.assert_allclose(out[0, 0, 0], want, rtol=1e-6)


def test_preprocess_resize():
    img = jnp.ones((2, 16, 16, 3))
    out = preprocess_images(img, resolution=8)
    assert out.shape == (2, 8, 8, 3)


def test_train_step_updates_batch_stats(b0):
    model, variables = b0
    x = jnp.ones((2, 32, 32, 3))
    out, mutated = model.apply(
        variables,
        x,
        train=True,
        rngs={
            "stochastic_depth": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
        },
        mutable=["batch_stats"],
    )
    assert "batch_stats" in mutated
    before = jax.tree.leaves(variables["batch_stats"])[0]
    after = jax.tree.leaves(mutated["batch_stats"])[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_default_taps_exist_for_all_variants():
    for v in VARIANTS:
        names = {b["name"] for b in block_plan(v)}
        for t in default_taps(v):
            assert t in names


def test_extractor_end_to_end():
    from fast_image_recognition_tpu.models.extractor import FeatureExtractor

    ex = FeatureExtractor("b0", resolution=32)
    imgs = np.random.default_rng(0).integers(0, 255, (5, 32, 32, 3), dtype=np.uint8)
    feats = ex.extract_normalized(imgs, batch_size=4)
    assert feats.shape == (5, 1280)
    np.testing.assert_allclose(np.linalg.norm(feats, axis=1), 1.0, atol=1e-4)
    # determinism
    feats2 = ex.extract_normalized(imgs, batch_size=2)
    np.testing.assert_allclose(feats, feats2, atol=1e-5)


def test_remat_grad_and_parity():
    """remat=True must not change outputs and must support grad (the
    jax.checkpoint memory/FLOPs trade for fine-tuning big variants)."""
    from fast_image_recognition_tpu.models.efficientnet import EfficientNet

    model = EfficientNet(variant="b0", num_classes=0, remat=True)
    x = jnp.ones((2, 32, 32, 3))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x)

    def loss(p):
        return model.apply(
            {"params": p, "batch_stats": variables["batch_stats"]}, x
        )["embedding"].sum()

    g = jax.grad(loss)(variables["params"])
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(g))
    plain = EfficientNet(variant="b0", num_classes=0, remat=False)
    np.testing.assert_allclose(
        np.asarray(model.apply(variables, x)["embedding"]),
        np.asarray(plain.apply(variables, x)["embedding"]),
        rtol=1e-5,
    )


def test_tap_presets_orderable():
    """Both tap presets name real blocks in network order for every
    variant, and 'early' starts strictly earlier than 'deep' (the
    compute-saving ladder of bench --exits early)."""
    for variant in ("b0", "b3", "b7"):
        plan = [b["name"] for b in block_plan(variant)]
        pos = {n: i for i, n in enumerate(plan)}
        deep = default_taps(variant)
        early = default_taps(variant, preset="early")
        for taps in (deep, early):
            idx = [pos[t] for t in taps]
            assert idx == sorted(idx) and len(set(idx)) == len(idx)
        assert pos[early[0]] < pos[deep[0]]
        # the early ladder's first exit is in stage 3 — the cheap end
        stage = {b["name"]: b["stage"] for b in block_plan(variant)}
        assert stage[early[0]] == 3
