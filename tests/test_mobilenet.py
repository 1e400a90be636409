"""MobileNetV2 family: module behavior, folding, pruning surgery, cascade
segments — parity of the family-generic machinery with the second backbone
(reference pruning subject: keras_finetune_prune.py:895-928; zoo member:
dnn_feature_extractor.py:19-56)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_image_recognition_tpu.models import (
    backbone_info,
    create_backbone,
    default_taps_for,
)
from fast_image_recognition_tpu.models.inference import (
    fold_backbone,
    folded_forward,
    make_infer_fn,
)
from fast_image_recognition_tpu.models.mobilenet import (
    _make_divisible,
    create_mobilenetv2,
    default_taps_mobilenet,
    mobilenet_plan,
)
from fast_image_recognition_tpu.models.pruning import (
    parameter_count,
    prune_backbone,
)

RES = 64  # small resolution keeps CPU-mesh tests fast; all shapes stay valid


@pytest.fixture(scope="module")
def model_vars():
    return create_mobilenetv2(1.0, 0, seed=0, resolution=RES, dtype=jnp.float32)


def test_plan_structure():
    plan = mobilenet_plan(1.0)
    assert len(plan) == 17  # 1+2+3+4+3+3+1
    assert plan[0]["expand"] == 1 and plan[0]["out_filters"] == 16
    assert plan[-1]["out_filters"] == 320
    strides = [b["stride"] for b in plan]
    assert strides.count(2) == 4  # stages 2,3,4,6 downsample
    assert all(b["activation"] == "relu6" for b in plan)
    # width multiplier rounds to multiples of 8
    plan14 = mobilenet_plan(1.4)
    assert all(b["out_filters"] % 8 == 0 for b in plan14)
    assert plan14[-1]["out_filters"] == _make_divisible(320 * 1.4)


def test_forward_shapes_and_taps(model_vars):
    model, variables = model_vars
    taps = default_taps_mobilenet(1.0)
    x = jnp.asarray(np.random.default_rng(0).integers(0, 255, (2, RES, RES, 3)),
                    jnp.float32)
    out = model.apply(variables, x, taps=taps)
    assert out["embedding"].shape == (2, 1280)
    assert set(out["taps"]) == set(taps)
    assert np.isfinite(np.asarray(out["embedding"])).all()


def test_segment_execution_matches_full(model_vars):
    model, variables = model_vars
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, RES, RES, 3)),
                    jnp.float32)
    m = model.bind(variables)
    h = m.stem(x)
    mid = 8
    h1 = m.run_blocks(h, 0, mid)
    h2 = m.run_blocks(h1, mid, len(mobilenet_plan(1.0)))
    emb_seg = m.head_pool(h2)
    emb_full = model.apply(variables, x)["embedding"]
    np.testing.assert_allclose(np.asarray(emb_seg), np.asarray(emb_full),
                               rtol=1e-5, atol=1e-6)


def test_folded_forward_parity(model_vars):
    model, variables = model_vars
    folded, configs = fold_backbone(model, variables, dtype=jnp.float32)
    taps = tuple(default_taps_mobilenet(1.0))
    imgs = jnp.asarray(
        np.random.default_rng(2).integers(0, 255, (2, RES, RES, 3)), jnp.float32
    )
    got = folded_forward(folded, configs, imgs, taps=taps, resolution=RES,
                         dtype=jnp.float32)
    from fast_image_recognition_tpu.models.efficientnet import preprocess_images

    want = model.apply(variables, preprocess_images(imgs, RES), taps=taps)
    np.testing.assert_allclose(
        np.asarray(got["embedding"]), np.asarray(want["embedding"]),
        rtol=2e-4, atol=2e-4,
    )
    for t in taps:
        np.testing.assert_allclose(
            np.asarray(got["taps"][t]), np.asarray(want["taps"][t]),
            rtol=2e-4, atol=2e-4,
        )


def test_preprocess_fold_parity(model_vars):
    """fold_preprocess consumes raw uint8 images and must match the explicit
    preprocess pass (borders included — the correction map is a real conv)."""
    model, variables = model_vars
    imgs_u8 = np.random.default_rng(3).integers(0, 255, (2, RES, RES, 3)).astype(
        np.uint8
    )
    infer_pp, folded_pp = make_infer_fn(
        model, variables, resolution=RES, dtype=jnp.float32, fold_preprocess=True
    )
    infer_no, folded_no = make_infer_fn(
        model, variables, resolution=RES, dtype=jnp.float32, fold_preprocess=False
    )
    e1 = np.asarray(infer_pp(folded_pp, jnp.asarray(imgs_u8))["embedding"])
    e2 = np.asarray(
        infer_no(folded_no, jnp.asarray(imgs_u8, jnp.float32))["embedding"]
    )
    np.testing.assert_allclose(e1, e2, rtol=2e-4, atol=2e-4)


def test_pruning_surgery_mobilenet(model_vars):
    """The reference prunes MobileNetV2 by L1 kernel norm, 25% rounded to
    x16 (keras_finetune_prune.py:519-550) — surgery must shrink params and
    keep the forward finite with identical output shapes."""
    model, variables = model_vars
    before = parameter_count(variables)
    pruned_model, pruned_vars = prune_backbone(
        model, variables, fraction=0.25, metric="l1", round_to=16
    )
    after = parameter_count(pruned_vars)
    assert after < before
    x = jnp.asarray(np.random.default_rng(4).normal(size=(2, RES, RES, 3)),
                    jnp.float32)
    out = pruned_model.apply(pruned_vars, x)
    assert out["embedding"].shape == (2, 1280)
    assert np.isfinite(np.asarray(out["embedding"])).all()
    # pruned hidden widths are x16 multiples
    for name, width in dict(pruned_model.hidden_overrides).items():
        assert width % 16 == 0


def test_cascade_engine_over_mobilenet(model_vars):
    from fast_image_recognition_tpu.cascade.engine import (
        SequentialInferencePipeline,
    )

    model, variables = model_vars
    taps = default_taps_mobilenet(1.0)
    x = jnp.zeros((1, RES, RES, 3), jnp.float32)
    probe = model.apply(variables, x, taps=taps)
    dims = [int(probe["taps"][t].shape[-1]) for t in taps] + [
        int(probe["embedding"].shape[-1])
    ]
    rng = np.random.default_rng(5)
    coefs = [rng.normal(0, 0.1, (7, d)).astype(np.float32) for d in dims]
    intercepts = [np.zeros(7, np.float32) for _ in dims]
    pipe = SequentialInferencePipeline(
        model, variables, taps, coefs, intercepts,
        thresholds=[10.0] * (len(dims) - 1),  # never exit early -> final level
        buckets=(4,),
    )
    images = rng.normal(size=(4, RES, RES, 3)).astype(np.float32)
    res = pipe.predict(images)
    assert res.predictions.shape == (4,)
    assert (res.exit_level == len(dims) - 1).all()
    # exits at level 0 when thresholds are trivially low
    pipe2 = SequentialInferencePipeline(
        model, variables, taps, coefs, intercepts,
        thresholds=[-100.0] * (len(dims) - 1), buckets=(4,),
    )
    res2 = pipe2.predict(images)
    assert (res2.exit_level == 0).all()


def test_backbone_factory():
    info = backbone_info("mobilenetv2")
    assert info["embedding_dim"] == 1280 and info["family"] == "mobilenetv2"
    info14 = backbone_info("mobilenetv2_140")
    assert info14["embedding_dim"] == _make_divisible(1280 * 1.4)
    model, variables = create_backbone("mobilenetv2", resolution=RES,
                                       dtype=jnp.float32)
    assert model.width == 1.0
    assert default_taps_for("mobilenetv2") == default_taps_mobilenet(1.0)
    info_b0 = backbone_info("b0")
    assert info_b0["embedding_dim"] == 1280


def test_family_preprocessing_is_tf_mode(model_vars):
    """The reference zoo calls each member's own preprocess_input
    (dnn_feature_extractor.py:52-56); MobileNetV2's is 'tf' mode
    (x/127.5 - 1), not EfficientNet's MEAN/STDDEV constants."""
    from fast_image_recognition_tpu.models import backbone_info
    from fast_image_recognition_tpu.models.efficientnet import (
        TF_MODE_MEAN,
        TF_MODE_STD,
        preprocess_images,
    )
    from fast_image_recognition_tpu.models.extractor import FeatureExtractor

    assert backbone_info("mobilenetv2")["preprocess"] == "tf"
    assert backbone_info("inception_resnet_v2")["preprocess"] == "tf"
    assert backbone_info("b0")["preprocess"] == "torch"

    model, variables = model_vars
    imgs = np.random.default_rng(7).integers(0, 255, (2, RES, RES, 3)).astype(
        np.uint8
    )
    ex = FeatureExtractor("mobilenetv2", variables=variables, resolution=RES)
    got = ex.extract(imgs, batch_size=2)
    x = preprocess_images(
        jnp.asarray(imgs, jnp.float32), RES, mean=TF_MODE_MEAN, std=TF_MODE_STD
    )
    want = np.asarray(model.apply(variables, x)["embedding"])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
    # 'tf' preprocessing maps 0..255 to [-1, 1]
    assert float(jnp.max(jnp.abs(x))) <= 1.0 + 1e-6
