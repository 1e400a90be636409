"""The rest of the reference's backbone zoo (dnn_feature_extractor.py:19-56,
sequential_inference.py:361-389): VGG19, MobileNetV1, InceptionV3,
ResNet50/ResNet*V2 — shapes, taps, segment execution, factory wiring."""

import jax.numpy as jnp
import numpy as np
import pytest

from fast_image_recognition_tpu.models import backbone_info, create_backbone
from fast_image_recognition_tpu.models.resnet import (
    default_taps_resnet,
    resnet_plan,
)

# (name, test resolution, embedding dim)
FAMILIES = [
    ("vgg19", 64, 512),
    ("mobilenetv1", 64, 1024),
    ("resnet50", 64, 2048),
    ("resnet50v2", 64, 2048),
    ("inception_v3", 75, 2048),
]


@pytest.mark.parametrize("name,res,dim", FAMILIES)
def test_forward_taps_segments(name, res, dim):
    model, variables = create_backbone(name, 0, resolution=res,
                                       dtype=jnp.float32)
    info = backbone_info(name)
    assert info["embedding_dim"] == dim
    taps = info["taps"]
    x = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (2, res, res, 3)),
        jnp.float32,
    )
    out = model.apply(variables, x, taps=taps)
    assert out["embedding"].shape == (2, dim)
    assert np.isfinite(np.asarray(out["embedding"])).all()
    assert set(out["taps"]) == set(taps)

    # segment execution must reproduce the full forward
    m = model.bind(variables)
    h = m.stem(x)
    n = len(model.plan_configs() if hasattr(model, "plan_configs") else [])
    mid = max(1, n // 2)
    h = m.run_blocks(h, 0, mid)
    h = m.run_blocks(h, mid, n)
    emb_seg = m.head_pool(h)
    np.testing.assert_allclose(
        np.asarray(emb_seg), np.asarray(out["embedding"]), rtol=1e-5,
        atol=1e-6,
    )


def test_resnet152v2_plan_and_reference_taps():
    plan = resnet_plan("resnet152v2")
    assert len(plan) == 3 + 8 + 36 + 3
    # downsampling on the LAST block of stages 2-4 (keras v2 semantics)
    strides = {c["name"]: c["stride"] for c in plan}
    assert strides["conv2_block3"] == 2 and strides["conv2_block1"] == 1
    assert strides["conv4_block36"] == 2
    assert strides["conv5_block3"] == 1
    # the reference's exact tap list (sequential_inference.py:385)
    assert default_taps_resnet("resnet152v2") == [
        "conv4_block1", "conv4_block18", "conv4_block36",
    ]
    # v1 downsamples on the FIRST block of stages 3-5
    plan1 = resnet_plan("resnet50")
    strides1 = {c["name"]: c["stride"] for c in plan1}
    assert strides1["conv3_block1"] == 2 and strides1["conv2_block1"] == 1


def test_extractor_over_new_families():
    """Every zoo member must produce normalized gallery rows through the
    standard extractor path (the dnn_feature_extractor.py contract)."""
    from fast_image_recognition_tpu.models.extractor import FeatureExtractor

    name, res, dim = "vgg19", 64, 512
    model, variables = create_backbone(name, 0, resolution=res)
    ex = FeatureExtractor(name, variables=variables, resolution=res)
    imgs = np.random.default_rng(1).integers(0, 255, (4, res, res, 3)).astype(
        np.uint8
    )
    feats = ex.extract_normalized(imgs, batch_size=4)
    assert feats.shape == (4, dim)
    np.testing.assert_allclose(np.linalg.norm(feats, axis=1), 1.0, rtol=1e-5)


def test_caffe_preprocessing_for_vgg_and_resnet_v1():
    """VGG19 / ResNet50-v1 use Keras 'caffe' preprocess_input: RGB->BGR +
    channel means, no std (dnn_feature_extractor.py:20-23, 41-43)."""
    from fast_image_recognition_tpu.models.efficientnet import (
        CAFFE_MEAN_BGR,
        preprocess_images_caffe,
    )
    from fast_image_recognition_tpu.models.extractor import FeatureExtractor

    assert backbone_info("vgg19")["preprocess"] == "caffe"
    assert backbone_info("resnet50")["preprocess"] == "caffe"
    assert backbone_info("resnet50v2")["preprocess"] == "tf"

    imgs = np.random.default_rng(2).integers(0, 255, (2, 64, 64, 3)).astype(
        np.uint8
    )
    x = np.asarray(preprocess_images_caffe(jnp.asarray(imgs, jnp.float32)))
    # channel flip + mean subtraction
    np.testing.assert_allclose(
        x[..., 0], imgs[..., 2].astype(np.float32) - CAFFE_MEAN_BGR[0]
    )
    # extractor wires it through
    model, variables = create_backbone("vgg19", 0, resolution=64,
                                       dtype=jnp.float32)
    ex = FeatureExtractor("vgg19", variables=variables, resolution=64)
    got = ex.extract(imgs, batch_size=2)
    want = np.asarray(
        model.apply(variables, preprocess_images_caffe(
            jnp.asarray(imgs, jnp.float32)))["embedding"]
    )
    # the extractor's internal module computes in bf16; the reference
    # forward above is fp32 — compare at bf16 precision
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)
