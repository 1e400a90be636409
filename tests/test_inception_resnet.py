"""InceptionResNetV2: the 1536-d flagship extractor (qt_cpp/db.h:79-91,
dnn_feature_extractor.py:19-56) — shapes, segments, taps, extractor and
text-format round trip."""

import jax.numpy as jnp
import numpy as np
import pytest

from fast_image_recognition_tpu.models import backbone_info, create_backbone
from fast_image_recognition_tpu.models.inception_resnet import (
    INCEPTION_RESNET_EMBED_DIM,
    create_inception_resnet_v2,
    default_taps_inception_resnet,
    inception_resnet_plan,
)

RES = 75  # smallest stem-valid resolution; keeps the CPU test tractable


@pytest.fixture(scope="module")
def model_vars():
    return create_inception_resnet_v2(0, seed=0, resolution=RES, dtype=jnp.float32)


def test_plan_and_info():
    plan = inception_resnet_plan()
    assert len(plan) == 1 + 10 + 1 + 20 + 1 + 10
    info = backbone_info("inception_resnet_v2")
    assert info["embedding_dim"] == 1536
    assert info["resolution"] == 299
    assert set(default_taps_inception_resnet()) <= {c["name"] for c in plan}


def test_forward_embedding_1536(model_vars):
    model, variables = model_vars
    x = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (2, RES, RES, 3)), jnp.float32
    )
    taps = default_taps_inception_resnet()
    out = model.apply(variables, x, taps=taps)
    assert out["embedding"].shape == (2, INCEPTION_RESNET_EMBED_DIM)
    assert np.isfinite(np.asarray(out["embedding"])).all()
    assert set(out["taps"]) == set(taps)
    # tap dims: B stack is 1088-wide, C stack 2080-wide
    assert out["taps"]["block17_10"].shape == (2, 1088)
    assert out["taps"]["block8_5"].shape == (2, 2080)


def test_segments_match_full(model_vars):
    model, variables = model_vars
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(1, RES, RES, 3)), jnp.float32
    )
    m = model.bind(variables)
    h = m.stem(x)
    mid = 12  # inside the block17 stack
    h = m.run_blocks(h, 0, mid)
    h = m.run_blocks(h, mid, len(inception_resnet_plan()))
    emb_seg = m.head_pool(h)
    emb_full = model.apply(variables, x)["embedding"]
    np.testing.assert_allclose(
        np.asarray(emb_seg), np.asarray(emb_full), rtol=1e-5, atol=1e-6
    )


def test_extractor_writes_1536d_gallery(tmp_path, model_vars):
    """The flagship produces the FEATURES_COUNT=1536 text galleries the C++
    half consumes (db.h:79-91; 3-line format dnn_feature_extractor.py:58-64)."""
    from fast_image_recognition_tpu.data.feature_io import load_feature_file
    from fast_image_recognition_tpu.data.feature_io import write_feature_file
    from fast_image_recognition_tpu.models.extractor import FeatureExtractor

    model, variables = model_vars
    ex = FeatureExtractor(
        "inception_resnet_v2", variables=variables, resolution=RES
    )
    assert ex.embedding_dim == 1536
    imgs = np.random.default_rng(2).integers(
        0, 255, (4, RES, RES, 3)
    ).astype(np.uint8)
    feats = ex.extract_normalized(imgs, batch_size=4)
    assert feats.shape == (4, 1536)
    np.testing.assert_allclose(np.linalg.norm(feats, axis=1), 1.0, rtol=1e-5)
    path = str(tmp_path / "gal1536.txt")
    write_feature_file(path, feats, np.asarray([0, 0, 1, 1]), ["a", "b"])
    db = load_feature_file(path, 1536)
    assert db.features.shape == (4, 1536)
