"""Live keras.applications parity for every converter family.

Builds the REAL stock keras implementation (random init — the pretrained
h5 blobs the reference loads at dnn_feature_extractor.py:45-48 are
unreachable offline), randomises ALL variables so every layer placement is
observable, exports them through the exact flat contract the converters
consume (utils/keras_live.py), and asserts OUR forward on the converted
weights matches keras' own forward on the same input. This is the
strongest offline substitute for real-checkpoint validation: it pins
layer names, auto-numbering origins, kernel layouts, padding choices,
BN placement/epsilon and scale=False gamma handling against keras itself.
"""

import numpy as np
import pytest

keras = pytest.importorskip("keras")

import jax.numpy as jnp  # noqa: E402

from fast_image_recognition_tpu.models import create_backbone  # noqa: E402
from fast_image_recognition_tpu.utils import keras_checkpoint as kc  # noqa: E402
from fast_image_recognition_tpu.utils.keras_live import (  # noqa: E402
    keras_weights_flat,
    randomize_keras_model,
)

# (our zoo name, keras ctor, test resolution, converter)
_CASES = [
    (
        "mobilenetv2",
        lambda res: keras.applications.MobileNetV2(
            weights=None, include_top=False, pooling="avg",
            input_shape=(res, res, 3),
        ),
        64,
        lambda w: kc.convert_keras_mobilenetv2(w, 1.0),
    ),
    (
        "mobilenetv1",
        lambda res: keras.applications.MobileNet(
            weights=None, include_top=False, pooling="avg",
            input_shape=(res, res, 3),
        ),
        64,
        lambda w: kc.convert_keras_mobilenet_v1(w, 1.0),
    ),
    (
        "vgg19",
        lambda res: keras.applications.VGG19(
            weights=None, include_top=False, pooling="avg",
            input_shape=(res, res, 3),
        ),
        64,
        kc.convert_keras_vgg19,
    ),
    (
        "resnet50",
        lambda res: keras.applications.ResNet50(
            weights=None, include_top=False, pooling="avg",
            input_shape=(res, res, 3),
        ),
        64,
        lambda w: kc.convert_keras_resnet(w, "resnet50"),
    ),
    (
        "resnet50v2",
        lambda res: keras.applications.ResNet50V2(
            weights=None, include_top=False, pooling="avg",
            input_shape=(res, res, 3),
        ),
        64,
        lambda w: kc.convert_keras_resnet(w, "resnet50v2"),
    ),
    (
        "resnet152v2",
        lambda res: keras.applications.ResNet152V2(
            weights=None, include_top=False, pooling="avg",
            input_shape=(res, res, 3),
        ),
        64,
        lambda w: kc.convert_keras_resnet(w, "resnet152v2"),
    ),
    (
        "inception_v3",
        lambda res: keras.applications.InceptionV3(
            weights=None, include_top=False, pooling="avg",
            input_shape=(res, res, 3),
        ),
        96,
        kc.convert_keras_inception_v3,
    ),
    (
        "inception_resnet_v2",
        lambda res: keras.applications.InceptionResNetV2(
            weights=None, include_top=False, pooling="avg",
            input_shape=(res, res, 3),
        ),
        96,
        kc.convert_keras_inception_resnet,
    ),
]


@pytest.mark.parametrize(
    "name,ctor,res,convert", _CASES, ids=[c[0] for c in _CASES]
)
def test_converted_forward_matches_keras(name, ctor, res, convert):
    # keras auto-numbering counters (conv2d, conv2d_1, ...) are global per
    # session; reset them so each inception model numbers from its own
    # origin like a standalone h5 export does.
    keras.backend.clear_session()
    km = ctor(res)
    randomize_keras_model(km, seed=7)
    flat = keras_weights_flat(km)
    variables = convert(flat)

    model, init_vars = create_backbone(name, 0, resolution=res,
                                       dtype=jnp.float32)
    # converted tree must be structurally complete vs a fresh init
    import jax

    got = {p for p, _ in jax.tree_util.tree_leaves_with_path(variables)}
    want = {p for p, _ in jax.tree_util.tree_leaves_with_path(init_vars)}
    assert got == want, (
        f"tree mismatch: missing={list(want - got)[:3]} "
        f"extra={list(got - want)[:3]}"
    )

    rng = np.random.default_rng(3)
    x = rng.uniform(-1.0, 1.0, (2, res, res, 3)).astype(np.float32)

    ours = np.asarray(
        model.apply(variables, jnp.asarray(x))["embedding"], np.float32
    )
    theirs = np.asarray(km(x, training=False), np.float32)
    assert ours.shape == theirs.shape
    # fp32 XLA vs fp32 TF kernels over 50-500 layers: small elementwise
    # drift, but any structural mismatch (layer swap, padding shift,
    # wrong BN pairing) destroys the correlation entirely.
    denom = np.linalg.norm(ours) * np.linalg.norm(theirs)
    cos = float((ours * theirs).sum() / denom)
    assert cos > 0.999, f"cosine {cos}"
    np.testing.assert_allclose(ours, theirs, rtol=5e-2, atol=5e-3)


def test_efficientnet_b0_converted_forward_matches_keras():
    """The flagship family, against keras' own EfficientNetB0. Keras bakes
    rescaling+normalization layers INTO the model, so it gets raw [0,255]
    input while our backbone gets the equivalent preprocessed tensor
    (reading the normalization constants off the live layers)."""
    keras.backend.clear_session()
    res = 64
    km = keras.applications.EfficientNetB0(
        weights=None, include_top=False, pooling="avg",
        input_shape=(res, res, 3),
    )
    randomize_keras_model(km, seed=11)
    flat = keras_weights_flat(km)
    variables = kc.convert_keras_efficientnet(flat, "b0")

    model, init_vars = create_backbone("b0", 0, resolution=res,
                                       dtype=jnp.float32)
    import jax

    got = {p for p, _ in jax.tree_util.tree_leaves_with_path(variables)}
    want = {p for p, _ in jax.tree_util.tree_leaves_with_path(init_vars)}
    assert got == want, (
        f"tree mismatch: missing={list(want - got)[:3]} "
        f"extra={list(got - want)[:3]}"
    )

    rng = np.random.default_rng(5)
    x_raw = rng.uniform(0.0, 255.0, (2, res, res, 3)).astype(np.float32)
    pre = x_raw
    for layer in km.layers:
        if isinstance(layer, keras.layers.Rescaling):
            pre = pre * np.float32(layer.scale) + np.float32(layer.offset)
        elif isinstance(layer, keras.layers.Normalization):
            mean = np.asarray(layer.mean, np.float32).reshape(1, 1, 1, -1)
            var = np.asarray(layer.variance, np.float32).reshape(1, 1, 1, -1)
            pre = (pre - mean) / np.sqrt(var)

    ours = np.asarray(
        model.apply(variables, jnp.asarray(pre))["embedding"], np.float32
    )
    theirs = np.asarray(km(x_raw, training=False), np.float32)
    assert ours.shape == theirs.shape
    denom = np.linalg.norm(ours) * np.linalg.norm(theirs)
    cos = float((ours * theirs).sum() / denom)
    assert cos > 0.999, f"cosine {cos}"
    np.testing.assert_allclose(ours, theirs, rtol=5e-2, atol=5e-3)
