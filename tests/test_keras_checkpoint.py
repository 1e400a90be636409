"""Keras-applications checkpoint conversion round trips for the
MobileNetV2 / InceptionResNetV2 families (utils/keras_checkpoint.py),
mirroring the TF1-EfficientNet converter tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from fast_image_recognition_tpu.models.inception_resnet import (
    create_inception_resnet_v2,
)
from fast_image_recognition_tpu.models.mobilenet import create_mobilenetv2
from fast_image_recognition_tpu.utils.keras_checkpoint import (
    convert_keras_inception_resnet,
    convert_keras_mobilenetv2,
    inception_resnet_to_keras_names,
    mobilenetv2_to_keras_names,
)


@pytest.fixture(scope="module")
def mbv2():
    return create_mobilenetv2(1.0, 0, seed=0, resolution=64, dtype=jnp.float32)


@pytest.fixture(scope="module")
def irv2():
    return create_inception_resnet_v2(0, seed=0, resolution=75,
                                      dtype=jnp.float32)


def official_mbv2_layer_names():
    """Independent enumeration of the Keras MobileNetV2 weight names
    (alpha=1.0): 1 stem + 17 inverted-residual blocks + head."""
    bn = ("gamma", "beta", "moving_mean", "moving_variance")
    names = ["Conv1/kernel"] + [f"bn_Conv1/{v}" for v in bn]
    names += ["expanded_conv_depthwise/depthwise_kernel"]
    names += [f"expanded_conv_depthwise_BN/{v}" for v in bn]
    names += ["expanded_conv_project/kernel"]
    names += [f"expanded_conv_project_BN/{v}" for v in bn]
    for i in range(1, 17):
        names += [f"block_{i}_expand/kernel"]
        names += [f"block_{i}_expand_BN/{v}" for v in bn]
        names += [f"block_{i}_depthwise/depthwise_kernel"]
        names += [f"block_{i}_depthwise_BN/{v}" for v in bn]
        names += [f"block_{i}_project/kernel"]
        names += [f"block_{i}_project_BN/{v}" for v in bn]
    names += ["Conv_1/kernel"] + [f"Conv_1_bn/{v}" for v in bn]
    return set(names)


def test_mbv2_names_match_official_layout(mbv2):
    model, variables = mbv2
    got = set(mobilenetv2_to_keras_names(variables, 1.0))
    want = official_mbv2_layer_names()
    assert got == want, (
        f"missing={sorted(want - got)[:4]} extra={sorted(got - want)[:4]}"
    )


def test_mbv2_roundtrip_exact(mbv2):
    model, variables = mbv2
    keras = mobilenetv2_to_keras_names(variables, 1.0)
    back = convert_keras_mobilenetv2(keras, 1.0)
    x = jnp.ones((1, 64, 64, 3))
    o1 = np.asarray(model.apply(variables, x)["embedding"])
    o2 = np.asarray(model.apply(back, x)["embedding"])
    np.testing.assert_allclose(o1, o2, rtol=1e-6)
    # depthwise layout: keras stores [k, k, C, 1]
    dw = keras["expanded_conv_depthwise/depthwise_kernel"]
    assert dw.shape[-1] == 1 and dw.shape[2] > 1


def test_irv2_roundtrip_exact(irv2):
    model, variables = irv2
    keras = inception_resnet_to_keras_names(variables)
    back = convert_keras_inception_resnet(keras)
    x = jnp.ones((1, 75, 75, 3))
    o1 = np.asarray(model.apply(variables, x)["embedding"])
    o2 = np.asarray(model.apply(back, x)["embedding"])
    np.testing.assert_allclose(o1, o2, rtol=1e-6)


def test_irv2_layer_census(irv2):
    """Pin the creation-order counters to the known Keras layer census:
    203 auto-numbered conv2d/BN pairs (conv2d .. conv2d_202), 40 named
    '<block>_conv' up-projections (with bias), conv_7b + conv_7b_bn."""
    model, variables = irv2
    keras = inception_resnet_to_keras_names(variables)
    convs = [k for k in keras if k.startswith("conv2d") and k.endswith("kernel")]
    ups = [k for k in keras if k.endswith("_conv/kernel")]
    assert len(convs) == 203
    assert "conv2d_202/kernel" in keras and "conv2d_203/kernel" not in keras
    assert len(ups) == 40  # 10 block35 + 20 block17 + 10 block8
    assert "conv_7b/kernel" in keras and "conv_7b_bn/gamma" in keras
    # every up-projection carries a bias
    assert all(k.replace("/kernel", "/bias") in keras for k in ups)


# ---------------------------------------------------------------------------
# VGG19 / ResNet (added with the zoo completion)
# ---------------------------------------------------------------------------

def test_vgg19_roundtrip():
    from fast_image_recognition_tpu.models.vgg import create_vgg19
    from fast_image_recognition_tpu.utils.keras_checkpoint import (
        convert_keras_vgg19,
        vgg19_to_keras_names,
    )

    model, variables = create_vgg19(0, seed=0, resolution=64,
                                    dtype=jnp.float32)
    keras = vgg19_to_keras_names(variables)
    # our module names ARE the keras layer names
    assert "block1_conv1/kernel" in keras and "block5_conv4/bias" in keras
    assert len(keras) == 16 * 2  # 16 convs, kernel+bias each
    back = convert_keras_vgg19(keras)
    x = jnp.ones((1, 64, 64, 3))
    o1 = np.asarray(model.apply(variables, x)["embedding"])
    o2 = np.asarray(model.apply(back, x)["embedding"])
    np.testing.assert_allclose(o1, o2, rtol=1e-6)


@pytest.mark.parametrize("variant", ["resnet50", "resnet50v2"])
def test_resnet_roundtrip(variant):
    from fast_image_recognition_tpu.models.resnet import create_resnet
    from fast_image_recognition_tpu.utils.keras_checkpoint import (
        convert_keras_resnet,
        resnet_to_keras_names,
    )

    model, variables = create_resnet(variant, 0, seed=0, resolution=64,
                                     dtype=jnp.float32)
    keras = resnet_to_keras_names(variables, variant)
    assert "conv1_conv/kernel" in keras and "conv1_conv/bias" in keras
    if variant.endswith("v2"):
        assert "conv2_block1_preact_bn/gamma" in keras
        assert "post_bn/gamma" in keras
        assert "conv2_block1_1_conv/bias" not in keras  # v2 inner: no bias
    else:
        assert "conv1_bn/gamma" in keras
        assert "conv2_block1_0_bn/gamma" in keras  # v1 shortcut BN
        assert "conv2_block1_1_conv/bias" in keras
    back = convert_keras_resnet(keras, variant)
    x = jnp.ones((1, 64, 64, 3))
    o1 = np.asarray(model.apply(variables, x)["embedding"])
    o2 = np.asarray(model.apply(back, x)["embedding"])
    np.testing.assert_allclose(o1, o2, rtol=1e-6)


def test_mobilenet_v1_roundtrip():
    from fast_image_recognition_tpu.models.mobilenet import create_mobilenet_v1
    from fast_image_recognition_tpu.utils.keras_checkpoint import (
        convert_keras_mobilenet_v1,
        mobilenet_v1_to_keras_names,
    )

    model, variables = create_mobilenet_v1(1.0, 0, seed=0, resolution=64,
                                           dtype=jnp.float32)
    keras = mobilenet_v1_to_keras_names(variables)
    assert "conv_dw_13/depthwise_kernel" in keras
    assert "conv_pw_1/kernel" in keras
    back = convert_keras_mobilenet_v1(keras)
    x = jnp.ones((1, 64, 64, 3))
    o1 = np.asarray(model.apply(variables, x)["embedding"])
    o2 = np.asarray(model.apply(back, x)["embedding"])
    np.testing.assert_allclose(o1, o2, rtol=1e-6)


def test_inception_v3_roundtrip_and_census():
    from fast_image_recognition_tpu.models.inception_v3 import (
        create_inception_v3,
    )
    from fast_image_recognition_tpu.utils.keras_checkpoint import (
        convert_keras_inception_v3,
        inception_v3_to_keras_names,
    )

    model, variables = create_inception_v3(0, seed=0, resolution=75,
                                           dtype=jnp.float32)
    keras = inception_v3_to_keras_names(variables)
    convs = [k for k in keras if k.endswith("/kernel")]
    # keras InceptionV3 has 94 conv/BN pairs: conv2d .. conv2d_93
    assert len(convs) == 94
    assert "conv2d_93/kernel" in keras and "conv2d_94/kernel" not in keras
    back = convert_keras_inception_v3(keras)
    x = jnp.ones((1, 75, 75, 3))
    o1 = np.asarray(model.apply(variables, x)["embedding"])
    o2 = np.asarray(model.apply(back, x)["embedding"])
    np.testing.assert_allclose(o1, o2, rtol=1e-6)
