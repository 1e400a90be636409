"""TF1 EfficientNet checkpoint conversion round-trip
(dnn_feature_extractor.py:97-113 EMA restore semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_image_recognition_tpu.models import create_efficientnet
from fast_image_recognition_tpu.utils.tf_checkpoint import (
    EMA_SUFFIX,
    convert_tf_efficientnet,
    flax_to_tf_names,
)


@pytest.fixture(scope="module")
def b0():
    return create_efficientnet("b0", 0, resolution=32)


def test_roundtrip_exact(b0):
    """flax -> TF names -> flax must reproduce the variables exactly and
    the converted model must produce identical outputs."""
    model, variables = b0
    tf_vars = flax_to_tf_names(variables, "b0")
    back = convert_tf_efficientnet(tf_vars, "b0", use_ema=False)
    x = jnp.ones((1, 32, 32, 3))
    o1 = model.apply(variables, x)["embedding"]
    o2 = model.apply(back, x)["embedding"]
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), rtol=1e-6)


def test_ema_shadow_preferred(b0):
    """When '<name>/ExponentialMovingAverage' exists it must win over the
    raw variable (dnn_feature_extractor.py:100-107)."""
    model, variables = b0
    tf_vars = dict(flax_to_tf_names(variables, "b0"))
    stem = "efficientnet-b0/stem/conv2d/kernel"
    shadow = tf_vars[stem] * 0.5
    tf_vars[stem + EMA_SUFFIX] = shadow
    out = convert_tf_efficientnet(tf_vars, "b0", use_ema=True)
    np.testing.assert_allclose(out["params"]["stem_conv"]["kernel"], shadow)
    # use_ema=False ignores the shadow
    out2 = convert_tf_efficientnet(tf_vars, "b0", use_ema=False)
    np.testing.assert_allclose(
        out2["params"]["stem_conv"]["kernel"], tf_vars[stem]
    )


def test_depthwise_layout_swap(b0):
    """TF depthwise kernels are [k,k,F,1]; ours are [k,k,1,F]."""
    model, variables = b0
    tf_vars = flax_to_tf_names(variables, "b0")
    dw = tf_vars["efficientnet-b0/blocks_0/depthwise_conv2d/depthwise_kernel"]
    ours = np.asarray(variables["params"]["block1a"]["dw_conv"]["kernel"])
    assert dw.shape == (3, 3, ours.shape[3], 1)
    np.testing.assert_allclose(np.transpose(dw, (0, 1, 3, 2)), ours)


def test_missing_variable_raises(b0):
    model, variables = b0
    tf_vars = dict(flax_to_tf_names(variables, "b0"))
    del tf_vars["efficientnet-b0/head/conv2d/kernel"]
    with pytest.raises(KeyError):
        convert_tf_efficientnet(tf_vars, "b0")
