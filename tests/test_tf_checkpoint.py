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


# ---------------------------------------------------------------------------
# Authentic-naming fixture: the official TF-TPU checkpoint variable layout,
# enumerated INDEPENDENTLY of models/efficientnet.block_plan (hard-coded b0
# architecture table), so a naming drift in either direction fails here.
# ---------------------------------------------------------------------------

# (repeats, expand) per stage — efficientnet-b0 (efficientnet_builder
# blocks_args; the official checkpoint numbers blocks flat: blocks_0..15)
_B0_STAGES = [(1, 1), (2, 6), (2, 6), (3, 6), (3, 6), (4, 6), (1, 6)]


def official_b0_var_names():
    names = ["efficientnet-b0/stem/conv2d/kernel"]
    bn_vars = ("gamma", "beta", "moving_mean", "moving_variance")
    names += [
        f"efficientnet-b0/stem/tpu_batch_normalization/{v}" for v in bn_vars
    ]
    i = 0
    for repeats, expand in _B0_STAGES:
        for _ in range(repeats):
            b = f"efficientnet-b0/blocks_{i}"
            n_bn = 0
            if expand != 1:
                names.append(f"{b}/conv2d/kernel")  # expand
                names.append(f"{b}/conv2d_1/kernel")  # project
            else:
                names.append(f"{b}/conv2d/kernel")  # project only
            names.append(f"{b}/depthwise_conv2d/depthwise_kernel")
            names += [f"{b}/se/conv2d/{v}" for v in ("kernel", "bias")]
            names += [f"{b}/se/conv2d_1/{v}" for v in ("kernel", "bias")]
            n_bn = 3 if expand != 1 else 2
            for j in range(n_bn):
                suffix = "" if j == 0 else f"_{j}"
                names += [
                    f"{b}/tpu_batch_normalization{suffix}/{v}" for v in bn_vars
                ]
            i += 1
    assert i == 16
    names.append("efficientnet-b0/head/conv2d/kernel")
    names += [
        f"efficientnet-b0/head/tpu_batch_normalization/{v}" for v in bn_vars
    ]
    return names


def test_names_match_official_checkpoint_layout(b0):
    """flax_to_tf_names must emit exactly the official extractor variable
    set (pooled_features_only=True drops head/dense)."""
    model, variables = b0
    got = set(flax_to_tf_names(variables, "b0"))
    want = set(official_b0_var_names())
    assert got == want, (
        f"missing={sorted(want - got)[:5]} extra={sorted(got - want)[:5]}"
    )


def test_restore_from_realistic_checkpoint_dict(b0):
    """A checkpoint-shaped dict with the real naming: every model variable
    has an EMA shadow (get_ema_vars covers trainable + moving stats,
    dnn_feature_extractor.py:101-104), plus the optimizer noise a real
    TF-TPU checkpoint carries (global_step, RMSProp slots, dense head).
    The converter must take every EMA shadow and ignore the noise."""
    model, variables = b0
    raw = flax_to_tf_names(variables, "b0")
    rng = np.random.default_rng(0)
    ckpt = {}
    for name, arr in raw.items():
        ckpt[name] = np.asarray(arr) + rng.normal(0, 0.1, arr.shape).astype(
            arr.dtype
        )  # stale raw value
        ckpt[name + EMA_SUFFIX] = np.asarray(arr)  # the shadow holds truth
        ckpt[name + "/RMSProp"] = np.zeros_like(arr)
        ckpt[name + "/RMSProp_1"] = np.zeros_like(arr)
    ckpt["global_step"] = np.asarray(218748, np.int64)
    ckpt["efficientnet-b0/head/dense/kernel"] = np.zeros((1280, 1000), np.float32)
    ckpt["efficientnet-b0/head/dense/bias"] = np.zeros((1000,), np.float32)

    out = convert_tf_efficientnet(ckpt, "b0", use_ema=True)
    x = jnp.ones((1, 32, 32, 3))
    o1 = model.apply(variables, x)["embedding"]
    o2 = model.apply(out, x)["embedding"]
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), rtol=1e-6)
