"""Family-generic BN folding + the unified folded serving entry point.

The dedicated functional fold (``models/inference.py``) covers the MBConv
families (EfficientNet, MobileNetV2) whose block structure it re-implements.
This module extends inference-time folding to the REST of the zoo — ResNet
v1/v2, InceptionV3, InceptionResNetV2, MobileNetV1 — without writing a
functional forward per family: the fold happens at the *variables* level and
the stock ``model.apply`` executes it.

Reference role: the serving analog of ``include_top=False, pooling='avg'``
batch prediction over the whole model menu (qt_cpp/dnn_feature_extractor.py
:19-56); the reference has no inference-optimized path at all.

How the variables-level fold works
----------------------------------
At inference a BatchNorm is the affine map ``y = s*x + c`` with
``s = gamma / sqrt(var + eps)`` and ``c = beta - mean*s``. For every conv
whose output feeds a BN directly (discovered by the repo-wide naming
convention ``<name>_bn`` / ``bn<k>`` pairing with ``<name>_conv`` /
``conv<k>``), the multiplicative part is folded into the conv kernel
(``W' = W * s`` over the output-channel axis, done in fp64 on host) and the
BN's stored statistics are rewritten to the NEUTRAL form ``mean=0,
var=1-eps, scale=1, bias=c`` so the surviving BN op computes exactly
``x + c`` — which XLA folds into the conv epilogue. BNs with no producing
conv (ResNetV2's pre-activation ``preact_bn``/``post_bn``) are rewritten to
the precomputed-affine form ``mean=0, var=1-eps, scale=s, bias=c``.
The result is numerically the same forward (the scale multiply moves from
runtime bf16 activations to fold-time fp64 weights) with all BN normalize
arithmetic removed from the op graph.

``fold_tf_preprocess_into_valid_stem`` additionally eliminates the 'tf'
preprocessing pass (``x/127.5 - 1``, keras preprocess_input of the
Inception families) for VALID-padded stems: because every VALID output
pixel sees the full kernel, ``conv((x-m)/m, W) == conv(x, W/m) - sum(W)``
exactly — the correction is a per-output-channel constant absorbed into the
(already folded) stem BN bias, and the raw 0..255 image feeds the stem
directly, skipping one full-image HBM round trip.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def bn_fold_eps(model) -> float:
    """The family's BatchNorm epsilon (a module attribute, not a param)."""
    name = type(model).__name__
    if name == "ResNet":
        return 1.001e-5  # keras.applications.resnet epsilon
    return 1e-3  # EfficientNet / MobileNet / Inception families


def _conv_candidate_names(bn_name: str) -> Tuple[str, ...]:
    """Sibling conv names a BN folds into, by repo naming convention:
    'bn'->'conv' (ConvBN composites), 'bn1'->'conv1' (ResNet),
    'stem_bn'->'stem_conv', 'dw_bn'->'dw_conv', 'pw_bn'->'pw_conv', etc."""
    if "bn" not in bn_name:
        return ()
    return (bn_name.replace("bn", "conv"),)


def _is_bn_stats(node: Any) -> bool:
    return (
        isinstance(node, dict)
        and set(node.keys()) >= {"mean", "var"}
        and not isinstance(node["mean"], dict)
    )


def _to_plain(node):
    """Deep-copy a (possibly frozen) variables subtree into mutable plain
    dicts with numpy leaves — the fold mutates in place."""
    try:
        items = node.items()
    except AttributeError:
        return np.asarray(node)
    return {k: _to_plain(v) for k, v in items}


def fold_variables(model, variables, eps: Optional[float] = None):
    """Generic inference-time conv+BN fold over any zoo backbone.

    Returns a NEW variables pytree with the same structure: conv kernels
    scaled, conv biases adjusted (when the conv has one), and every BN
    rewritten to its neutral/affine form. ``model.apply(folded, x,
    train=False)`` produces the same outputs (fp64 fold, so parity is at
    bf16 noise level). Safe on families with no BN (VGG19): no-op."""
    if eps is None:
        eps = bn_fold_eps(model)
    if "batch_stats" not in variables:
        return variables  # VGG19 and friends: nothing to fold

    # ONE batched device->host fetch; per-leaf np.asarray on device arrays
    # would be hundreds of serial round-trips over the tunneled device.
    variables = jax.device_get(variables)
    params = _to_plain(variables["params"])
    stats = _to_plain(variables["batch_stats"])

    def walk(p_node: Dict[str, Any], s_node: Dict[str, Any]):
        for key, s_child in list(s_node.items()):
            if _is_bn_stats(s_child):
                bn_p = p_node[key]
                s = np.asarray(bn_p["scale"], np.float64) / np.sqrt(
                    np.asarray(s_child["var"], np.float64) + eps
                )
                c = np.asarray(bn_p["bias"], np.float64) - np.asarray(
                    s_child["mean"], np.float64
                ) * s
                conv_p = None
                for cand in _conv_candidate_names(key):
                    node = p_node.get(cand)
                    if (
                        isinstance(node, dict)
                        and "kernel" in node
                        and node["kernel"].shape[-1] == s.shape[0]
                    ):
                        conv_p = node
                        break
                if conv_p is not None:
                    k = np.asarray(conv_p["kernel"], np.float64)
                    conv_p["kernel"] = (k * s).astype(np.float32)
                    if "bias" in conv_p:
                        b = np.asarray(conv_p["bias"], np.float64)
                        conv_p["bias"] = (s * b + c).astype(np.float32)
                        s_mul, c_add = 1.0, np.zeros_like(c)
                    else:
                        s_mul, c_add = 1.0, c
                else:
                    s_mul, c_add = s, c  # affine-only (preact/post BNs)
                # neutral BN: (x - 0) / sqrt((1-eps)+eps) * s_mul + c_add
                bn_p["scale"] = np.broadcast_to(
                    np.asarray(s_mul, np.float32), c.shape
                ).copy()
                bn_p["bias"] = np.asarray(c_add, np.float32)
                s_child["mean"] = np.zeros(c.shape, np.float32)
                s_child["var"] = np.full(c.shape, 1.0 - eps, np.float32)
            elif isinstance(s_child, dict):
                walk(p_node[key], s_child)

    walk(params, stats)
    out = dict(variables)
    out["params"] = params
    out["batch_stats"] = stats
    return out


def fold_tf_preprocess_into_valid_stem(
    variables,
    stem_path: Sequence[str] = ("stem", "conv1"),
    scale: float = 127.5,
):
    """Fold ``x/scale - 1`` into a VALID-padded stem conv (exact).

    Must run AFTER ``fold_variables`` (it adjusts the neutral BN bias).
    The Inception stems (inception_v3.py:38 / inception_resnet.py:69) are
    VALID, so the correction ``sum(W')`` is a constant per output channel."""
    params = _to_plain(variables["params"])
    stats = variables["batch_stats"]
    node = params
    for p in stem_path:
        node = node[p]
    k = np.asarray(node["conv"]["kernel"], np.float64)
    node["conv"]["kernel"] = (k / scale).astype(np.float32)
    # conv((x - m)/m, W) == conv(x, W/m) - sum(W): absorb into the BN bias
    corr = k.sum(axis=(0, 1, 2))
    bn = node["bn"]
    bn["bias"] = (np.asarray(bn["bias"], np.float64) - corr).astype(np.float32)
    out = dict(variables)
    out["params"] = params
    out["batch_stats"] = stats
    return out


# families served by the dedicated functional fold in models/inference.py
MBCONV_FAMILIES = ("efficientnet", "mobilenetv2")
# families whose stem is VALID-padded AND preprocessing is 'tf' mode —
# preprocess folds exactly into the stem at the variables level
_VALID_STEM_TF = ("inception_v3", "inception_resnet_v2")


def make_serving_fn(
    model,
    variables,
    info: Dict[str, Any],
    resolution: Optional[int] = None,
    taps: Sequence[str] = (),
    folded: bool = True,
):
    """ONE folded serving entry for the whole zoo.

    Returns ``(fn, params)`` where ``fn(params, images) -> {'embedding',
    'taps'}`` consumes raw uint8/0..255-float images. Dispatch:

    - MBConv families -> the dedicated functional fold (``make_infer_fn``:
      BN folded, SE as dense, preprocess folded into the stem);
    - BN families (resnet*, inception*, mobilenetv1) -> variables-level
      fold + stock ``model.apply`` (+ exact stem preprocess fold for the
      VALID-stem 'tf' families);
    - VGG19 (no BN) -> plain apply with caffe preprocessing.

    ``folded=False`` keeps the raw variables (training-parity path)."""
    from fast_image_recognition_tpu.models.efficientnet import (
        TF_MODE_MEAN,
        TF_MODE_STD,
        preprocess_images,
        preprocess_images_caffe,
    )

    family = info["family"]
    res = resolution or int(info["resolution"])
    pp = info.get("preprocess", "torch")
    taps = tuple(taps)

    if family in MBCONV_FAMILIES and folded:
        from fast_image_recognition_tpu.models.inference import make_infer_fn

        mean, std = (TF_MODE_MEAN, TF_MODE_STD) if pp == "tf" else (None, None)
        return make_infer_fn(
            model, variables, taps=taps, resolution=res, mean=mean, std=std
        )

    pp_folded = False
    if folded:
        variables = fold_variables(model, variables)
        if family in _VALID_STEM_TF:
            variables = fold_tf_preprocess_into_valid_stem(variables)
            pp_folded = True
    # The fold works on host numpy leaves; pin the result to device ONCE.
    # Without this every serving dispatch re-uploads the whole param set
    # (measured: the folded InceptionResNetV2 forward ran at 45 img/s on a
    # tunneled v5e — 5.75 s/batch ≈ 224 MB of fp32 params re-shipped per
    # call; a no-op for pytrees that are already device-resident).
    variables = jax.device_put(variables)

    def fn(variables, images):
        if pp_folded:
            x = images.astype(jnp.float32)
            if x.shape[1] != res or x.shape[2] != res:
                x = jax.image.resize(
                    x, (x.shape[0], res, res, 3), method="bilinear"
                )
        elif pp == "caffe":
            x = preprocess_images_caffe(images, res)
        elif pp == "tf":
            x = preprocess_images(images, res, TF_MODE_MEAN, TF_MODE_STD)
        else:
            x = preprocess_images(images, res)
        out = model.apply(variables, x, train=False, taps=taps)
        return {"embedding": out["embedding"], "taps": out["taps"]}

    return fn, variables
