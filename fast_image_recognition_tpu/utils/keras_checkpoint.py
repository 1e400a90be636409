"""Keras-applications checkpoint conversion for the non-EfficientNet zoo.

Reference: the Keras model zoo loads ``weights='imagenet'`` h5 checkpoints
(qt_cpp/dnn_feature_extractor.py:45-48) for MobileNetV2 and
InceptionResNetV2. Those checkpoints are stripped from this mirror, so —
exactly like utils/tf_checkpoint.py for the TF1 EfficientNet — this module
pins the NAME/LAYOUT mapping needed to port them when present, with
inverse exporters used to round-trip-test the contract.

Input format: a flat ``{"<layer>/<weight>": array}`` mapping using the
Keras layer names (h5 group names, ':0' suffixes stripped).

MobileNetV2 (keras.applications.mobilenet_v2, width alpha):
  Conv1/kernel, bn_Conv1/{gamma,beta,moving_mean,moving_variance}
  expanded_conv_depthwise/depthwise_kernel, expanded_conv_depthwise_BN/...
  expanded_conv_project/kernel, expanded_conv_project_BN/...
  block_<i>_expand/kernel, block_<i>_expand_BN/...        (i = 1..16)
  block_<i>_depthwise/depthwise_kernel, block_<i>_depthwise_BN/...
  block_<i>_project/kernel, block_<i>_project_BN/...
  Conv_1/kernel, Conv_1_bn/...
Keras depthwise kernels are [k, k, C, 1]; flax feature_group_count wants
[k, k, 1, C] — transposed here (same swap as the TF1 converter).

InceptionResNetV2 (keras.applications.inception_resnet_v2): the stock
implementation auto-numbers its conv/BN layers in CREATION order
(conv2d, conv2d_1, ..., batch_normalization, ...), except each residual
block's 1x1 up-projection (named '<block>_conv', bias, no BN) and the
final 'conv_7b'/'conv_7b_bn'. This module walks our module tree in the
same creation order (verified branch-by-branch against the Keras source
layout) and pairs counters.
"""

from __future__ import annotations

from typing import Dict, List, Mapping, Tuple

import numpy as np

from fast_image_recognition_tpu.models.inception_resnet import (
    inception_resnet_plan,
)
from fast_image_recognition_tpu.models.mobilenet import mobilenet_plan


# ---------------------------------------------------------------------------
# MobileNetV2
# ---------------------------------------------------------------------------

def _bn_in(w: Mapping[str, np.ndarray], layer: str):
    mean = np.asarray(w[f"{layer}/moving_mean"])
    # Inception-family BNs are built with scale=False (no gamma) in the
    # stock keras.applications implementations — their released h5 files
    # carry only beta/moving_* for those layers (found by exporting a live
    # keras model through this contract). Our flax BatchNorm always has a
    # scale slot, so synthesize the identity.
    gamma = w.get(f"{layer}/gamma") if hasattr(w, "get") else (
        w[f"{layer}/gamma"] if f"{layer}/gamma" in w else None
    )
    params = {
        "scale": np.asarray(gamma) if gamma is not None
        else np.ones_like(mean),
        "bias": np.asarray(w[f"{layer}/beta"]),
    }
    stats = {
        "mean": mean,
        "var": np.asarray(w[f"{layer}/moving_variance"]),
    }
    return params, stats


def _keras_mbv2_block_layers(flat_index: int) -> Tuple[str, str, str]:
    """(expand, depthwise, project) keras layer-name prefixes for our
    flat block index (block 0 is keras's un-numbered 'expanded_conv')."""
    if flat_index == 0:
        return None, "expanded_conv_depthwise", "expanded_conv_project"
    b = f"block_{flat_index}"
    return f"{b}_expand", f"{b}_depthwise", f"{b}_project"


def convert_keras_mobilenetv2(
    weights: Mapping[str, np.ndarray], width: float = 1.0
) -> Dict[str, dict]:
    """{'<layer>/<weight>': array} -> this framework's variables pytree."""
    params: Dict[str, dict] = {}
    stats: Dict[str, dict] = {}

    params["stem_conv"] = {"kernel": np.asarray(weights["Conv1/kernel"])}
    params["stem_bn"], stats["stem_bn"] = _bn_in(weights, "bn_Conv1")

    for i, cfg in enumerate(mobilenet_plan(width)):
        exp, dw, proj = _keras_mbv2_block_layers(i)
        bp: Dict[str, dict] = {}
        bs: Dict[str, dict] = {}
        if cfg["expand"] != 1:
            bp["expand_conv"] = {"kernel": np.asarray(weights[f"{exp}/kernel"])}
            bp["expand_bn"], bs["expand_bn"] = _bn_in(weights, f"{exp}_BN")
        dwk = np.asarray(weights[f"{dw}/depthwise_kernel"])
        bp["dw_conv"] = {"kernel": np.transpose(dwk, (0, 1, 3, 2))}
        bp["dw_bn"], bs["dw_bn"] = _bn_in(weights, f"{dw}_BN")
        bp["project_conv"] = {"kernel": np.asarray(weights[f"{proj}/kernel"])}
        bp["project_bn"], bs["project_bn"] = _bn_in(weights, f"{proj}_BN")
        params[cfg["name"]] = bp
        stats[cfg["name"]] = bs

    params["head_conv"] = {"kernel": np.asarray(weights["Conv_1/kernel"])}
    params["head_bn"], stats["head_bn"] = _bn_in(weights, "Conv_1_bn")
    return {"params": params, "batch_stats": stats}


def mobilenetv2_to_keras_names(
    variables, width: float = 1.0
) -> Dict[str, np.ndarray]:
    """Inverse mapping (round-trip tests / export in the Keras layout)."""
    out: Dict[str, np.ndarray] = {}
    params = variables["params"]
    stats = variables["batch_stats"]

    def put_bn(layer, p, s):
        out[f"{layer}/gamma"] = np.asarray(p["scale"])
        out[f"{layer}/beta"] = np.asarray(p["bias"])
        out[f"{layer}/moving_mean"] = np.asarray(s["mean"])
        out[f"{layer}/moving_variance"] = np.asarray(s["var"])

    out["Conv1/kernel"] = np.asarray(params["stem_conv"]["kernel"])
    put_bn("bn_Conv1", params["stem_bn"], stats["stem_bn"])
    for i, cfg in enumerate(mobilenet_plan(width)):
        exp, dw, proj = _keras_mbv2_block_layers(i)
        bp, bs = params[cfg["name"]], stats[cfg["name"]]
        if cfg["expand"] != 1:
            out[f"{exp}/kernel"] = np.asarray(bp["expand_conv"]["kernel"])
            put_bn(f"{exp}_BN", bp["expand_bn"], bs["expand_bn"])
        out[f"{dw}/depthwise_kernel"] = np.transpose(
            np.asarray(bp["dw_conv"]["kernel"]), (0, 1, 3, 2)
        )
        put_bn(f"{dw}_BN", bp["dw_bn"], bs["dw_bn"])
        out[f"{proj}/kernel"] = np.asarray(bp["project_conv"]["kernel"])
        put_bn(f"{proj}_BN", bp["project_bn"], bs["project_bn"])
    out["Conv_1/kernel"] = np.asarray(params["head_conv"]["kernel"])
    put_bn("Conv_1_bn", params["head_bn"], stats["head_bn"])
    return out


# ---------------------------------------------------------------------------
# InceptionResNetV2
# ---------------------------------------------------------------------------

# Our ConvBN submodule names inside each composite, in the CREATION order
# of the stock Keras implementation (branch 0, branch 1, branch 2, pool
# branch) — verified against keras/applications/inception_resnet_v2.py.
_IR_CONVBN_ORDER = {
    "stem": ["conv1", "conv2", "conv3", "conv4", "conv5"],
    "mixed5b": ["b0", "b1_0", "b1_1", "b2_0", "b2_1", "b2_2", "b3"],
    "block35": ["b0", "b1_0", "b1_1", "b2_0", "b2_1", "b2_2"],
    "mixed6a": ["b0", "b1_0", "b1_1", "b1_2"],
    "block17": ["b0", "b1_0", "b1_1", "b1_2"],
    "mixed7a": ["b0_0", "b0_1", "b1_0", "b1_1", "b2_0", "b2_1", "b2_2"],
    "block8": ["b0", "b1_0", "b1_1", "b1_2"],
}


def _ir_walk() -> List[Tuple[str, str, str]]:
    """Yield (module_name, convbn_child, kind) in Keras creation order.

    kind 'convbn' pairs with the next (conv2d_N, batch_normalization_N)
    counters; kind 'up' is the block's named '<block>_conv' (bias, no BN)."""
    seq: List[Tuple[str, str, str]] = []
    for sub in _IR_CONVBN_ORDER["stem"]:
        seq.append(("stem", sub, "convbn"))
    for cfg in inception_resnet_plan():
        kind = cfg["kind"]
        for sub in _IR_CONVBN_ORDER[kind]:
            seq.append((cfg["name"], sub, "convbn"))
        if kind in ("block35", "block17", "block8"):
            seq.append((cfg["name"], "up", "up"))
    seq.append(("conv_7b", "", "convbn_named"))
    return seq


def _keras_counter_name(base: str, i: int) -> str:
    return base if i == 0 else f"{base}_{i}"


def _detect_counter_start(weights: Mapping[str, np.ndarray], base: str) -> int:
    """Detect the auto-numbering origin of a Keras weight dict.

    Keras auto-names start at '<base>' under Keras 3 / tf.keras 2.x graph
    rebuilds but at '<base>_1' in the original Keras-2-era h5 releases of
    keras-applications (the files dnn_feature_extractor.py:45-48 loads).
    Probe for the first kernel instead of trusting a 0-based contract.
    (BN probes use beta: the inception-family BNs are scale=False and
    carry no gamma.)"""
    if f"{base}/kernel" in weights or f"{base}/beta" in weights:
        return 0
    if f"{base}_1/kernel" in weights or f"{base}_1/beta" in weights:
        return 1
    return 0


def _ir_block_keras_name(our_name: str) -> str:
    # block35_3 -> block35_3_conv ; block8_10 (the scale-1 linear one) is
    # named 'conv_7b'-adjacent 'block8_10_conv' in keras as well
    return f"{our_name}_conv"


def convert_keras_inception_resnet(
    weights: Mapping[str, np.ndarray],
) -> Dict[str, dict]:
    """{'<layer>/<weight>': array} -> variables pytree for
    models/inception_resnet.py (extractor form, no classifier)."""
    params: Dict[str, dict] = {}
    stats: Dict[str, dict] = {}
    # conv2d / batch_normalization creation counters; origin probed from the
    # weight dict (Keras-2-era h5 releases start at conv2d_1)
    ci = _detect_counter_start(weights, "conv2d")
    bi = _detect_counter_start(weights, "batch_normalization")

    def take_convbn():
        nonlocal ci, bi
        conv = _keras_counter_name("conv2d", ci)
        bn = _keras_counter_name("batch_normalization", bi)
        ci += 1
        bi += 1
        p = {"conv": {"kernel": np.asarray(weights[f"{conv}/kernel"])}}
        bnp, bns = _bn_in(weights, bn)
        p["bn"] = bnp
        return p, {"bn": bns}

    for mod, sub, kind in _ir_walk():
        if kind == "convbn":
            p, s = take_convbn()
            params.setdefault(mod, {})[sub] = p
            stats.setdefault(mod, {})[sub] = s
        elif kind == "up":
            layer = _ir_block_keras_name(mod)
            params.setdefault(mod, {})["up"] = {
                "kernel": np.asarray(weights[f"{layer}/kernel"]),
                "bias": np.asarray(weights[f"{layer}/bias"]),
            }
        else:  # conv_7b: explicitly named in keras
            p = {"conv": {"kernel": np.asarray(weights["conv_7b/kernel"])}}
            bnp, bns = _bn_in(weights, "conv_7b_bn")
            p["bn"] = bnp
            params["conv_7b"] = p
            stats["conv_7b"] = {"bn": bns}
    return {"params": params, "batch_stats": stats}


def inception_resnet_to_keras_names(variables) -> Dict[str, np.ndarray]:
    """Inverse mapping (round-trip tests / export in the Keras layout)."""
    out: Dict[str, np.ndarray] = {}
    params = variables["params"]
    stats = variables["batch_stats"]
    ci = bi = 0

    def put_convbn(p, s):
        nonlocal ci, bi
        conv = _keras_counter_name("conv2d", ci)
        bn = _keras_counter_name("batch_normalization", bi)
        ci += 1
        bi += 1
        out[f"{conv}/kernel"] = np.asarray(p["conv"]["kernel"])
        out[f"{bn}/gamma"] = np.asarray(p["bn"]["scale"])
        out[f"{bn}/beta"] = np.asarray(p["bn"]["bias"])
        out[f"{bn}/moving_mean"] = np.asarray(s["bn"]["mean"])
        out[f"{bn}/moving_variance"] = np.asarray(s["bn"]["var"])

    for mod, sub, kind in _ir_walk():
        if kind == "convbn":
            put_convbn(params[mod][sub], stats[mod][sub])
        elif kind == "up":
            layer = _ir_block_keras_name(mod)
            out[f"{layer}/kernel"] = np.asarray(params[mod]["up"]["kernel"])
            out[f"{layer}/bias"] = np.asarray(params[mod]["up"]["bias"])
        else:
            out["conv_7b/kernel"] = np.asarray(params["conv_7b"]["conv"]["kernel"])
            out["conv_7b_bn/gamma"] = np.asarray(params["conv_7b"]["bn"]["scale"])
            out["conv_7b_bn/beta"] = np.asarray(params["conv_7b"]["bn"]["bias"])
            out["conv_7b_bn/moving_mean"] = np.asarray(
                stats["conv_7b"]["bn"]["mean"]
            )
            out["conv_7b_bn/moving_variance"] = np.asarray(
                stats["conv_7b"]["bn"]["var"]
            )
    return out


# ---------------------------------------------------------------------------
# VGG19 — our conv module names ARE the Keras layer names (block1_conv1 ...)
# ---------------------------------------------------------------------------

def convert_keras_vgg19(weights: Mapping[str, np.ndarray]) -> Dict[str, dict]:
    from fast_image_recognition_tpu.models.vgg import vgg_plan

    params: Dict[str, dict] = {}
    for cfg in vgg_plan():
        name = cfg["name"]
        params[name] = {
            "kernel": np.asarray(weights[f"{name}/kernel"]),
            "bias": np.asarray(weights[f"{name}/bias"]),
        }
    return {"params": params}


def vgg19_to_keras_names(variables) -> Dict[str, np.ndarray]:
    from fast_image_recognition_tpu.models.vgg import vgg_plan

    out: Dict[str, np.ndarray] = {}
    for cfg in vgg_plan():
        name = cfg["name"]
        p = variables["params"][name]
        out[f"{name}/kernel"] = np.asarray(p["kernel"])
        out[f"{name}/bias"] = np.asarray(p["bias"])
    return out


# ---------------------------------------------------------------------------
# ResNet v1/v2 (keras.applications.resnet layer naming)
# ---------------------------------------------------------------------------

def _resnet_maps(variant: str):
    """[(our_module, our_sub, keras_layer, kind)] for the variant."""
    from fast_image_recognition_tpu.models.resnet import resnet_plan

    v2 = variant.endswith("v2")
    rows = [("conv1_conv", None, "conv1_conv", "conv_b")]
    if not v2:
        rows.append(("conv1_bn", None, "conv1_bn", "bn"))
    for cfg in resnet_plan(variant):
        b = cfg["name"]
        if v2:
            rows.append((b, "preact_bn", f"{b}_preact_bn", "bn"))
        if cfg["conv_shortcut"]:
            rows.append((b, "shortcut_conv", f"{b}_0_conv", "conv_b"))
            if not v2:
                rows.append((b, "shortcut_bn", f"{b}_0_bn", "bn"))
        rows.append((b, "conv1", f"{b}_1_conv", "conv_b" if not v2 else "conv"))
        rows.append((b, "bn1", f"{b}_1_bn", "bn"))
        rows.append((b, "conv2", f"{b}_2_conv", "conv_b" if not v2 else "conv"))
        rows.append((b, "bn2", f"{b}_2_bn", "bn"))
        rows.append((b, "conv3", f"{b}_3_conv", "conv_b"))
        if not v2:
            rows.append((b, "bn3", f"{b}_3_bn", "bn"))
    if v2:
        rows.append(("post_bn", None, "post_bn", "bn"))
    return rows


def convert_keras_resnet(
    weights: Mapping[str, np.ndarray], variant: str
) -> Dict[str, dict]:
    params: Dict[str, dict] = {}
    stats: Dict[str, dict] = {}

    def put(tree, mod, sub, value):
        if sub is None:
            tree[mod] = value
        else:
            tree.setdefault(mod, {})[sub] = value

    for mod, sub, layer, kind in _resnet_maps(variant):
        if kind in ("conv", "conv_b"):
            p = {"kernel": np.asarray(weights[f"{layer}/kernel"])}
            if kind == "conv_b":
                p["bias"] = np.asarray(weights[f"{layer}/bias"])
            put(params, mod, sub, p)
        else:
            bnp, bns = _bn_in(weights, layer)
            put(params, mod, sub, bnp)
            put(stats, mod, sub, bns)
    return {"params": params, "batch_stats": stats}


def resnet_to_keras_names(variables, variant: str) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    params = variables["params"]
    stats = variables["batch_stats"]

    def get(tree, mod, sub):
        return tree[mod] if sub is None else tree[mod][sub]

    for mod, sub, layer, kind in _resnet_maps(variant):
        if kind in ("conv", "conv_b"):
            p = get(params, mod, sub)
            out[f"{layer}/kernel"] = np.asarray(p["kernel"])
            if kind == "conv_b":
                out[f"{layer}/bias"] = np.asarray(p["bias"])
        else:
            p = get(params, mod, sub)
            s = get(stats, mod, sub)
            out[f"{layer}/gamma"] = np.asarray(p["scale"])
            out[f"{layer}/beta"] = np.asarray(p["bias"])
            out[f"{layer}/moving_mean"] = np.asarray(s["mean"])
            out[f"{layer}/moving_variance"] = np.asarray(s["var"])
    return out


# ---------------------------------------------------------------------------
# MobileNetV1 (keras.applications.mobilenet layer naming)
# ---------------------------------------------------------------------------

def convert_keras_mobilenet_v1(
    weights: Mapping[str, np.ndarray], width: float = 1.0
) -> Dict[str, dict]:
    from fast_image_recognition_tpu.models.mobilenet import mobilenet_v1_plan

    params: Dict[str, dict] = {}
    stats: Dict[str, dict] = {}
    params["stem_conv"] = {"kernel": np.asarray(weights["conv1/kernel"])}
    params["stem_bn"], stats["stem_bn"] = _bn_in(weights, "conv1_bn")
    for i, cfg in enumerate(mobilenet_v1_plan(width), start=1):
        dwk = np.asarray(weights[f"conv_dw_{i}/depthwise_kernel"])
        bp = {"dw_conv": {"kernel": np.transpose(dwk, (0, 1, 3, 2))}}
        bs: Dict[str, dict] = {}
        bp["dw_bn"], bs["dw_bn"] = _bn_in(weights, f"conv_dw_{i}_bn")
        bp["pw_conv"] = {"kernel": np.asarray(weights[f"conv_pw_{i}/kernel"])}
        bp["pw_bn"], bs["pw_bn"] = _bn_in(weights, f"conv_pw_{i}_bn")
        params[cfg["name"]] = bp
        stats[cfg["name"]] = bs
    return {"params": params, "batch_stats": stats}


def mobilenet_v1_to_keras_names(
    variables, width: float = 1.0
) -> Dict[str, np.ndarray]:
    from fast_image_recognition_tpu.models.mobilenet import mobilenet_v1_plan

    out: Dict[str, np.ndarray] = {}
    params = variables["params"]
    stats = variables["batch_stats"]

    def put_bn(layer, p, s):
        out[f"{layer}/gamma"] = np.asarray(p["scale"])
        out[f"{layer}/beta"] = np.asarray(p["bias"])
        out[f"{layer}/moving_mean"] = np.asarray(s["mean"])
        out[f"{layer}/moving_variance"] = np.asarray(s["var"])

    out["conv1/kernel"] = np.asarray(params["stem_conv"]["kernel"])
    put_bn("conv1_bn", params["stem_bn"], stats["stem_bn"])
    for i, cfg in enumerate(mobilenet_v1_plan(width), start=1):
        bp, bs = params[cfg["name"]], stats[cfg["name"]]
        out[f"conv_dw_{i}/depthwise_kernel"] = np.transpose(
            np.asarray(bp["dw_conv"]["kernel"]), (0, 1, 3, 2)
        )
        put_bn(f"conv_dw_{i}_bn", bp["dw_bn"], bs["dw_bn"])
        out[f"conv_pw_{i}/kernel"] = np.asarray(bp["pw_conv"]["kernel"])
        put_bn(f"conv_pw_{i}_bn", bp["pw_bn"], bs["pw_bn"])
    return out


# ---------------------------------------------------------------------------
# EfficientNet (keras.applications.efficientnet layer naming). The reference
# loads the TF1-era checkpoints (utils/tf_checkpoint.py); the keras-
# applications h5 releases of the SAME architecture use explicit layer
# names (stem_conv, block{stage}{letter}_{expand_conv,dwconv,se_*,
# project_conv}, top_conv) — mapped here so either lineage ports.
# ---------------------------------------------------------------------------

def convert_keras_efficientnet(
    weights: Mapping[str, np.ndarray], variant: str
) -> Dict[str, dict]:
    """{'<layer>/<weight>': array} -> variables pytree for
    models/efficientnet.py. Keras names the depthwise BN just
    '<block>_bn' and the head conv 'top_conv'."""
    from fast_image_recognition_tpu.models.efficientnet import block_plan

    params: Dict[str, dict] = {}
    stats: Dict[str, dict] = {}
    params["stem_conv"] = {"kernel": np.asarray(weights["stem_conv/kernel"])}
    params["stem_bn"], stats["stem_bn"] = _bn_in(weights, "stem_bn")
    for cfg in block_plan(variant):
        nm = cfg["name"]
        bp: Dict[str, dict] = {}
        bs: Dict[str, dict] = {}
        if cfg["expand"] != 1:
            bp["expand_conv"] = {
                "kernel": np.asarray(weights[f"{nm}_expand_conv/kernel"])
            }
            bp["expand_bn"], bs["expand_bn"] = _bn_in(
                weights, f"{nm}_expand_bn"
            )
        dwk = np.asarray(weights[f"{nm}_dwconv/depthwise_kernel"])
        bp["dw_conv"] = {"kernel": np.transpose(dwk, (0, 1, 3, 2))}
        bp["dw_bn"], bs["dw_bn"] = _bn_in(weights, f"{nm}_bn")
        if cfg["se_ratio"] > 0:
            bp["se"] = {
                "reduce": {
                    "kernel": np.asarray(weights[f"{nm}_se_reduce/kernel"]),
                    "bias": np.asarray(weights[f"{nm}_se_reduce/bias"]),
                },
                "expand": {
                    "kernel": np.asarray(weights[f"{nm}_se_expand/kernel"]),
                    "bias": np.asarray(weights[f"{nm}_se_expand/bias"]),
                },
            }
        bp["project_conv"] = {
            "kernel": np.asarray(weights[f"{nm}_project_conv/kernel"])
        }
        bp["project_bn"], bs["project_bn"] = _bn_in(
            weights, f"{nm}_project_bn"
        )
        params[nm] = bp
        stats[nm] = bs
    params["head_conv"] = {"kernel": np.asarray(weights["top_conv/kernel"])}
    params["head_bn"], stats["head_bn"] = _bn_in(weights, "top_bn")
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# InceptionV3 — creation-order counter pairing like InceptionResNetV2
# (keras.applications.inception_v3 auto-numbers every conv2d/BN)
# ---------------------------------------------------------------------------

# Our ConvBN submodule names per composite, in the Keras creation order
# (branch 0, branch 1, branch 2, pool branch — per the keras source).
_IV3_CONVBN_ORDER = {
    "stem": ["conv1", "conv2", "conv3", "conv4", "conv5"],
    "mixed35": ["b0", "b1_0", "b1_1", "b2_0", "b2_1", "b2_2", "bp"],
    "mixed3": ["b0", "b1_0", "b1_1", "b1_2"],
    "mixed17": ["b0", "b1_0", "b1_1", "b1_2",
                "b2_0", "b2_1", "b2_2", "b2_3", "b2_4", "bp"],
    "mixed8": ["b0_0", "b0_1", "b1_0", "b1_1", "b1_2", "b1_3"],
    "mixed8x8": ["b0", "b1_0", "b1_1a", "b1_1b",
                 "b2_0", "b2_1", "b2_2a", "b2_2b", "bp"],
}


def _iv3_walk() -> List[Tuple[str, str]]:
    from fast_image_recognition_tpu.models.inception_v3 import (
        inception_v3_plan,
    )

    seq: List[Tuple[str, str]] = []
    for sub in _IV3_CONVBN_ORDER["stem"]:
        seq.append(("stem", sub))
    for cfg in inception_v3_plan():
        for sub in _IV3_CONVBN_ORDER[cfg["kind"]]:
            seq.append((cfg["name"], sub))
    return seq


def convert_keras_inception_v3(
    weights: Mapping[str, np.ndarray],
) -> Dict[str, dict]:
    params: Dict[str, dict] = {}
    stats: Dict[str, dict] = {}
    c0 = _detect_counter_start(weights, "conv2d")
    b0 = _detect_counter_start(weights, "batch_normalization")
    for i, (mod, sub) in enumerate(_iv3_walk()):
        conv = _keras_counter_name("conv2d", i + c0)
        bn = _keras_counter_name("batch_normalization", i + b0)
        p = {"conv": {"kernel": np.asarray(weights[f"{conv}/kernel"])}}
        bnp, bns = _bn_in(weights, bn)
        p["bn"] = bnp
        params.setdefault(mod, {})[sub] = p
        stats.setdefault(mod, {})[sub] = {"bn": bns}
    return {"params": params, "batch_stats": stats}


def inception_v3_to_keras_names(variables) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    params = variables["params"]
    stats = variables["batch_stats"]
    for i, (mod, sub) in enumerate(_iv3_walk()):
        conv = _keras_counter_name("conv2d", i)
        bn = _keras_counter_name("batch_normalization", i)
        p = params[mod][sub]
        s = stats[mod][sub]
        out[f"{conv}/kernel"] = np.asarray(p["conv"]["kernel"])
        out[f"{bn}/gamma"] = np.asarray(p["bn"]["scale"])
        out[f"{bn}/beta"] = np.asarray(p["bn"]["bias"])
        out[f"{bn}/moving_mean"] = np.asarray(s["bn"]["mean"])
        out[f"{bn}/moving_variance"] = np.asarray(s["bn"]["var"])
    return out
