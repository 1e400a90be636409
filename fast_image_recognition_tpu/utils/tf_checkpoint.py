"""TF1 EfficientNet checkpoint conversion (with EMA shadow variables).

Reference: qt_cpp/dnn_feature_extractor.py:97-113 restores the official
TF-TPU EfficientNet checkpoints through an ExponentialMovingAverage
variable map (``var.op.name + '/ExponentialMovingAverage'``). The shipped
checkpoints are stripped from this mirror (.MISSING_LARGE_BLOBS), so this
module provides the name/layout mapping needed to port them into the flax
model when present:

TF name (official tpu/models/official/efficientnet layout)   -> flax path
  efficientnet-bX/stem/conv2d/kernel                          stem_conv.kernel
  efficientnet-bX/stem/tpu_batch_normalization/{gamma,beta}   stem_bn.{scale,bias}
  .../blocks_I/conv2d/kernel                (expand, if e!=1)  blockSL.expand_conv.kernel
  .../blocks_I/conv2d_1/kernel              (project, e!=1)    blockSL.project_conv.kernel
  .../blocks_I/conv2d/kernel                (project, e==1)    blockSL.project_conv.kernel
  .../blocks_I/depthwise_conv2d/depthwise_kernel               blockSL.dw_conv.kernel (axes swapped)
  .../blocks_I/se/conv2d{,_1}/{kernel,bias}                    blockSL.se.{reduce,expand}
  .../blocks_I/tpu_batch_normalization{,_1,_2}                 expand_bn / dw_bn / project_bn (in presence order)
  efficientnet-bX/head/conv2d/kernel                           head_conv.kernel

Depthwise kernels: TF stores [k, k, F, 1] (per-channel multiplier); flax
``feature_group_count=F`` expects [k, k, 1, F] — transposed here.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

from fast_image_recognition_tpu.models.efficientnet import block_plan

EMA_SUFFIX = "/ExponentialMovingAverage"


def _get(tf_vars: Mapping[str, np.ndarray], name: str, use_ema: bool):
    """EMA shadow variable when present, else the raw variable — the
    restore_model semantics of dnn_feature_extractor.py:97-113."""
    if use_ema and name + EMA_SUFFIX in tf_vars:
        return np.asarray(tf_vars[name + EMA_SUFFIX])
    return np.asarray(tf_vars[name])


def _bn(tf_vars, prefix, use_ema):
    params = {
        "scale": _get(tf_vars, f"{prefix}/gamma", use_ema),
        "bias": _get(tf_vars, f"{prefix}/beta", use_ema),
    }
    stats = {
        "mean": _get(tf_vars, f"{prefix}/moving_mean", use_ema),
        "var": _get(tf_vars, f"{prefix}/moving_variance", use_ema),
    }
    return params, stats


def convert_tf_efficientnet(
    tf_vars: Mapping[str, np.ndarray],
    variant: str = "b0",
    use_ema: bool = True,
) -> Dict[str, dict]:
    """Map a {tf_name: array} dict to this framework's variables pytree
    ({'params': ..., 'batch_stats': ...}), extractor form (no classifier)."""
    net = f"efficientnet-{variant}"
    params: Dict[str, dict] = {}
    stats: Dict[str, dict] = {}

    params["stem_conv"] = {"kernel": _get(tf_vars, f"{net}/stem/conv2d/kernel", use_ema)}
    p, s = _bn(tf_vars, f"{net}/stem/tpu_batch_normalization", use_ema)
    params["stem_bn"], stats["stem_bn"] = p, s

    for i, cfg in enumerate(block_plan(variant)):
        b = f"{net}/blocks_{i}"
        name = cfg["name"]
        bp: Dict[str, dict] = {}
        bs: Dict[str, dict] = {}
        bn_idx = 0

        def next_bn():
            nonlocal bn_idx
            suffix = "" if bn_idx == 0 else f"_{bn_idx}"
            bn_idx += 1
            return _bn(tf_vars, f"{b}/tpu_batch_normalization{suffix}", use_ema)

        if cfg["expand"] != 1:
            bp["expand_conv"] = {"kernel": _get(tf_vars, f"{b}/conv2d/kernel", use_ema)}
            bp["expand_bn"], bs["expand_bn"] = next_bn()
            project_conv = f"{b}/conv2d_1/kernel"
        else:
            project_conv = f"{b}/conv2d/kernel"

        dw = _get(tf_vars, f"{b}/depthwise_conv2d/depthwise_kernel", use_ema)
        bp["dw_conv"] = {"kernel": np.transpose(dw, (0, 1, 3, 2))}  # [k,k,F,1]->[k,k,1,F]
        bp["dw_bn"], bs["dw_bn"] = next_bn()

        if cfg["se_ratio"] > 0:
            bp["se"] = {
                "reduce": {
                    "kernel": _get(tf_vars, f"{b}/se/conv2d/kernel", use_ema),
                    "bias": _get(tf_vars, f"{b}/se/conv2d/bias", use_ema),
                },
                "expand": {
                    "kernel": _get(tf_vars, f"{b}/se/conv2d_1/kernel", use_ema),
                    "bias": _get(tf_vars, f"{b}/se/conv2d_1/bias", use_ema),
                },
            }

        bp["project_conv"] = {"kernel": _get(tf_vars, project_conv, use_ema)}
        bp["project_bn"], bs["project_bn"] = next_bn()
        params[name] = bp
        stats[name] = bs

    params["head_conv"] = {"kernel": _get(tf_vars, f"{net}/head/conv2d/kernel", use_ema)}
    p, s = _bn(tf_vars, f"{net}/head/tpu_batch_normalization", use_ema)
    params["head_bn"], stats["head_bn"] = p, s
    return {"params": params, "batch_stats": stats}


def flax_to_tf_names(
    variables, variant: str = "b0"
) -> Dict[str, np.ndarray]:
    """Inverse mapping (used to round-trip-test the converter and to export
    checkpoints in the TF layout)."""
    net = f"efficientnet-{variant}"
    out: Dict[str, np.ndarray] = {}
    params = variables["params"]
    stats = variables["batch_stats"]

    def put_bn(prefix, p, s):
        out[f"{prefix}/gamma"] = np.asarray(p["scale"])
        out[f"{prefix}/beta"] = np.asarray(p["bias"])
        out[f"{prefix}/moving_mean"] = np.asarray(s["mean"])
        out[f"{prefix}/moving_variance"] = np.asarray(s["var"])

    out[f"{net}/stem/conv2d/kernel"] = np.asarray(params["stem_conv"]["kernel"])
    put_bn(f"{net}/stem/tpu_batch_normalization", params["stem_bn"], stats["stem_bn"])

    for i, cfg in enumerate(block_plan(variant)):
        b = f"{net}/blocks_{i}"
        name = cfg["name"]
        bp, bs = params[name], stats[name]
        bn_idx = 0

        def bn_name():
            nonlocal bn_idx
            suffix = "" if bn_idx == 0 else f"_{bn_idx}"
            bn_idx += 1
            return f"{b}/tpu_batch_normalization{suffix}"

        if cfg["expand"] != 1:
            out[f"{b}/conv2d/kernel"] = np.asarray(bp["expand_conv"]["kernel"])
            put_bn(bn_name(), bp["expand_bn"], bs["expand_bn"])
            project = f"{b}/conv2d_1/kernel"
        else:
            project = f"{b}/conv2d/kernel"
        out[f"{b}/depthwise_conv2d/depthwise_kernel"] = np.transpose(
            np.asarray(bp["dw_conv"]["kernel"]), (0, 1, 3, 2)
        )
        put_bn(bn_name(), bp["dw_bn"], bs["dw_bn"])
        if "se" in bp:
            out[f"{b}/se/conv2d/kernel"] = np.asarray(bp["se"]["reduce"]["kernel"])
            out[f"{b}/se/conv2d/bias"] = np.asarray(bp["se"]["reduce"]["bias"])
            out[f"{b}/se/conv2d_1/kernel"] = np.asarray(bp["se"]["expand"]["kernel"])
            out[f"{b}/se/conv2d_1/bias"] = np.asarray(bp["se"]["expand"]["bias"])
        out[project] = np.asarray(bp["project_conv"]["kernel"])
        put_bn(bn_name(), bp["project_bn"], bs["project_bn"])

    out[f"{net}/head/conv2d/kernel"] = np.asarray(params["head_conv"]["kernel"])
    put_bn(f"{net}/head/tpu_batch_normalization", params["head_bn"], stats["head_bn"])
    return out
