"""Folded inference path for the EfficientNet backbone.

The training module (``models/efficientnet.py``) keeps BatchNorm as separate
ops because the statistics must update under ``train=True``. At inference BN
is an affine map, so this module folds every BN into the preceding conv
(``W' = W * gamma/sqrt(var+eps)``, ``b = beta - mean * gamma/sqrt(var+eps)``)
and runs squeeze-excite as two small dense matmuls on the pooled ``[B, C]``
vector instead of 1x1 convs on a ``[B, 1, 1, C]`` tensor. This roughly halves
the op count XLA has to schedule and removes all BN elementwise traffic —
the extractor is HBM-bandwidth-bound, so fewer materialized intermediates is
directly throughput.

Reference roles: this is the serving analog of the reference's
``pooled_features_only`` extractor (qt_cpp/dnn_feature_extractor.py:120-122);
the reference has no inference-optimized path at all (one ``sess.run`` per
image, dnn_feature_extractor.py:127-128).

Parity: ``fold_efficientnet`` + ``folded_forward`` must match
``model.apply(..., train=False)`` — tested in tests/test_inference_fold.py.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fast_image_recognition_tpu.models.efficientnet import (
    VARIANTS,
    block_plan,
    preprocess_images,
    round_filters,
)

_BN_EPS = 1e-3


def _fold_conv_bn(kernel, bn_scale, bn_bias, bn_mean, bn_var, dtype):
    """Fold an inference BatchNorm into the conv that feeds it."""
    k = np.asarray(kernel, np.float64)
    s = np.asarray(bn_scale, np.float64) / np.sqrt(
        np.asarray(bn_var, np.float64) + _BN_EPS
    )
    b = np.asarray(bn_bias, np.float64) - np.asarray(bn_mean, np.float64) * s
    return (
        jnp.asarray(k * s, dtype),  # broadcast over the output-channel axis
        jnp.asarray(b, dtype),
    )


def fold_efficientnet(
    model, variables, dtype: Any = jnp.bfloat16
) -> Tuple[Dict[str, Any], List[Dict[str, Any]]]:
    """Returns (folded param pytree, static block config list).

    The pytree holds only arrays (jit-traceable); the config list holds the
    static structure (strides, kernel sizes, residual flags) and must be
    closed over, not traced.
    """
    params = variables["params"]
    stats = variables["batch_stats"]
    plan = block_plan(model.variant)

    def conv_bn(conv_name, bn_name, scope_p=params, scope_s=stats):
        return _fold_conv_bn(
            scope_p[conv_name]["kernel"],
            scope_p[bn_name]["scale"],
            scope_p[bn_name]["bias"],
            scope_s[bn_name]["mean"],
            scope_s[bn_name]["var"],
            dtype,
        )

    folded: Dict[str, Any] = {}
    folded["stem_w"], folded["stem_b"] = conv_bn("stem_conv", "stem_bn")
    folded["head_w"], folded["head_b"] = conv_bn("head_conv", "head_bn")

    blocks = []
    configs = []
    for cfg in plan:
        name = cfg["name"]
        bp = params[name]
        bs = stats[name]
        entry: Dict[str, Any] = {}
        has_expand = "expand_conv" in bp
        if has_expand:
            entry["w_exp"], entry["b_exp"] = _fold_conv_bn(
                bp["expand_conv"]["kernel"],
                bp["expand_bn"]["scale"],
                bp["expand_bn"]["bias"],
                bs["expand_bn"]["mean"],
                bs["expand_bn"]["var"],
                dtype,
            )
        entry["w_dw"], entry["b_dw"] = _fold_conv_bn(
            bp["dw_conv"]["kernel"],
            bp["dw_bn"]["scale"],
            bp["dw_bn"]["bias"],
            bs["dw_bn"]["mean"],
            bs["dw_bn"]["var"],
            dtype,
        )
        has_se = "se" in bp
        if has_se:
            # 1x1 conv [1,1,C,S] -> dense [C,S]; SE matmuls run on the pooled
            # [B, C] vector so they are tiny — keep them fp32 for accuracy.
            entry["w_se1"] = jnp.asarray(
                np.asarray(bp["se"]["reduce"]["kernel"])[0, 0], jnp.float32
            )
            entry["b_se1"] = jnp.asarray(bp["se"]["reduce"]["bias"], jnp.float32)
            entry["w_se2"] = jnp.asarray(
                np.asarray(bp["se"]["expand"]["kernel"])[0, 0], jnp.float32
            )
            entry["b_se2"] = jnp.asarray(bp["se"]["expand"]["bias"], jnp.float32)
        entry["w_proj"], entry["b_proj"] = _fold_conv_bn(
            bp["project_conv"]["kernel"],
            bp["project_bn"]["scale"],
            bp["project_bn"]["bias"],
            bs["project_bn"]["mean"],
            bs["project_bn"]["var"],
            dtype,
        )
        blocks.append(entry)
        configs.append(
            dict(
                name=name,
                kernel=cfg["kernel"],
                stride=cfg["stride"],
                has_expand=has_expand,
                has_se=has_se,
                residual=(
                    cfg["stride"] == 1 and cfg["in_filters"] == cfg["out_filters"]
                ),
            )
        )
    folded["blocks"] = blocks
    return folded, configs


def _conv(x, w, b, stride: int = 1, groups: int = 1):
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    out = jax.lax.conv_general_dilated(
        x,
        w,
        (stride, stride),
        "SAME",
        dimension_numbers=dn,
        feature_group_count=groups,
    )
    return out + b.astype(out.dtype)


def _block(x, p, cfg):
    h = x
    if cfg["has_expand"]:
        h = jax.nn.swish(_conv(h, p["w_exp"], p["b_exp"]))
    ce = h.shape[-1]
    h = jax.nn.swish(
        _conv(h, p["w_dw"], p["b_dw"], stride=cfg["stride"], groups=ce)
    )
    if cfg["has_se"]:
        s = jnp.mean(h, axis=(1, 2), dtype=jnp.float32)
        s = jax.nn.swish(s @ p["w_se1"] + p["b_se1"])
        s = jax.nn.sigmoid(s @ p["w_se2"] + p["b_se2"])
        h = h * s[:, None, None, :].astype(h.dtype)
    h = _conv(h, p["w_proj"], p["b_proj"])
    if cfg["residual"]:
        h = h + x
    return h


def folded_stem(folded, x):
    return jax.nn.swish(_conv(x, folded["stem_w"], folded["stem_b"], stride=2))


def folded_blocks(folded, configs, x, start: int = 0, end: Optional[int] = None):
    """Apply blocks [start, end) — the segment primitive, matching
    EfficientNet.run_blocks for cascade reuse."""
    end = len(configs) if end is None else end
    for p, cfg in zip(folded["blocks"][start:end], configs[start:end]):
        x = _block(x, p, cfg)
    return x


def folded_head(folded, x):
    x = jax.nn.swish(_conv(x, folded["head_w"], folded["head_b"]))
    return jnp.mean(x, axis=(1, 2), dtype=jnp.float32)


def folded_forward(
    folded,
    configs,
    images,
    taps: Sequence[str] = (),
    resolution: Optional[int] = None,
    dtype: Any = jnp.bfloat16,
) -> Dict[str, Any]:
    """Full inference forward: preprocess -> stem -> blocks (+taps) -> head.

    Matches EfficientNet.__call__(train=False) output structure."""
    x = preprocess_images(images, resolution).astype(dtype)
    x = folded_stem(folded, x)
    tapset = set(taps)
    tap_out: Dict[str, jax.Array] = {}
    for p, cfg in zip(folded["blocks"], configs):
        x = _block(x, p, cfg)
        if cfg["name"] in tapset:
            tap_out[cfg["name"]] = jnp.mean(x, axis=(1, 2), dtype=jnp.float32)
    return {"embedding": folded_head(folded, x), "taps": tap_out}


def make_infer_fn(
    model,
    variables,
    taps: Sequence[str] = (),
    resolution: Optional[int] = None,
    dtype: Any = jnp.bfloat16,
):
    """Fold the model and return (jittable fn(folded, images) -> out, folded).

    The returned fn closes over the static block configs; ``folded`` is the
    array pytree to pass (and shard/donate) explicitly.
    """
    folded, configs = fold_efficientnet(model, variables, dtype=dtype)
    res = resolution or VARIANTS[model.variant].resolution
    taps = tuple(taps)

    def infer(folded, images):
        return folded_forward(
            folded, configs, images, taps=taps, resolution=res, dtype=dtype
        )

    return infer, folded
