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
    preprocess_images,
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


def fold_backbone(
    model, variables, dtype: Any = jnp.bfloat16
) -> Tuple[Dict[str, Any], List[Dict[str, Any]]]:
    """Returns (folded param pytree, static block config list) for any
    backbone following the family protocol (EfficientNet, MobileNetV2 —
    ``plan_configs()`` + stem/head/MBConv param naming).

    The pytree holds only arrays (jit-traceable); the config list holds the
    static structure (strides, kernel sizes, activations, residual flags)
    and must be closed over, not traced.
    """
    import jax

    # ONE batched device->host fetch; the per-weight fp64 fold below would
    # otherwise trigger hundreds of serial transfers over the tunnel.
    variables = jax.device_get(variables)
    params = variables["params"]
    stats = variables["batch_stats"]
    plan = model.plan_configs()

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
                activation=cfg.get("activation", "swish"),
                residual=(
                    cfg["stride"] == 1 and cfg["in_filters"] == cfg["out_filters"]
                ),
            )
        )
    folded["blocks"] = blocks
    return folded, configs


# EfficientNet was the first family; the fold is family-generic.
fold_efficientnet = fold_backbone


def _act(name: str):
    if name == "relu6":
        return lambda x: jnp.minimum(jax.nn.relu(x), 6.0)
    return jax.nn.swish


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
    act = _act(cfg.get("activation", "swish"))
    h = x
    if cfg["has_expand"]:
        h = act(_conv(h, p["w_exp"], p["b_exp"]))
    ce = h.shape[-1]
    h = act(_conv(h, p["w_dw"], p["b_dw"], stride=cfg["stride"], groups=ce))
    if cfg["has_se"]:
        s = jnp.mean(h, axis=(1, 2), dtype=jnp.float32)
        s = jax.nn.swish(s @ p["w_se1"] + p["b_se1"])
        s = jax.nn.sigmoid(s @ p["w_se2"] + p["b_se2"])
        h = h * s[:, None, None, :].astype(h.dtype)
    h = _conv(h, p["w_proj"], p["b_proj"])
    if cfg["residual"]:
        h = h + x
    return h


def folded_stem(folded, x, activation: str = "swish"):
    return _act(activation)(
        _conv(x, folded["stem_w"], folded["stem_b"], stride=2)
    )


def fold_preprocess_into_stem(
    folded,
    resolution: int,
    dtype: Any = jnp.bfloat16,
    mean=None,
    std=None,
):
    """Fold the (x - MEAN_RGB) / STDDEV_RGB normalization into the stem conv.

    The normalization is affine per input channel, and conv is linear, so
    ``conv((x - m)/s, W) == conv(x, W/s) - conv(m/s * ones, W)`` — the second
    term is a constant correction map that differs from a per-channel bias
    only at the SAME-padding borders (where fewer taps see the constant
    image). Computing it as an actual conv of the constant image makes the
    fold exact everywhere, borders included.

    Replaces the reference's separate preprocessing pass
    (dnn_feature_extractor.py:116-119) with zero extra HBM traffic: the stem
    reads the raw (uint8/float) image directly.

    Returns a new folded dict with keys ``stem_pp_w`` [3,3,3,C] and
    ``stem_pp_corr`` [1, R/2, R/2, C] added.
    """
    from fast_image_recognition_tpu.models.efficientnet import MEAN_RGB, STDDEV_RGB

    std = jnp.asarray(STDDEV_RGB if std is None else std, jnp.float32)
    mean = jnp.asarray(MEAN_RGB if mean is None else mean, jnp.float32)
    w = folded["stem_w"].astype(jnp.float32)  # [3, 3, 3, C]
    w_pp = w / std[None, None, :, None]
    # conv((x-m)/s, W) == conv(x, W/s) - conv(m * ones, W/s); the kernel is
    # already scaled by 1/s, so the constant image is the raw mean.
    const_img = jnp.broadcast_to(
        mean[None, None, None, :], (1, resolution, resolution, 3)
    )
    corr = _conv(const_img, w_pp, jnp.zeros((w.shape[-1],), jnp.float32), stride=2)
    out = dict(folded)
    out["stem_pp_w"] = w_pp.astype(dtype)
    out["stem_pp_corr"] = corr.astype(jnp.float32)
    return out


def folded_stem_pp(folded, images, activation: str = "swish"):
    """Stem directly on raw images (uint8 or 0..255 float): preprocessing is
    folded into the conv weights + correction map, so the big [B, R, R, 3]
    normalized intermediate never exists. When the space-to-depth weights
    are present (``fold_stem_space_to_depth``) the stride-2 3-channel conv
    runs as a stride-1 2x2 conv over 12-channel half-resolution blocks."""
    if "stem_s2d_w" in folded:
        x = images.astype(folded["stem_s2d_w"].dtype)
        b, r, _, c = x.shape
        hh = r // 2
        xs = x.reshape(b, hh, 2, hh, 2, c).transpose(0, 1, 3, 2, 4, 5)
        xs = xs.reshape(b, hh, hh, 4 * c)
        xs = jnp.pad(xs, ((0, 0), (0, 1), (0, 1), (0, 0)))  # SAME high pad
        dn = jax.lax.conv_dimension_numbers(
            xs.shape, folded["stem_s2d_w"].shape, ("NHWC", "HWIO", "NHWC")
        )
        h = jax.lax.conv_general_dilated(
            xs, folded["stem_s2d_w"], (1, 1), "VALID", dimension_numbers=dn
        ) + folded["stem_b"]
    else:
        x = images.astype(folded["stem_pp_w"].dtype)
        h = _conv(x, folded["stem_pp_w"], folded["stem_b"], stride=2)
    h = h - folded["stem_pp_corr"].astype(h.dtype)
    return _act(activation)(h)


def fold_stem_space_to_depth(folded, resolution: int):
    """Rewrite the (preprocess-folded) stem as a space-to-depth conv.

    EXPERIMENTAL, off by default: measured on v5e (B=1024, 224^2) the
    whole-net time was 52.0 ms with this fold vs 49.6 ms without — XLA's
    TPU conv emitter already handles the narrow stem well, and the
    explicit repack costs an extra HBM pass. Kept (exact, tested) for
    platforms where the stem does dominate.

    The 3-channel stride-2 3x3 stem conv is layout-starved on the MXU (27-
    deep contraction over a 224x224 plane). Packing 2x2 pixel blocks into
    channels makes it a stride-1 2x2 conv with a 12-deep contraction on a
    112x112 plane — identical math (the classic TPU input optimization,
    here derived for SAME/stride-2/k=3: pad_low must be 0, true for every
    even resolution).

    K2[p, q, (r, s, c), o] = Wpad[2p + r, 2q + s, c, o],  Wpad = W zero-
    padded to 4x4 taps; the input packs x[2i+r, 2j+s, c] into channel
    (r*2+s)*3+c (see folded_stem_pp).
    """
    if resolution % 2:
        return folded  # odd resolutions keep the plain stride-2 stem
    w = folded["stem_pp_w"]  # [3, 3, 3, C]
    k, _, cin, cout = w.shape
    if k != 3:
        return folded
    w4 = jnp.pad(w, ((0, 1), (0, 1), (0, 0), (0, 0)))  # [4, 4, 3, C]
    k2 = w4.reshape(2, 2, 2, 2, cin, cout).transpose(0, 2, 1, 3, 4, 5)
    out = dict(folded)
    out["stem_s2d_w"] = k2.reshape(2, 2, 4 * cin, cout)
    return out


def folded_blocks(folded, configs, x, start: int = 0, end: Optional[int] = None):
    """Apply blocks [start, end) — the segment primitive, matching
    EfficientNet.run_blocks for cascade reuse."""
    end = len(configs) if end is None else end
    for p, cfg in zip(folded["blocks"][start:end], configs[start:end]):
        x = _block(x, p, cfg)
    return x


def folded_head(folded, x, activation: str = "swish"):
    x = _act(activation)(_conv(x, folded["head_w"], folded["head_b"]))
    return jnp.mean(x, axis=(1, 2), dtype=jnp.float32)


def folded_forward(
    folded,
    configs,
    images,
    taps: Sequence[str] = (),
    resolution: Optional[int] = None,
    dtype: Any = jnp.bfloat16,
    mean=None,
    std=None,
    fused: bool = False,
) -> Dict[str, Any]:
    """Full inference forward: preprocess -> stem -> blocks (+taps) -> head.

    If the folded params carry ``stem_pp_w`` (see
    ``fold_preprocess_into_stem``) and no resize is needed, the stem consumes
    the raw image directly; otherwise the explicit preprocessing pass runs.

    Matches EfficientNet.__call__(train=False) output structure."""
    act = configs[0].get("activation", "swish") if configs else "swish"
    needs_resize = resolution is not None and (
        images.shape[1] != resolution or images.shape[2] != resolution
    )
    if "stem_pp_w" in folded and not needs_resize:
        x = folded_stem_pp(folded, images, activation=act)
    else:
        kw = {}
        if mean is not None:
            kw["mean"] = mean
        if std is not None:
            kw["std"] = std
        x = preprocess_images(images, resolution, **kw).astype(dtype)
        x = folded_stem(folded, x, activation=act)
    tapset = set(taps)
    tap_out: Dict[str, jax.Array] = {}
    if fused:
        from fast_image_recognition_tpu.ops.mbconv_kernel import fused_mbconv
    for p, cfg in zip(folded["blocks"], configs):
        # stride-2 blocks stay on XLA: Mosaic's strided load requires an
        # exactly-128-lane memref, which no EfficientNet hidden width has
        use_fused = fused and cfg["stride"] == 1
        x = fused_mbconv(x, p, cfg) if use_fused else _block(x, p, cfg)
        if cfg["name"] in tapset:
            tap_out[cfg["name"]] = jnp.mean(x, axis=(1, 2), dtype=jnp.float32)
    return {"embedding": folded_head(folded, x, activation=act), "taps": tap_out}


def make_infer_fn(
    model,
    variables,
    taps: Sequence[str] = (),
    resolution: Optional[int] = None,
    dtype: Any = jnp.bfloat16,
    fold_preprocess: bool = True,
    mean=None,
    std=None,
    fused: bool = False,
    space_to_depth: bool = False,
):
    """Fold the model and return (jittable fn(folded, images) -> out, folded).

    The returned fn closes over the static block configs; ``folded`` is the
    array pytree to pass (and shard/donate) explicitly. ``mean``/``std``
    select the family's preprocessing constants (default: EfficientNet's
    MEAN_RGB/STDDEV_RGB; pass TF_MODE_* for the Keras 'tf'-mode families).
    ``fused=True`` runs every MBConv block through the fused Pallas kernel
    (ops/mbconv_kernel.py) — hidden tensors never leave VMEM.
    """
    folded, configs = fold_backbone(model, variables, dtype=dtype)
    if resolution is not None:
        res = resolution
    elif hasattr(model, "variant"):
        res = VARIANTS[model.variant].resolution
    else:
        res = model.resolution
    if fold_preprocess:
        folded = fold_preprocess_into_stem(
            folded, res, dtype=dtype, mean=mean, std=std
        )
        if space_to_depth:
            folded = fold_stem_space_to_depth(folded, res)
    taps = tuple(taps)

    def infer(folded, images):
        return folded_forward(
            folded, configs, images, taps=taps, resolution=res, dtype=dtype,
            mean=mean, std=std, fused=fused,
        )

    return infer, folded
