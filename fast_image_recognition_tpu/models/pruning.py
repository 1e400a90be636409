"""Channel pruning for EfficientNet MBConv blocks.

Reference: tf_keras/prunned/keras_finetune_prune.py —
- importance metrics: APoZ (:57-131), pairwise-distance class separation
  (:134-220), leave-channel-out loss (:223-317), gradient x activation
  (:319-391), and **L1 kernel norm — the one the reference actually uses**
  (:489-517, selected at :541-542);
- surgery: per conv layer drop the worst 25% of channels rounded down to
  multiples of 16, via keras-surgeon delete_channels (:519-550, :531).

TPU design: surgery targets each MBConv block's *expanded* (hidden)
channels — the internal axis between expand_conv and project_conv — so
block I/O shapes, the residual adds, and the exit taps are untouched, and
the pruned model stays a statically-shaped XLA program. The EfficientNet
module takes ``hidden_overrides`` (per-block hidden width), and surgery
produces (new_model, new_variables) by slicing the kept channels out of
expand/dw/se/project kernels and the BN statistics.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import numpy as np

from fast_image_recognition_tpu.models.efficientnet import EfficientNet


def round_down_multiple(n: int, m: int) -> int:
    """25% off, rounded DOWN to a multiple of m (keras_finetune_prune.py:531,
    1083) — but never below m."""
    return max(m, (n // m) * m)


# ---------------------------------------------------------------------------
# Importance metrics — all return [F] per-hidden-channel scores
# (HIGHER = more important, matching the reference's keep-the-top semantics)
# ---------------------------------------------------------------------------

def l1_kernel_importance(variables, block_name: str) -> np.ndarray:
    """L1 norm of the expand_conv kernel slices per output channel — the
    reference's active metric (keras_finetune_prune.py:489-517)."""
    params = variables["params"][block_name]
    if "expand_conv" in params:
        kernel = params["expand_conv"]["kernel"]  # [1, 1, in, F]
    else:
        kernel = params["dw_conv"]["kernel"]  # expand==1 blocks
    return np.asarray(jnp.sum(jnp.abs(kernel), axis=(0, 1, 2)))


def _block_hidden_activations(
    model: EfficientNet, variables, images: jax.Array, block_index: int
) -> jax.Array:
    """Post-depthwise hidden activations of one block ([B, H, W, F]) by
    re-running the block body manually from its params."""
    m = model.bind(variables)
    h = m.stem(images.astype(m.dtype))
    h = m.run_blocks(h, 0, block_index)
    blk_params = variables["params"][model.block_names()[block_index]]
    blk_stats = variables["batch_stats"][model.block_names()[block_index]]
    cfg = model.plan_configs()[block_index]

    def bn(name, x):
        p = blk_params[name]
        s = blk_stats[name]
        inv = jax.lax.rsqrt(s["var"] + 1e-3)
        return (x - s["mean"]) * inv * p["scale"] + p["bias"]

    x = h.astype(jnp.float32)
    if cfg["expand"] != 1:
        x = jax.lax.conv_general_dilated(
            x,
            blk_params["expand_conv"]["kernel"].astype(jnp.float32),
            (1, 1),
            "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        x = jax.nn.swish(bn("expand_bn", x))
        f = x.shape[-1]
        x = jax.lax.conv_general_dilated(
            x,
            blk_params["dw_conv"]["kernel"].astype(jnp.float32),
            (cfg["stride"], cfg["stride"]),
            "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=f,
        )
        x = jax.nn.swish(bn("dw_bn", x))
    else:
        f = x.shape[-1]
        x = jax.lax.conv_general_dilated(
            x,
            blk_params["dw_conv"]["kernel"].astype(jnp.float32),
            (cfg["stride"], cfg["stride"]),
            "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=f,
        )
        x = jax.nn.swish(bn("dw_bn", x))
    return x


def taylor_importance(
    model: EfficientNet,
    variables,
    images: np.ndarray,
    labels: np.ndarray,
    num_classes: int,
    block_index: int,
    head: Optional[Tuple[np.ndarray, np.ndarray]] = None,
    seed: int = 0,
) -> np.ndarray:
    """Gradient x activation (first-order Taylor) importance
    (keras_finetune_prune.py:319-391): |d loss / d a * a| averaged per
    channel, using a linear probe head on the final embedding."""
    rng = np.random.default_rng(seed)
    emb_dim = None

    def forward_with_scale(variables, scale, x, y, w, b):
        m = model.bind(variables)
        h = m.stem(x.astype(m.dtype))
        h = m.run_blocks(h, 0, block_index)
        blk = m.blocks[block_index]
        h = blk(h, train=False)
        # channel-scale hook: d loss/d scale == grad x activation summed
        h = h * scale.astype(h.dtype)
        h = m.run_blocks(h, block_index + 1, len(m.blocks))
        emb = m.head_pool(h)
        logits = emb @ w + b
        onehot = jax.nn.one_hot(y, num_classes)
        return -jnp.mean(jnp.sum(onehot * jax.nn.log_softmax(logits), axis=1))

    out_filters = model.plan_configs()[block_index]["out_filters"]
    scale = jnp.ones((out_filters,), jnp.float32)
    if head is None:
        m = model.bind(variables)
        emb_dim = m.head_filters
        w = rng.normal(0, 0.01, (emb_dim, num_classes)).astype(np.float32)
        b = np.zeros(num_classes, np.float32)
    else:
        w, b = head
    g = jax.grad(forward_with_scale, argnums=1)(
        variables,
        scale,
        jnp.asarray(images, jnp.float32),
        jnp.asarray(labels, jnp.int32),
        jnp.asarray(w),
        jnp.asarray(b),
    )
    return np.abs(np.asarray(g))


def leave_one_out_importance(
    model: EfficientNet,
    variables,
    images: np.ndarray,
    labels: np.ndarray,
    num_classes: int,
    block_index: int,
    seed: int = 0,
) -> np.ndarray:
    """Leave-channel-out loss increase (keras_finetune_prune.py:223-317):
    zero one block-output channel at a time and measure the loss delta on a
    calibration batch; higher increase = more important. Measured on the
    block output (like ``taylor_importance``) and propagated to the hidden
    axis through |project_conv| by the caller. Runs as one ``lax.map`` over
    channels — F sequential tail-forwards from the block."""
    rng = np.random.default_rng(seed)
    m = model.bind(variables)
    emb_dim = m.head_filters
    w = jnp.asarray(rng.normal(0, 0.01, (emb_dim, num_classes)), jnp.float32)
    b = jnp.zeros((num_classes,), jnp.float32)
    x = jnp.asarray(images, jnp.float32)
    y = jnp.asarray(labels, jnp.int32)
    out_filters = model.plan_configs()[block_index]["out_filters"]

    def tail_loss(variables, block_out):
        mm = model.bind(variables)
        h = mm.run_blocks(block_out.astype(mm.dtype), block_index + 1, len(mm.blocks))
        emb = mm.head_pool(h)
        logits = emb @ w + b
        onehot = jax.nn.one_hot(y, num_classes)
        return -jnp.mean(jnp.sum(onehot * jax.nn.log_softmax(logits), axis=1))

    def block_output(variables, x):
        mm = model.bind(variables)
        h = mm.stem(x.astype(mm.dtype))
        h = mm.run_blocks(h, 0, block_index + 1)
        return h

    h = block_output(variables, x)
    base = tail_loss(variables, h)

    def drop_channel(ch):
        mask = (jnp.arange(out_filters) != ch).astype(h.dtype)
        return tail_loss(variables, h * mask)

    losses = jax.lax.map(drop_channel, jnp.arange(out_filters))
    return np.asarray(losses - base)


METRICS: Dict[str, str] = {
    "l1": "L1 kernel norm (the reference's active metric)",
    "apoz": "average percentage of zeros",
    "taylor": "gradient x activation",
    "leave_one_out": "leave-channel-out loss increase",
    "class_sep": "pairwise class separation",
    "random": "random control (prune_model_random, :552-571)",
}


# ---------------------------------------------------------------------------
# Surgery
# ---------------------------------------------------------------------------

def _slice_block_params(block_params, block_stats, keep: np.ndarray, cfg):
    """Slice the kept hidden channels through expand/dw/se/project."""
    p = flax.core.unfreeze(block_params) if hasattr(flax.core, "unfreeze") else dict(block_params)
    s = dict(block_stats)
    keep = jnp.asarray(keep)

    def take(x, axis):
        return jnp.take(x, keep, axis=axis)

    new_p = jax.tree.map(lambda x: x, p)
    new_s = jax.tree.map(lambda x: x, s)
    if cfg["expand"] != 1:
        new_p["expand_conv"] = {"kernel": take(p["expand_conv"]["kernel"], 3)}
        new_p["expand_bn"] = {k: take(v, 0) for k, v in p["expand_bn"].items()}
        new_s["expand_bn"] = {k: take(v, 0) for k, v in s["expand_bn"].items()}
    new_p["dw_conv"] = {"kernel": take(p["dw_conv"]["kernel"], 3)}
    new_p["dw_bn"] = {k: take(v, 0) for k, v in p["dw_bn"].items()}
    new_s["dw_bn"] = {k: take(v, 0) for k, v in s["dw_bn"].items()}
    if "se" in p:
        se = p["se"]
        new_p["se"] = {
            "reduce": {
                "kernel": take(se["reduce"]["kernel"], 2),
                "bias": se["reduce"]["bias"],
            },
            "expand": {
                "kernel": take(se["expand"]["kernel"], 3),
                "bias": take(se["expand"]["bias"], 0),
            },
        }
    new_p["project_conv"] = {"kernel": take(p["project_conv"]["kernel"], 2)}
    return new_p, new_s


def prune_backbone(
    model,
    variables,
    fraction: float = 0.25,
    metric: str = "l1",
    round_to: int = 16,
    images: Optional[np.ndarray] = None,
    labels: Optional[np.ndarray] = None,
    num_classes: int = 0,
    seed: int = 13,
) -> Tuple[EfficientNet, dict]:
    """Drop the worst ``fraction`` of each block's hidden channels by the
    chosen metric, rounded down to multiples of ``round_to``
    (keras_finetune_prune.py:519-550). Returns (pruned model, variables)."""
    if metric not in METRICS:
        raise ValueError(f"unknown metric {metric!r}; options: {sorted(METRICS)}")
    rng = np.random.default_rng(seed)
    plan = model.plan_configs()
    params = dict(variables["params"])
    stats = dict(variables["batch_stats"])
    overrides: Dict[str, int] = {}

    for bi, cfg in enumerate(plan):
        name = cfg["name"]
        if cfg["expand"] == 1:
            continue  # stage-1 blocks: hidden == input, no expand axis
        hidden = params[name]["expand_conv"]["kernel"].shape[3]
        new_hidden = round_down_multiple(int(hidden * (1.0 - fraction)), round_to)
        if new_hidden >= hidden:
            continue
        if metric == "l1":
            scores = l1_kernel_importance(variables, name)
        elif metric == "random":
            scores = rng.random(hidden)
        elif metric == "apoz":
            assert images is not None, "apoz needs calibration images"
            # APoZ is measured on the post-dw activations (hidden axis)
            scores = apoz_hidden_scores(model, variables, images, bi)
        elif metric == "taylor":
            assert images is not None and labels is not None
            out_scores = taylor_importance(
                model, variables, images, labels, num_classes, bi
            )  # per block OUTPUT channel
            # propagate to the hidden axis through |project_conv|:
            # hidden f matters as much as the output channels it feeds
            proj = np.abs(
                np.asarray(params[name]["project_conv"]["kernel"])
            )[0, 0]  # [F, O]
            scores = proj @ out_scores
        elif metric == "leave_one_out":
            assert images is not None and labels is not None
            out_scores = leave_one_out_importance(
                model, variables, images, labels, num_classes, bi, seed=seed
            )
            proj = np.abs(
                np.asarray(params[name]["project_conv"]["kernel"])
            )[0, 0]
            scores = proj @ np.maximum(out_scores, 0.0)
        else:  # class_sep on hidden activations
            assert images is not None and labels is not None
            scores = class_sep_hidden_scores(model, variables, images, labels, bi)
        keep = np.sort(np.argsort(scores)[::-1][:new_hidden])
        new_p, new_s = _slice_block_params(params[name], stats[name], keep, cfg)
        params[name] = new_p
        stats[name] = new_s
        overrides[name] = new_hidden

    new_model = model.clone(
        hidden_overrides=flax.core.FrozenDict(overrides)
        if hasattr(flax.core, "FrozenDict")
        else overrides,
    )
    new_vars = {"params": params, "batch_stats": stats}
    return new_model, new_vars


# EfficientNet was the first family; surgery is family-generic (MobileNetV2
# is the reference's actual pruning subject, keras_finetune_prune.py:895-928).
prune_efficientnet = prune_backbone


def apoz_hidden_scores(model, variables, images, block_index):
    acts = _block_hidden_activations(
        model, variables, jnp.asarray(images, jnp.float32), block_index
    )
    apoz = jnp.mean((jnp.abs(acts) < 1e-3).astype(jnp.float32), axis=(0, 1, 2))
    return np.asarray(1.0 - apoz)


def class_sep_hidden_scores(model, variables, images, labels, block_index):
    acts = _block_hidden_activations(
        model, variables, jnp.asarray(images, jnp.float32), block_index
    )
    pooled = np.asarray(jnp.mean(acts, axis=(1, 2)))
    labels = np.asarray(labels)
    overall = pooled.mean(axis=0)
    between = np.zeros(pooled.shape[1])
    within = np.zeros(pooled.shape[1])
    for c in np.unique(labels):
        rows = pooled[labels == c]
        mu = rows.mean(axis=0)
        between += len(rows) * (mu - overall) ** 2
        within += ((rows - mu) ** 2).sum(axis=0)
    return between / np.maximum(within, 1e-12)


def parameter_count(variables) -> int:
    return int(sum(p.size for p in jax.tree.leaves(variables["params"])))
