"""MobileNetV2 in flax — the reference's pruning-study backbone.

Reference roles reproduced:
- the pruning / fine-tuning subject (tf_keras/prunned/keras_finetune_prune.py
  :895-928 builds MobileNetV2 + softmax head; the channel-pruning surgery at
  :519-550 operates on its conv layers);
- a member of the extractor zoo (qt_cpp/dnn_feature_extractor.py:19-56:
  MobileNet/MobileNetV2 with ``include_top=False, pooling='avg'`` produce
  1280-d pooled embeddings).

The module mirrors the backbone protocol of ``models/efficientnet.py``
(``stem`` / ``run_blocks`` / ``head_pool`` / ``block_names`` /
``plan_configs`` / ``hidden_overrides``) so all downstream machinery —
folded inference, channel-pruning surgery, multi-exit cascade segments, the
feature extractor — works unchanged across families. Blocks reuse the same
``MBConv`` inverted-residual module (relu6 activation, no squeeze-excite,
linear bottleneck).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from fast_image_recognition_tpu.models.efficientnet import (
    MBConv,
    _activation,
)

# (expand t, out channels c, repeats n, first stride s) — the standard
# MobileNetV2 inverted-residual settings table.
_MBV2_BLOCKS = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)


def _make_divisible(v: float, divisor: int = 8) -> int:
    """MobileNetV2's channel rounding (round to nearest multiple, never
    dropping more than 10%)."""
    new = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new < 0.9 * v:
        new += divisor
    return int(new)


def mobilenet_plan(width: float = 1.0) -> List[Dict[str, Any]]:
    """Flat block-config list, same schema as efficientnet.block_plan."""
    plan: List[Dict[str, Any]] = []
    fi = _make_divisible(32 * width)
    for stage, (t, c, n, s) in enumerate(_MBV2_BLOCKS, start=1):
        fo = _make_divisible(c * width)
        for i in range(n):
            plan.append(
                dict(
                    name=f"block{stage}{chr(ord('a') + i)}",
                    kernel=3,
                    stride=s if i == 0 else 1,
                    expand=t,
                    in_filters=fi if i == 0 else fo,
                    out_filters=fo,
                    se_ratio=0.0,
                    stage=stage,
                    activation="relu6",
                )
            )
        fi = fo
    return plan


def default_taps_mobilenet(width: float = 1.0) -> List[str]:
    """Exit-tap block names at the same structural points the reference's
    alternative-backbone tap lists use (sequential_inference.py:361-389):
    the last block of stages 3..6 — residual-add outputs at increasing
    depth, leaving the final stage + head as the last level."""
    plan = mobilenet_plan(width)
    by_stage: Dict[int, str] = {}
    for b in plan:
        by_stage[b["stage"]] = b["name"]
    return [by_stage[s] for s in (3, 4, 5, 6)]


class MobileNetV2(nn.Module):
    """MobileNetV2 backbone with segment execution and exit taps.

    ``num_classes=0`` gives the pure pooled-embedding extractor (1280-d at
    width 1.0 — the dnn_feature_extractor.py zoo semantics)."""

    width: float = 1.0
    num_classes: int = 0
    dtype: Any = jnp.bfloat16
    hidden_overrides: Any = None  # per-block pruned hidden widths
    resolution: int = 224

    def setup(self):
        self.plan = mobilenet_plan(self.width)
        self.stem_filters = _make_divisible(32 * self.width)
        # last conv never narrows below 1280 (standard width-mult rule)
        self.head_filters = _make_divisible(1280 * max(self.width, 1.0))
        self.stem_conv = nn.Conv(
            self.stem_filters,
            (3, 3),
            strides=2,
            padding="SAME",
            use_bias=False,
            dtype=self.dtype,
            name="stem_conv",
        )
        self.stem_bn = nn.BatchNorm(
            momentum=0.99, epsilon=1e-3, dtype=self.dtype, name="stem_bn"
        )
        overrides = dict(self.hidden_overrides or {})
        blocks = []
        for cfg in self.plan:
            blocks.append(
                MBConv(
                    kernel=cfg["kernel"],
                    stride=cfg["stride"],
                    expand=cfg["expand"],
                    in_filters=cfg["in_filters"],
                    out_filters=cfg["out_filters"],
                    se_ratio=0.0,
                    drop_rate=0.0,  # MobileNetV2 has no stochastic depth
                    dtype=self.dtype,
                    hidden_filters=overrides.get(cfg["name"]),
                    activation="relu6",
                    name=cfg["name"],
                )
            )
        self.blocks = blocks
        self.head_conv = nn.Conv(
            self.head_filters,
            (1, 1),
            use_bias=False,
            dtype=self.dtype,
            name="head_conv",
        )
        self.head_bn = nn.BatchNorm(
            momentum=0.99, epsilon=1e-3, dtype=self.dtype, name="head_bn"
        )
        if self.num_classes > 0:
            self.dropout = nn.Dropout(rate=0.2)
            self.classifier = nn.Dense(self.num_classes, dtype=jnp.float32, name="fc")

    def block_names(self) -> List[str]:
        return [cfg["name"] for cfg in mobilenet_plan(self.width)]

    def plan_configs(self) -> List[Dict[str, Any]]:
        return mobilenet_plan(self.width)

    def stem(self, x, train: bool = False):
        act = _activation("relu6")
        x = self.stem_conv(x)
        return act(self.stem_bn(x, use_running_average=not train))

    def head_pool(self, x, train: bool = False):
        act = _activation("relu6")
        x = self.head_conv(x)
        x = act(self.head_bn(x, use_running_average=not train))
        return jnp.mean(x, axis=(1, 2)).astype(jnp.float32)

    def run_blocks(self, x, start: int, end: int, train: bool = False):
        for b in self.blocks[start:end]:
            x = b(x, train)
        return x

    def __call__(
        self,
        x,
        train: bool = False,
        taps: Optional[Sequence[str]] = None,
        include_logits: Optional[bool] = None,
    ) -> Dict[str, Any]:
        if include_logits is None:
            include_logits = self.num_classes > 0
        tapset = set(taps or ())
        x = x.astype(self.dtype)
        x = self.stem(x, train=train)
        tap_out: Dict[str, jax.Array] = {}
        for cfg, blk in zip(self.plan, self.blocks):
            x = blk(x, train)
            if cfg["name"] in tapset:
                tap_out[cfg["name"]] = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)
        emb = self.head_pool(x, train=train)
        out: Dict[str, Any] = {"embedding": emb, "taps": tap_out}
        if include_logits and self.num_classes > 0:
            h = self.dropout(emb, deterministic=not train)
            out["logits"] = self.classifier(h)
        return out


def create_mobilenetv2(
    width: float = 1.0,
    num_classes: int = 0,
    seed: int = 0,
    resolution: int = 224,
    dtype: Any = jnp.bfloat16,
) -> Tuple[MobileNetV2, Any]:
    """Build the module and init params with a dummy batch."""
    model = MobileNetV2(
        width=width, num_classes=num_classes, dtype=dtype, resolution=resolution
    )
    dummy = jnp.zeros((1, resolution, resolution, 3), dtype=jnp.float32)
    from functools import partial

    variables = jax.jit(partial(model.init, train=False))(
        {"params": jax.random.PRNGKey(seed)}, dummy
    )
    return model, variables


# ---------------------------------------------------------------------------
# MobileNet V1 — the other mobilenet zoo member
# (dnn_feature_extractor.py:24-26, sequential_inference.py:369-372)
# ---------------------------------------------------------------------------

# (out channels, stride) per depthwise-separable layer — standard V1 table
_MBV1_LAYERS = (
    (64, 1), (128, 2), (128, 1), (256, 2), (256, 1), (512, 2),
    (512, 1), (512, 1), (512, 1), (512, 1), (512, 1), (1024, 2), (1024, 1),
)


def mobilenet_v1_plan(width: float = 1.0) -> List[Dict[str, Any]]:
    plan: List[Dict[str, Any]] = []
    fi = _make_divisible(32 * width)
    for i, (c, s) in enumerate(_MBV1_LAYERS, start=1):
        fo = _make_divisible(c * width)
        plan.append(
            dict(name=f"conv_dw_{i}", stride=s, in_filters=fi, out_filters=fo,
                 stage=i)
        )
        fi = fo
    return plan


def default_taps_mobilenet_v1(width: float = 1.0) -> List[str]:
    # structural analog of the reference's mid-network tap: the last
    # full-resolution separable before each downsampling step's tail
    return ["conv_dw_5", "conv_dw_11"]


class DepthwiseSeparable(nn.Module):
    """V1 layer: depthwise 3x3 (+BN+relu6) then pointwise 1x1 (+BN+relu6) —
    unlike MBConv's linear bottleneck, the pointwise output IS activated."""

    out_filters: int
    stride: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = _activation("relu6")
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.99, epsilon=1e-3,
            dtype=self.dtype, name=name,
        )
        c = x.shape[-1]
        x = nn.Conv(
            c, (3, 3), strides=self.stride, padding="SAME",
            feature_group_count=c, use_bias=False, dtype=self.dtype,
            name="dw_conv",
        )(x)
        x = act(bn("dw_bn")(x))
        x = nn.Conv(
            self.out_filters, (1, 1), use_bias=False, dtype=self.dtype,
            name="pw_conv",
        )(x)
        return act(bn("pw_bn")(x))


class MobileNetV1(nn.Module):
    """``num_classes=0`` -> pure pooled 1024-d extractor."""

    width: float = 1.0
    num_classes: int = 0
    dtype: Any = jnp.bfloat16
    resolution: int = 224

    def setup(self):
        self.plan = mobilenet_v1_plan(self.width)
        self.stem_conv = nn.Conv(
            _make_divisible(32 * self.width), (3, 3), strides=2,
            padding="SAME", use_bias=False, dtype=self.dtype, name="stem_conv",
        )
        self.stem_bn = nn.BatchNorm(
            momentum=0.99, epsilon=1e-3, dtype=self.dtype, name="stem_bn"
        )
        self.blocks = [
            DepthwiseSeparable(
                out_filters=cfg["out_filters"], stride=cfg["stride"],
                dtype=self.dtype, name=cfg["name"],
            )
            for cfg in self.plan
        ]
        if self.num_classes > 0:
            self.classifier = nn.Dense(
                self.num_classes, dtype=jnp.float32, name="fc"
            )

    def block_names(self) -> List[str]:
        return [c["name"] for c in mobilenet_v1_plan(self.width)]

    def plan_configs(self) -> List[Dict[str, Any]]:
        return mobilenet_v1_plan(self.width)

    def stem(self, x, train: bool = False):
        act = _activation("relu6")
        x = self.stem_conv(x.astype(self.dtype))
        return act(self.stem_bn(x, use_running_average=not train))

    def head_pool(self, x, train: bool = False):
        return jnp.mean(x, axis=(1, 2)).astype(jnp.float32)

    def run_blocks(self, x, start: int, end: int, train: bool = False):
        for b in self.blocks[start:end]:
            x = b(x, train)
        return x

    def __call__(
        self,
        x,
        train: bool = False,
        taps: Optional[Sequence[str]] = None,
        include_logits: Optional[bool] = None,
    ) -> Dict[str, Any]:
        if include_logits is None:
            include_logits = self.num_classes > 0
        tapset = set(taps or ())
        x = self.stem(x, train=train)
        tap_out: Dict[str, jax.Array] = {}
        for cfg, blk in zip(self.plan, self.blocks):
            x = blk(x, train)
            if cfg["name"] in tapset:
                tap_out[cfg["name"]] = jnp.mean(x, axis=(1, 2)).astype(
                    jnp.float32
                )
        emb = self.head_pool(x)
        out: Dict[str, Any] = {"embedding": emb, "taps": tap_out}
        if include_logits and self.num_classes > 0:
            out["logits"] = self.classifier(emb)
        return out


def create_mobilenet_v1(
    width: float = 1.0,
    num_classes: int = 0,
    seed: int = 0,
    resolution: int = 224,
    dtype: Any = jnp.bfloat16,
) -> Tuple[MobileNetV1, Any]:
    model = MobileNetV1(
        width=width, num_classes=num_classes, dtype=dtype, resolution=resolution
    )
    dummy = jnp.zeros((1, resolution, resolution, 3), dtype=jnp.float32)
    from functools import partial

    variables = jax.jit(partial(model.init, train=False))(
        {"params": jax.random.PRNGKey(seed)}, dummy
    )
    return model, variables
