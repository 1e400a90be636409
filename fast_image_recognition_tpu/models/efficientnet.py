"""EfficientNet B0..B7 in flax, designed for multi-exit inference on TPU.

Reference roles reproduced:
- the backbone feature extractor with global average pooling
  (``pooled_features_only`` semantics of qt_cpp/dnn_feature_extractor.py:120-122
  and the Keras ``include_top=False, pooling='avg'`` zoo,
  dnn_feature_extractor.py:52-56);
- ImageNet MEAN_RGB / STDDEV_RGB preprocessing
  (dnn_feature_extractor.py:116-119);
- intermediate exit taps at residual-add block outputs, the mechanism of the
  sequential-inference cascade (tf_keras/sequential_inference.py:359,
  418-435 — ['block5b_add','block5f_add','block6b_add','block6f_add',
  'block7b_add'] for B7).

TPU-first choices: NHWC layout, bf16 compute with fp32 params/statistics,
static shapes, and a ``setup()``-built block list so *segments* of the
network (block range [start, end)) can be applied incrementally — the JAX
analog of the reference's chained ``K.function(input_i -> [act_i, emb_i])``
(sequential_inference.py:418-435), which lets a cascade resume the forward
pass exactly where the previous exit stopped, sharing all computation.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# Official ImageNet preprocessing constants (dnn_feature_extractor.py:116-119).
MEAN_RGB = (0.485 * 255, 0.456 * 255, 0.406 * 255)
STDDEV_RGB = (0.229 * 255, 0.224 * 255, 0.225 * 255)
# Keras "tf"-mode preprocess_input (x/127.5 - 1) — what the reference's zoo
# applies for MobileNet(V2) / Inception* / ResNetV2 members
# (dnn_feature_extractor.py:52-56 calls basemodel.preprocess_input).
TF_MODE_MEAN = (127.5, 127.5, 127.5)
TF_MODE_STD = (127.5, 127.5, 127.5)


@dataclasses.dataclass(frozen=True)
class Variant:
    width: float
    depth: float
    resolution: int
    dropout: float


VARIANTS: Dict[str, Variant] = {
    "b0": Variant(1.0, 1.0, 224, 0.2),
    "b1": Variant(1.0, 1.1, 240, 0.2),
    "b2": Variant(1.1, 1.2, 260, 0.3),
    "b3": Variant(1.2, 1.4, 300, 0.3),
    "b4": Variant(1.4, 1.8, 380, 0.4),
    "b5": Variant(1.6, 2.2, 456, 0.4),
    "b6": Variant(1.8, 2.6, 528, 0.5),
    "b7": Variant(2.0, 3.1, 600, 0.5),
}

# (kernel, stride, expand, in_filters, out_filters, repeats, se_ratio)
_BASE_BLOCKS = (
    (3, 1, 1, 32, 16, 1, 0.25),
    (3, 2, 6, 16, 24, 2, 0.25),
    (5, 2, 6, 24, 40, 2, 0.25),
    (3, 2, 6, 40, 80, 3, 0.25),
    (5, 1, 6, 80, 112, 3, 0.25),
    (5, 2, 6, 112, 192, 4, 0.25),
    (3, 1, 6, 192, 320, 1, 0.25),
)


def round_filters(filters: int, width: float, divisor: int = 8) -> int:
    filters *= width
    new = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new < 0.9 * filters:
        new += divisor
    return int(new)


def round_repeats(repeats: int, depth: float) -> int:
    return int(math.ceil(depth * repeats))


def block_plan(variant: str) -> List[Dict[str, Any]]:
    """Flat list of block configs with reference-style names
    ('block{stage}{letter}', 1-based stage, letter a.. within the stage)."""
    v = VARIANTS[variant]
    plan = []
    for stage, (k, s, e, fi, fo, r, se) in enumerate(_BASE_BLOCKS, start=1):
        fi = round_filters(fi, v.width)
        fo = round_filters(fo, v.width)
        reps = round_repeats(r, v.depth)
        for i in range(reps):
            plan.append(
                dict(
                    name=f"block{stage}{chr(ord('a') + i)}",
                    kernel=k,
                    stride=s if i == 0 else 1,
                    expand=e,
                    in_filters=fi if i == 0 else fo,
                    out_filters=fo,
                    se_ratio=se,
                    stage=stage,
                    activation="swish",
                )
            )
    return plan


_TAP_PRESETS = {
    # the reference's B7 choice (sequential_inference.py:359): two taps
    # inside stage 5, two inside stage 6, one early in stage 7
    "deep": ((5, (0.15, 0.6)), (6, (0.1, 0.45)), (7, (0.0,))),
    # compute-saving ladder: exits from stage 3 on, so the first exit costs
    # ~1/4 of the full forward instead of ~0.6 — the deep preset's first
    # tap caps the cascade's ideal speedup at ~1.5x regardless of engine
    # efficiency (see ARCHITECTURE.md §4)
    "early": ((3, (0.0,)), (4, (0.0,)), (5, (0.0, 0.6)), (6, (0.45,)), (7, (0.0,))),
}


def default_taps(variant: str, preset: str = "deep") -> List[str]:
    """Exit-tap block names placed at fixed fractional stage depths for
    every variant. ``preset='deep'`` places taps analogous to the
    reference's B7 choice (sequential_inference.py:359) — same stages and
    approximate depths; fractional-depth rounding means the exact block
    names differ for b7 (block5c/5g/6b/6g/7a here vs block5b/5f/6b/6f/7b
    there). ``preset='early'`` adds stage-3/4 exits for a compute-saving
    cascade ladder."""
    plan = block_plan(variant)
    by_stage: Dict[int, List[str]] = {}
    for b in plan:
        by_stage.setdefault(b["stage"], []).append(b["name"])
    taps = []
    for stage, fracs in _TAP_PRESETS[preset]:
        names = by_stage[stage]
        for f in fracs:
            taps.append(names[min(int(round(f * len(names))), len(names) - 1)])
    # dedupe, preserve order
    seen = set()
    out = []
    for t in taps:
        if t not in seen:
            seen.add(t)
            out.append(t)
    return out


class SqueezeExcite(nn.Module):
    filters: int
    se_filters: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        se = jnp.mean(x, axis=(1, 2), keepdims=True)
        se = nn.Conv(self.se_filters, (1, 1), dtype=self.dtype, name="reduce")(se)
        se = nn.swish(se)
        se = nn.Conv(self.filters, (1, 1), dtype=self.dtype, name="expand")(se)
        return x * nn.sigmoid(se)


def _activation(name: str):
    if name == "relu6":
        return lambda x: jnp.minimum(nn.relu(x), 6.0)
    return nn.swish


class MBConv(nn.Module):
    """Inverted-residual block: expand 1x1 -> depthwise -> (SE) -> project
    1x1 with a linear bottleneck. Shared by EfficientNet (swish + SE) and
    MobileNetV2 (relu6, no SE) — the same structure the reference's two
    backbone families use (dnn_feature_extractor.py:19-56)."""

    kernel: int
    stride: int
    expand: int
    in_filters: int
    out_filters: int
    se_ratio: float
    drop_rate: float
    dtype: Any = jnp.bfloat16
    # pruned hidden width (models/pruning.py surgery); None = in*expand
    hidden_filters: Optional[int] = None
    activation: str = "swish"

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = _activation(self.activation)
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train,
            momentum=0.99,
            epsilon=1e-3,
            dtype=self.dtype,
            name=name,
        )
        inputs = x
        filters = self.hidden_filters or self.in_filters * self.expand
        if self.expand != 1:
            x = nn.Conv(
                filters, (1, 1), use_bias=False, dtype=self.dtype, name="expand_conv"
            )(x)
            x = act(bn("expand_bn")(x))
        x = nn.Conv(
            filters,
            (self.kernel, self.kernel),
            strides=self.stride,
            padding="SAME",
            feature_group_count=filters,
            use_bias=False,
            dtype=self.dtype,
            name="dw_conv",
        )(x)
        x = act(bn("dw_bn")(x))
        if self.se_ratio > 0:
            se_filters = max(1, int(self.in_filters * self.se_ratio))
            x = SqueezeExcite(filters, se_filters, self.dtype, name="se")(x)
        x = nn.Conv(
            self.out_filters,
            (1, 1),
            use_bias=False,
            dtype=self.dtype,
            name="project_conv",
        )(x)
        x = bn("project_bn")(x)
        if self.stride == 1 and self.in_filters == self.out_filters:
            if train and self.drop_rate > 0:
                # stochastic depth on the residual branch
                keep = 1.0 - self.drop_rate
                rng = self.make_rng("stochastic_depth")
                mask = jax.random.bernoulli(rng, keep, (x.shape[0], 1, 1, 1))
                x = jnp.where(mask, x / keep, 0.0).astype(x.dtype)
            x = x + inputs
        return x


class EfficientNet(nn.Module):
    """EfficientNet backbone with segment execution and exit taps.

    ``num_classes=0`` gives the pure pooled-embedding extractor
    (dnn_feature_extractor.py pooled_features_only semantics).
    """

    variant: str = "b0"
    num_classes: int = 0
    dtype: Any = jnp.bfloat16
    # per-block hidden-width overrides from pruning surgery
    # (models/pruning.py); maps block name -> pruned expanded width
    hidden_overrides: Any = None
    # rematerialize block activations in the backward pass (jax.checkpoint):
    # trades recompute FLOPs for HBM during fine-tuning of big variants
    remat: bool = False

    def setup(self):
        v = VARIANTS[self.variant]
        self.plan = block_plan(self.variant)
        self.stem_filters = round_filters(32, v.width)
        self.head_filters = round_filters(1280, v.width)
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
        total = len(self.plan)
        overrides = dict(self.hidden_overrides or {})
        block_cls = (
            nn.remat(MBConv, static_argnums=(2,)) if self.remat else MBConv
        )
        blocks = []
        for bi, cfg in enumerate(self.plan):
            blocks.append(
                block_cls(
                    kernel=cfg["kernel"],
                    stride=cfg["stride"],
                    expand=cfg["expand"],
                    in_filters=cfg["in_filters"],
                    out_filters=cfg["out_filters"],
                    se_ratio=cfg["se_ratio"],
                    drop_rate=0.2 * bi / total,  # linearly scaled drop-connect
                    dtype=self.dtype,
                    hidden_filters=overrides.get(cfg["name"]),
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
            self.dropout = nn.Dropout(rate=VARIANTS[self.variant].dropout)
            self.classifier = nn.Dense(self.num_classes, dtype=jnp.float32, name="fc")

    def block_names(self) -> List[str]:
        return [cfg["name"] for cfg in block_plan(self.variant)]

    def plan_configs(self) -> List[Dict[str, Any]]:
        """Static block configs — the backbone-protocol hook used by the
        folding (models/inference.py), pruning (models/pruning.py) and
        cascade (cascade/engine.py) machinery across model families."""
        return block_plan(self.variant)

    def stem(self, x, train: bool = False):
        x = self.stem_conv(x)
        return nn.swish(self.stem_bn(x, use_running_average=not train))

    def head_pool(self, x, train: bool = False):
        """Final conv head + GAP -> [B, head_filters] fp32 embedding."""
        x = self.head_conv(x)
        x = nn.swish(self.head_bn(x, use_running_average=not train))
        return jnp.mean(x, axis=(1, 2)).astype(jnp.float32)

    def run_blocks(self, x, start: int, end: int, train: bool = False):
        """Apply blocks [start, end) — the segment primitive for cascades."""
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
        """Full forward. Returns {'embedding': [B, F] fp32 pooled features,
        'taps': {name: GAP embedding at that block}, 'logits': optional}."""
        if include_logits is None:
            include_logits = self.num_classes > 0
        tapset = set(taps or ())
        x = x.astype(self.dtype)
        x = self.stem(x, train=train)
        tap_out: Dict[str, jax.Array] = {}
        for cfg, blk in zip(self.plan, self.blocks):
            x = blk(x, train)
            if cfg["name"] in tapset:
                # GlobalAveragePooling2D exit embedding
                # (sequential_inference.py:420-422)
                tap_out[cfg["name"]] = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)
        emb = self.head_pool(x, train=train)
        out: Dict[str, Any] = {"embedding": emb, "taps": tap_out}
        if include_logits and self.num_classes > 0:
            h = self.dropout(emb, deterministic=not train)
            out["logits"] = self.classifier(h)
        return out


def preprocess_images(
    images: jax.Array,
    resolution: Optional[int] = None,
    mean: Tuple[float, float, float] = MEAN_RGB,
    std: Tuple[float, float, float] = STDDEV_RGB,
) -> jax.Array:
    """uint8/float RGB [B, H, W, 3] -> normalized float, optionally resized.

    Default matches (x - MEAN_RGB) / STDDEV_RGB on 0..255 inputs
    (dnn_feature_extractor.py:116-119); pass TF_MODE_MEAN/STD for the Keras
    'tf'-mode families (x/127.5 - 1)."""
    x = images.astype(jnp.float32)
    if resolution is not None and (
        x.shape[1] != resolution or x.shape[2] != resolution
    ):
        x = jax.image.resize(
            x, (x.shape[0], resolution, resolution, x.shape[3]), method="bilinear"
        )
    return (x - jnp.asarray(mean, jnp.float32)) / jnp.asarray(std, jnp.float32)


def create_efficientnet(
    variant: str = "b0",
    num_classes: int = 0,
    seed: int = 0,
    resolution: Optional[int] = None,
    dtype: Any = jnp.bfloat16,
) -> Tuple[EfficientNet, Any]:
    """Build the module and init params with a dummy batch."""
    model = EfficientNet(variant=variant, num_classes=num_classes, dtype=dtype)
    res = resolution or VARIANTS[variant].resolution
    dummy = jnp.zeros((1, res, res, 3), dtype=jnp.float32)
    # jit the init: ONE compiled program instead of hundreds of tiny
    # dispatches (minutes over the tunneled device)
    variables = jax.jit(partial(model.init, train=False))(
        {"params": jax.random.PRNGKey(seed)}, dummy
    )
    return model, variables


# Keras "caffe"-mode preprocess_input (RGB->BGR + ImageNet channel means,
# no std scaling) — the VGG19 / ResNet50-v1 zoo members
# (dnn_feature_extractor.py:20-23, :41-43).
CAFFE_MEAN_BGR = (103.939, 116.779, 123.68)


def preprocess_images_caffe(
    images: jax.Array, resolution: Optional[int] = None
) -> jax.Array:
    """uint8/float RGB [B, H, W, 3] -> BGR, mean-subtracted (Keras 'caffe'
    mode). The channel flip is part of the weight-layout contract for
    Keras-pretrained VGG/ResNet-v1 checkpoints."""
    x = images.astype(jnp.float32)
    if resolution is not None and (
        x.shape[1] != resolution or x.shape[2] != resolution
    ):
        x = jax.image.resize(
            x, (x.shape[0], resolution, resolution, x.shape[3]), method="bilinear"
        )
    x = x[..., ::-1]  # RGB -> BGR
    return x - jnp.asarray(CAFFE_MEAN_BGR, jnp.float32)
