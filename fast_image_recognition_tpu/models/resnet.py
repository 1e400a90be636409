"""ResNet v1/v2 in flax — reference zoo members ResNet50 and ResNet152V2.

Reference roles reproduced:
- extractor zoo members with ``include_top=False, pooling='avg'`` (2048-d
  pooled embeddings, qt_cpp/dnn_feature_extractor.py:19-56);
- the ResNet152V2 multi-exit alternative backbone with tap layers
  ``conv4_block1_out / conv4_block18_out / conv4_block36_out``
  (tf_keras/sequential_inference.py:383-386) and the ResNet50 variant
  (:387-389).

Architecture follows keras.applications.resnet:
- v1 (ResNet50): conv-BN-relu bottlenecks, downsampling on the FIRST block
  of each stage, post-add relu; stem 7x7/2 + BN/relu + maxpool.
- v2 (ResNet{50,101,152}V2): full pre-activation bottlenecks, downsampling
  on the LAST block of stages 2-4, no stem BN, final post_bn + relu before
  pooling.

Block names use the Keras convention (``conv{stage}_block{i}``) so the
reference's tap lists work verbatim. Backbone protocol (stem / run_blocks
/ head_pool / plan_configs / taps) matches the other families, so the
cascade engine, extractor and trainer work unchanged.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

RESNET_EMBED_DIM = 2048

# stage block counts per variant
_DEPTHS = {
    "resnet50": (3, 4, 6, 3),
    "resnet50v2": (3, 4, 6, 3),
    "resnet101v2": (3, 4, 23, 3),
    "resnet152v2": (3, 8, 36, 3),
}
_FILTERS = (64, 128, 256, 512)  # bottleneck width per stage (out = 4x)


def resnet_plan(variant: str) -> List[Dict[str, Any]]:
    """Flat block list, Keras names, with the per-variant stride placement
    (v1: stride on block1 of stages 3-5; v2: stride on the LAST block of
    stages 2-4)."""
    v2 = variant.endswith("v2")
    plan: List[Dict[str, Any]] = []
    for s, (blocks, f) in enumerate(zip(_DEPTHS[variant], _FILTERS), start=2):
        for i in range(1, blocks + 1):
            if v2:
                stride = 2 if (i == blocks and s != 5) else 1
                conv_shortcut = i == 1
            else:
                stride = 2 if (i == 1 and s != 2) else 1
                conv_shortcut = i == 1
            plan.append(
                dict(
                    name=f"conv{s}_block{i}",
                    filters=f,
                    stride=stride,
                    conv_shortcut=conv_shortcut,
                    stage=s,
                )
            )
    return plan


def default_taps_resnet(variant: str) -> List[str]:
    """The reference's ResNet152V2 tap list verbatim
    (sequential_inference.py:385); structural equivalents for the others
    (first / middle / last block of stage 4)."""
    if variant == "resnet152v2":
        return ["conv4_block1", "conv4_block18", "conv4_block36"]
    n4 = _DEPTHS[variant][2]
    return [f"conv4_block{i}" for i in dict.fromkeys((1, max(1, n4 // 2), n4))]


class BottleneckV2(nn.Module):
    """Full pre-activation bottleneck (keras block2)."""

    filters: int
    stride: int = 1
    conv_shortcut: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.99, epsilon=1.001e-5,
            dtype=self.dtype, name=name,
        )
        preact = nn.relu(bn("preact_bn")(x))
        if self.conv_shortcut:
            shortcut = nn.Conv(
                4 * self.filters, (1, 1), strides=self.stride,
                dtype=self.dtype, name="shortcut_conv",
            )(preact)
        elif self.stride > 1:
            shortcut = nn.max_pool(x, (1, 1), strides=(self.stride,) * 2)
        else:
            shortcut = x
        h = nn.Conv(
            self.filters, (1, 1), use_bias=False, dtype=self.dtype, name="conv1"
        )(preact)
        h = nn.relu(bn("bn1")(h))
        # keras.applications.resnet block2 pads the strided 3x3 with
        # ZeroPadding2D((1,1),(1,1)) + VALID, i.e. explicit (1,1) pads; XLA
        # SAME at stride 2 on even inputs pads (0,1) — a one-pixel
        # receptive-field shift that would break ported v2 checkpoints.
        # Stride-1 SAME is identical to (1,1) explicit, so always explicit.
        h = nn.Conv(
            self.filters, (3, 3), strides=self.stride,
            padding=[(1, 1), (1, 1)],
            use_bias=False, dtype=self.dtype, name="conv2",
        )(h)
        h = nn.relu(bn("bn2")(h))
        h = nn.Conv(4 * self.filters, (1, 1), dtype=self.dtype, name="conv3")(h)
        return shortcut + h


class BottleneckV1(nn.Module):
    """Classic conv-BN-relu bottleneck (keras block1)."""

    filters: int
    stride: int = 1
    conv_shortcut: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.99, epsilon=1.001e-5,
            dtype=self.dtype, name=name,
        )
        if self.conv_shortcut:
            shortcut = nn.Conv(
                4 * self.filters, (1, 1), strides=self.stride,
                dtype=self.dtype, name="shortcut_conv",
            )(x)
            shortcut = bn("shortcut_bn")(shortcut)
        else:
            shortcut = x
        h = nn.Conv(
            self.filters, (1, 1), strides=self.stride, dtype=self.dtype,
            name="conv1",
        )(x)
        h = nn.relu(bn("bn1")(h))
        h = nn.Conv(
            self.filters, (3, 3), padding="SAME", dtype=self.dtype, name="conv2"
        )(h)
        h = nn.relu(bn("bn2")(h))
        h = nn.Conv(4 * self.filters, (1, 1), dtype=self.dtype, name="conv3")(h)
        h = bn("bn3")(h)
        return nn.relu(shortcut + h)


class ResNet(nn.Module):
    """ResNet v1/v2 backbone with segment execution and exit taps.

    ``num_classes=0`` -> pure pooled 2048-d extractor."""

    variant: str = "resnet152v2"
    num_classes: int = 0
    dtype: Any = jnp.bfloat16
    resolution: int = 224

    @property
    def v2(self) -> bool:
        return self.variant.endswith("v2")

    def setup(self):
        self.plan = resnet_plan(self.variant)
        self.stem_conv = nn.Conv(
            64, (7, 7), strides=2, padding=[(3, 3), (3, 3)],
            use_bias=True, dtype=self.dtype, name="conv1_conv",
        )
        if not self.v2:
            self.stem_bn = nn.BatchNorm(
                momentum=0.99, epsilon=1.001e-5, dtype=self.dtype,
                name="conv1_bn",
            )
        blocks = []
        Block = BottleneckV2 if self.v2 else BottleneckV1
        for cfg in self.plan:
            blocks.append(
                Block(
                    filters=cfg["filters"],
                    stride=cfg["stride"],
                    conv_shortcut=cfg["conv_shortcut"],
                    dtype=self.dtype,
                    name=cfg["name"],
                )
            )
        self.blocks = blocks
        if self.v2:
            self.post_bn = nn.BatchNorm(
                momentum=0.99, epsilon=1.001e-5, dtype=self.dtype,
                name="post_bn",
            )
        if self.num_classes > 0:
            self.classifier = nn.Dense(
                self.num_classes, dtype=jnp.float32, name="fc"
            )

    def block_names(self) -> List[str]:
        return [c["name"] for c in resnet_plan(self.variant)]

    def plan_configs(self) -> List[Dict[str, Any]]:
        return resnet_plan(self.variant)

    def stem(self, x, train: bool = False):
        x = self.stem_conv(x.astype(self.dtype))
        if not self.v2:
            x = nn.relu(self.stem_bn(x, use_running_average=not train))
        return nn.max_pool(
            x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)]
        )

    def head_pool(self, x, train: bool = False):
        if self.v2:
            x = nn.relu(self.post_bn(x, use_running_average=not train))
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
        emb = self.head_pool(x, train=train)
        out: Dict[str, Any] = {"embedding": emb, "taps": tap_out}
        if include_logits and self.num_classes > 0:
            out["logits"] = self.classifier(emb)
        return out


def create_resnet(
    variant: str = "resnet152v2",
    num_classes: int = 0,
    seed: int = 0,
    resolution: int = 224,
    dtype: Any = jnp.bfloat16,
) -> Tuple[ResNet, Any]:
    model = ResNet(
        variant=variant, num_classes=num_classes, dtype=dtype,
        resolution=resolution,
    )
    dummy = jnp.zeros((1, resolution, resolution, 3), dtype=jnp.float32)
    from functools import partial

    variables = jax.jit(partial(model.init, train=False))(
        {"params": jax.random.PRNGKey(seed)}, dummy
    )
    return model, variables
