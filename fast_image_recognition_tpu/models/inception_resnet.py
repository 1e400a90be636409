"""InceptionResNetV2 in flax — the reference's flagship gallery producer.

Reference roles reproduced:
- the 1536-d embedding backbone behind ``FEATURES_COUNT=1536``
  (qt_cpp/db.h:79-91): every shipped VGGFace2/CASIA feature file the C++
  search half consumes was written by InceptionResNetV2 with
  ``include_top=False, pooling='avg'`` (qt_cpp/dnn_feature_extractor.py:19-56);
- an alternative multi-exit backbone (tf_keras/sequential_inference.py:361-389
  lists tap layers for non-EfficientNet zoo members).

Architecture follows the standard InceptionResNetV2: a convolutional stem to
35x35, Mixed_5b, 10x Inception-ResNet-A (scale 0.17), Reduction-A, 20x
Inception-ResNet-B (scale 0.10), Reduction-B, 10x Inception-ResNet-C
(scale 0.20, last one linear), then a 1x1 conv to 1536 and global average
pooling. TPU-first choices: NHWC, bf16 compute / fp32 statistics, static
shapes, and the same backbone segment protocol as the MBConv families
(``stem`` / ``run_blocks`` / ``head_pool`` / ``plan_configs``) so the
multi-exit cascade engine works unchanged.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

INCEPTION_RESNET_EMBED_DIM = 1536


class ConvBN(nn.Module):
    filters: int
    kernel: Tuple[int, int] = (1, 1)
    stride: int = 1
    padding: str = "SAME"
    relu: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.filters,
            self.kernel,
            strides=self.stride,
            padding=self.padding,
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.99,
            epsilon=1e-3,
            dtype=self.dtype,
            name="bn",
        )(x)
        return nn.relu(x) if self.relu else x


class Stem(nn.Module):
    """299x299 -> 35x35x192 convolutional stem."""

    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        x = ConvBN(32, (3, 3), 2, "VALID", dtype=d, name="conv1")(x, train)
        x = ConvBN(32, (3, 3), 1, "VALID", dtype=d, name="conv2")(x, train)
        x = ConvBN(64, (3, 3), 1, "SAME", dtype=d, name="conv3")(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        x = ConvBN(80, (1, 1), 1, "VALID", dtype=d, name="conv4")(x, train)
        x = ConvBN(192, (3, 3), 1, "VALID", dtype=d, name="conv5")(x, train)
        return nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")


class Mixed5b(nn.Module):
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        b0 = ConvBN(96, dtype=d, name="b0")(x, train)
        b1 = ConvBN(48, dtype=d, name="b1_0")(x, train)
        b1 = ConvBN(64, (5, 5), dtype=d, name="b1_1")(b1, train)
        b2 = ConvBN(64, dtype=d, name="b2_0")(x, train)
        b2 = ConvBN(96, (3, 3), dtype=d, name="b2_1")(b2, train)
        b2 = ConvBN(96, (3, 3), dtype=d, name="b2_2")(b2, train)
        b3 = nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME",
                         count_include_pad=False)
        b3 = ConvBN(64, dtype=d, name="b3")(b3, train)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)  # 320


class Block35(nn.Module):
    """Inception-ResNet-A (residual scale 0.17)."""

    scale: float = 0.17
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        b0 = ConvBN(32, dtype=d, name="b0")(x, train)
        b1 = ConvBN(32, dtype=d, name="b1_0")(x, train)
        b1 = ConvBN(32, (3, 3), dtype=d, name="b1_1")(b1, train)
        b2 = ConvBN(32, dtype=d, name="b2_0")(x, train)
        b2 = ConvBN(48, (3, 3), dtype=d, name="b2_1")(b2, train)
        b2 = ConvBN(64, (3, 3), dtype=d, name="b2_2")(b2, train)
        mix = jnp.concatenate([b0, b1, b2], axis=-1)
        up = nn.Conv(x.shape[-1], (1, 1), use_bias=True, dtype=d, name="up")(mix)
        return nn.relu(x + self.scale * up)


class Mixed6a(nn.Module):
    """Reduction-A: 35x35x320 -> 17x17x1088."""

    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        b0 = ConvBN(384, (3, 3), 2, "VALID", dtype=d, name="b0")(x, train)
        b1 = ConvBN(256, dtype=d, name="b1_0")(x, train)
        b1 = ConvBN(256, (3, 3), dtype=d, name="b1_1")(b1, train)
        b1 = ConvBN(384, (3, 3), 2, "VALID", dtype=d, name="b1_2")(b1, train)
        b2 = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        return jnp.concatenate([b0, b1, b2], axis=-1)


class Block17(nn.Module):
    """Inception-ResNet-B (residual scale 0.10, 1x7/7x1 factorized)."""

    scale: float = 0.10
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        b0 = ConvBN(192, dtype=d, name="b0")(x, train)
        b1 = ConvBN(128, dtype=d, name="b1_0")(x, train)
        b1 = ConvBN(160, (1, 7), dtype=d, name="b1_1")(b1, train)
        b1 = ConvBN(192, (7, 1), dtype=d, name="b1_2")(b1, train)
        mix = jnp.concatenate([b0, b1], axis=-1)
        up = nn.Conv(x.shape[-1], (1, 1), use_bias=True, dtype=d, name="up")(mix)
        return nn.relu(x + self.scale * up)


class Mixed7a(nn.Module):
    """Reduction-B: 17x17x1088 -> 8x8x2080."""

    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        b0 = ConvBN(256, dtype=d, name="b0_0")(x, train)
        b0 = ConvBN(384, (3, 3), 2, "VALID", dtype=d, name="b0_1")(b0, train)
        b1 = ConvBN(256, dtype=d, name="b1_0")(x, train)
        b1 = ConvBN(288, (3, 3), 2, "VALID", dtype=d, name="b1_1")(b1, train)
        b2 = ConvBN(256, dtype=d, name="b2_0")(x, train)
        b2 = ConvBN(288, (3, 3), dtype=d, name="b2_1")(b2, train)
        b2 = ConvBN(320, (3, 3), 2, "VALID", dtype=d, name="b2_2")(b2, train)
        b3 = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class Block8(nn.Module):
    """Inception-ResNet-C (residual scale 0.20; the final one is linear)."""

    scale: float = 0.20
    apply_relu: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        b0 = ConvBN(192, dtype=d, name="b0")(x, train)
        b1 = ConvBN(192, dtype=d, name="b1_0")(x, train)
        b1 = ConvBN(224, (1, 3), dtype=d, name="b1_1")(b1, train)
        b1 = ConvBN(256, (3, 1), dtype=d, name="b1_2")(b1, train)
        mix = jnp.concatenate([b0, b1], axis=-1)
        up = nn.Conv(x.shape[-1], (1, 1), use_bias=True, dtype=d, name="up")(mix)
        out = x + self.scale * up
        return nn.relu(out) if self.apply_relu else out


def inception_resnet_plan() -> List[Dict[str, Any]]:
    """Flat 'block' list for the segment protocol: the repeated residual
    units plus the mixing/reduction joints, in network order."""
    plan: List[Dict[str, Any]] = [dict(name="mixed5b", kind="mixed5b", stage=1)]
    plan += [dict(name=f"block35_{i+1}", kind="block35", stage=2) for i in range(10)]
    plan += [dict(name="mixed6a", kind="mixed6a", stage=3)]
    plan += [dict(name=f"block17_{i+1}", kind="block17", stage=4) for i in range(20)]
    plan += [dict(name="mixed7a", kind="mixed7a", stage=5)]
    plan += [dict(name=f"block8_{i+1}", kind="block8", stage=6) for i in range(10)]
    return plan


def default_taps_inception_resnet() -> List[str]:
    """Structural analogs of the reference's mid-network tap lists
    (sequential_inference.py:361-389): mid/end of the B stack and mid C."""
    return ["block17_10", "block17_20", "block8_5"]


class InceptionResNetV2(nn.Module):
    """InceptionResNetV2 backbone with segment execution and exit taps.

    ``num_classes=0`` -> pure pooled 1536-d extractor (db.h:79-91)."""

    num_classes: int = 0
    dtype: Any = jnp.bfloat16
    resolution: int = 299

    def setup(self):
        self.plan = inception_resnet_plan()
        self.stem_mod = Stem(dtype=self.dtype, name="stem")
        blocks = []
        n8 = sum(1 for c in self.plan if c["kind"] == "block8")
        seen8 = 0
        for cfg in self.plan:
            kind = cfg["kind"]
            if kind == "mixed5b":
                blocks.append(Mixed5b(dtype=self.dtype, name=cfg["name"]))
            elif kind == "block35":
                blocks.append(Block35(dtype=self.dtype, name=cfg["name"]))
            elif kind == "mixed6a":
                blocks.append(Mixed6a(dtype=self.dtype, name=cfg["name"]))
            elif kind == "block17":
                blocks.append(Block17(dtype=self.dtype, name=cfg["name"]))
            elif kind == "mixed7a":
                blocks.append(Mixed7a(dtype=self.dtype, name=cfg["name"]))
            else:
                seen8 += 1
                blocks.append(
                    Block8(
                        scale=1.0 if seen8 == n8 else 0.20,
                        apply_relu=seen8 != n8,
                        dtype=self.dtype,
                        name=cfg["name"],
                    )
                )
        self.blocks = blocks
        self.head_conv = ConvBN(
            INCEPTION_RESNET_EMBED_DIM, (1, 1), dtype=self.dtype, name="conv_7b"
        )
        if self.num_classes > 0:
            self.dropout = nn.Dropout(rate=0.2)
            self.classifier = nn.Dense(self.num_classes, dtype=jnp.float32, name="fc")

    def block_names(self) -> List[str]:
        return [cfg["name"] for cfg in inception_resnet_plan()]

    def plan_configs(self) -> List[Dict[str, Any]]:
        return inception_resnet_plan()

    def stem(self, x, train: bool = False):
        return self.stem_mod(x.astype(self.dtype), train)

    def head_pool(self, x, train: bool = False):
        x = self.head_conv(x, train)
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
                tap_out[cfg["name"]] = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)
        emb = self.head_pool(x, train=train)
        out: Dict[str, Any] = {"embedding": emb, "taps": tap_out}
        if include_logits and self.num_classes > 0:
            h = self.dropout(emb, deterministic=not train)
            out["logits"] = self.classifier(h)
        return out


def create_inception_resnet_v2(
    num_classes: int = 0,
    seed: int = 0,
    resolution: int = 299,
    dtype: Any = jnp.bfloat16,
) -> Tuple[InceptionResNetV2, Any]:
    """Build the module and init params with a dummy batch. The stem's
    VALID-padded reductions need resolution >= 75."""
    model = InceptionResNetV2(
        num_classes=num_classes, dtype=dtype, resolution=resolution
    )
    dummy = jnp.zeros((1, resolution, resolution, 3), dtype=jnp.float32)
    from functools import partial

    variables = jax.jit(partial(model.init, train=False))(
        {"params": jax.random.PRNGKey(seed)}, dummy
    )
    return model, variables
