"""InceptionV3 in flax — reference zoo member and fine-tune subject.

Reference roles reproduced:
- extractor zoo member (2048-d pooled embedding,
  qt_cpp/dnn_feature_extractor.py:27-30 — the `elif True` branch actually
  selected in the shipped extractor);
- the fine-tuning subject of tf_keras/train_model.ipynb (InceptionV3 +
  softmax head, frozen-then-unfrozen two-phase training — covered here by
  models/train.py over this backbone's taps).

Architecture follows keras.applications.inception_v3: the 35x35 Inception
blocks (mixed0-2), the 17x17 factorized-7x7 blocks (mixed4-7), the 8x8
expanded blocks (mixed9-10) and the two grid reductions (mixed3, mixed8).
Each unit is conv->BN->relu (reusing the ConvBN module of the
inception_resnet family; our BN keeps a scale parameter where Keras sets
scale=False — an initialization detail, not an architectural one).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from fast_image_recognition_tpu.models.inception_resnet import ConvBN

INCEPTION_V3_EMBED_DIM = 2048


class StemV3(nn.Module):
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


class Mixed35(nn.Module):
    """35x35 Inception block (mixed0-2); pool branch width varies."""

    pool_filters: int = 32
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        b0 = ConvBN(64, dtype=d, name="b0")(x, train)
        b1 = ConvBN(48, dtype=d, name="b1_0")(x, train)
        b1 = ConvBN(64, (5, 5), dtype=d, name="b1_1")(b1, train)
        b2 = ConvBN(64, dtype=d, name="b2_0")(x, train)
        b2 = ConvBN(96, (3, 3), dtype=d, name="b2_1")(b2, train)
        b2 = ConvBN(96, (3, 3), dtype=d, name="b2_2")(b2, train)
        bp = nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME",
                         count_include_pad=False)
        bp = ConvBN(self.pool_filters, dtype=d, name="bp")(bp, train)
        return jnp.concatenate([b0, b1, b2, bp], axis=-1)


class Mixed3(nn.Module):
    """Grid reduction 35x35 -> 17x17x768."""

    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        b0 = ConvBN(384, (3, 3), 2, "VALID", dtype=d, name="b0")(x, train)
        b1 = ConvBN(64, dtype=d, name="b1_0")(x, train)
        b1 = ConvBN(96, (3, 3), dtype=d, name="b1_1")(b1, train)
        b1 = ConvBN(96, (3, 3), 2, "VALID", dtype=d, name="b1_2")(b1, train)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        return jnp.concatenate([b0, b1, bp], axis=-1)


class Mixed17(nn.Module):
    """17x17 factorized-7x7 block (mixed4-7); inner width varies."""

    inner: int = 128
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        d, c = self.dtype, self.inner
        b0 = ConvBN(192, dtype=d, name="b0")(x, train)
        b1 = ConvBN(c, dtype=d, name="b1_0")(x, train)
        b1 = ConvBN(c, (1, 7), dtype=d, name="b1_1")(b1, train)
        b1 = ConvBN(192, (7, 1), dtype=d, name="b1_2")(b1, train)
        b2 = ConvBN(c, dtype=d, name="b2_0")(x, train)
        b2 = ConvBN(c, (7, 1), dtype=d, name="b2_1")(b2, train)
        b2 = ConvBN(c, (1, 7), dtype=d, name="b2_2")(b2, train)
        b2 = ConvBN(c, (7, 1), dtype=d, name="b2_3")(b2, train)
        b2 = ConvBN(192, (1, 7), dtype=d, name="b2_4")(b2, train)
        bp = nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME",
                         count_include_pad=False)
        bp = ConvBN(192, dtype=d, name="bp")(bp, train)
        return jnp.concatenate([b0, b1, b2, bp], axis=-1)


class Mixed8(nn.Module):
    """Grid reduction 17x17 -> 8x8x1280."""

    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        b0 = ConvBN(192, dtype=d, name="b0_0")(x, train)
        b0 = ConvBN(320, (3, 3), 2, "VALID", dtype=d, name="b0_1")(b0, train)
        b1 = ConvBN(192, dtype=d, name="b1_0")(x, train)
        b1 = ConvBN(192, (1, 7), dtype=d, name="b1_1")(b1, train)
        b1 = ConvBN(192, (7, 1), dtype=d, name="b1_2")(b1, train)
        b1 = ConvBN(192, (3, 3), 2, "VALID", dtype=d, name="b1_3")(b1, train)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        return jnp.concatenate([b0, b1, bp], axis=-1)


class Mixed8x8(nn.Module):
    """8x8 expanded block (mixed9-10) with the split 1x3/3x1 branches."""

    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        b0 = ConvBN(320, dtype=d, name="b0")(x, train)
        b1 = ConvBN(384, dtype=d, name="b1_0")(x, train)
        b1a = ConvBN(384, (1, 3), dtype=d, name="b1_1a")(b1, train)
        b1b = ConvBN(384, (3, 1), dtype=d, name="b1_1b")(b1, train)
        b1 = jnp.concatenate([b1a, b1b], axis=-1)
        b2 = ConvBN(448, dtype=d, name="b2_0")(x, train)
        b2 = ConvBN(384, (3, 3), dtype=d, name="b2_1")(b2, train)
        b2a = ConvBN(384, (1, 3), dtype=d, name="b2_2a")(b2, train)
        b2b = ConvBN(384, (3, 1), dtype=d, name="b2_2b")(b2, train)
        b2 = jnp.concatenate([b2a, b2b], axis=-1)
        bp = nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME",
                         count_include_pad=False)
        bp = ConvBN(192, dtype=d, name="bp")(bp, train)
        return jnp.concatenate([b0, b1, b2, bp], axis=-1)


def inception_v3_plan() -> List[Dict[str, Any]]:
    plan: List[Dict[str, Any]] = []
    plan += [dict(name=f"mixed{i}", kind="mixed35",
                  pool_filters=32 if i == 0 else 64, stage=1)
             for i in range(3)]
    plan += [dict(name="mixed3", kind="mixed3", stage=2)]
    inner = {4: 128, 5: 160, 6: 160, 7: 192}
    plan += [dict(name=f"mixed{i}", kind="mixed17", inner=inner[i], stage=3)
             for i in range(4, 8)]
    plan += [dict(name="mixed8", kind="mixed8", stage=4)]
    plan += [dict(name=f"mixed{i}", kind="mixed8x8", stage=5)
             for i in (9, 10)]
    return plan


def default_taps_inception_v3() -> List[str]:
    return ["mixed4", "mixed7", "mixed9"]


class InceptionV3(nn.Module):
    """``num_classes=0`` -> pure pooled 2048-d extractor."""

    num_classes: int = 0
    dtype: Any = jnp.bfloat16
    resolution: int = 299

    def setup(self):
        self.plan = inception_v3_plan()
        self.stem_mod = StemV3(dtype=self.dtype, name="stem")
        blocks = []
        for cfg in self.plan:
            kind = cfg["kind"]
            if kind == "mixed35":
                blocks.append(
                    Mixed35(pool_filters=cfg["pool_filters"], dtype=self.dtype,
                            name=cfg["name"])
                )
            elif kind == "mixed3":
                blocks.append(Mixed3(dtype=self.dtype, name=cfg["name"]))
            elif kind == "mixed17":
                blocks.append(
                    Mixed17(inner=cfg["inner"], dtype=self.dtype,
                            name=cfg["name"])
                )
            elif kind == "mixed8":
                blocks.append(Mixed8(dtype=self.dtype, name=cfg["name"]))
            else:
                blocks.append(Mixed8x8(dtype=self.dtype, name=cfg["name"]))
        self.blocks = blocks
        if self.num_classes > 0:
            self.dropout = nn.Dropout(rate=0.2)
            self.classifier = nn.Dense(
                self.num_classes, dtype=jnp.float32, name="fc"
            )

    def block_names(self) -> List[str]:
        return [c["name"] for c in inception_v3_plan()]

    def plan_configs(self) -> List[Dict[str, Any]]:
        return inception_v3_plan()

    def stem(self, x, train: bool = False):
        return self.stem_mod(x.astype(self.dtype), train)

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
            h = self.dropout(emb, deterministic=not train)
            out["logits"] = self.classifier(h)
        return out


def create_inception_v3(
    num_classes: int = 0,
    seed: int = 0,
    resolution: int = 299,
    dtype: Any = jnp.bfloat16,
) -> Tuple[InceptionV3, Any]:
    """The stem's VALID reductions need resolution >= 75."""
    model = InceptionV3(
        num_classes=num_classes, dtype=dtype, resolution=resolution
    )
    dummy = jnp.zeros((1, resolution, resolution, 3), dtype=jnp.float32)
    from functools import partial

    variables = jax.jit(partial(model.init, train=False))(
        {"params": jax.random.PRNGKey(seed)}, dummy
    )
    return model, variables
