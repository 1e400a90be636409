"""VGG19 in flax — reference zoo member.

Reference role: extractor zoo member with ``include_top=False,
pooling='avg'`` — 512-d pooled embeddings
(qt_cpp/dnn_feature_extractor.py:19-23, tf_keras/sequential_inference.py
:362-364). Architecture follows keras.applications.vgg19 (conv layers with
bias + relu, 2x2 maxpools between the five conv stages).

The backbone protocol treats each conv layer as a "block" (VGG has no
residual structure); taps default to the last conv of stages 3 and 4.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

VGG19_EMBED_DIM = 512

# (stage, convs per stage, filters) — VGG19
_VGG19_STAGES = ((1, 2, 64), (2, 2, 128), (3, 4, 256), (4, 4, 512), (5, 4, 512))


def vgg_plan() -> List[Dict[str, Any]]:
    plan: List[Dict[str, Any]] = []
    for stage, convs, f in _VGG19_STAGES:
        for i in range(1, convs + 1):
            plan.append(
                dict(
                    name=f"block{stage}_conv{i}",
                    filters=f,
                    stage=stage,
                    # a maxpool follows the LAST conv of each stage
                    pool_after=i == convs,
                )
            )
    return plan


def default_taps_vgg() -> List[str]:
    return ["block3_conv4", "block4_conv4"]


class VGG19(nn.Module):
    """``num_classes=0`` -> pure pooled 512-d extractor."""

    num_classes: int = 0
    dtype: Any = jnp.bfloat16
    resolution: int = 224

    def setup(self):
        self.plan = vgg_plan()
        self.convs = [
            nn.Conv(
                cfg["filters"], (3, 3), padding="SAME", dtype=self.dtype,
                name=cfg["name"],
            )
            for cfg in self.plan
        ]
        if self.num_classes > 0:
            self.classifier = nn.Dense(
                self.num_classes, dtype=jnp.float32, name="fc"
            )

    def block_names(self) -> List[str]:
        return [c["name"] for c in vgg_plan()]

    def plan_configs(self) -> List[Dict[str, Any]]:
        return vgg_plan()

    def stem(self, x, train: bool = False):
        return x.astype(self.dtype)  # VGG has no stem; convs start directly

    def head_pool(self, x, train: bool = False):
        return jnp.mean(x, axis=(1, 2)).astype(jnp.float32)

    def run_blocks(self, x, start: int, end: int, train: bool = False):
        for cfg, conv in list(zip(self.plan, self.convs))[start:end]:
            x = nn.relu(conv(x))
            if cfg["pool_after"]:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
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
        x = self.stem(x)
        tap_out: Dict[str, jax.Array] = {}
        for cfg, conv in zip(self.plan, self.convs):
            x = nn.relu(conv(x))
            if cfg["name"] in tapset:
                tap_out[cfg["name"]] = jnp.mean(x, axis=(1, 2)).astype(
                    jnp.float32
                )
            if cfg["pool_after"]:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        emb = self.head_pool(x)
        out: Dict[str, Any] = {"embedding": emb, "taps": tap_out}
        if include_logits and self.num_classes > 0:
            out["logits"] = self.classifier(emb)
        return out


def create_vgg19(
    num_classes: int = 0,
    seed: int = 0,
    resolution: int = 224,
    dtype: Any = jnp.bfloat16,
) -> Tuple[VGG19, Any]:
    model = VGG19(num_classes=num_classes, dtype=dtype, resolution=resolution)
    dummy = jnp.zeros((1, resolution, resolution, 3), dtype=jnp.float32)
    from functools import partial

    variables = jax.jit(partial(model.init, train=False))(
        {"params": jax.random.PRNGKey(seed)}, dummy
    )
    return model, variables
