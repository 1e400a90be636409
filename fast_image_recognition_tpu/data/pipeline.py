"""Image-list dataset pipeline with on-device augmentation.

Reference: tf_keras/sequential_inference.py:57-326 (duplicated at
keras_finetune_prune.py:617-893 and the notebook) —
- ``create_image_lists``: directory walk, per-class shuffle, split by a
  fixed train count or percentage (:231-269);
- ``ImageListIterator`` + ``get_generators``: Keras iterator loading /
  resizing / augmenting from path lists (:78-229, :305-326), with the
  pruning variant's augmentation: rotation/shift/shear/zoom + horizontal
  flip (keras_finetune_prune.py:865-875).

TPU design: the host side only decodes and resizes (data/extractor
``load_images``); augmentation is one jitted batched affine warp on device
(random rotation/shear/zoom/shift composed into a single 2x3 matrix per
image, bilinear ``map_coordinates``), so the input pipeline never feeds the
MXU from a Python per-image loop.
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class ImageLists:
    train_paths: List[str]
    train_labels: np.ndarray
    val_paths: List[str]
    val_labels: np.ndarray
    class_names: List[str]


def create_image_lists(
    root: str,
    rng: np.random.Generator,
    train_count: Optional[int] = None,
    train_percent: float = 0.8,
    extensions: Sequence[str] = (".jpg", ".jpeg", ".png", ".bmp"),
) -> ImageLists:
    """Directory walk + per-class shuffled split
    (sequential_inference.py:231-269): ``train_count`` images per class, or
    a percentage when None."""
    class_names = sorted(
        d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
    )
    train_paths: List[str] = []
    train_labels: List[int] = []
    val_paths: List[str] = []
    val_labels: List[int] = []
    for ci, cname in enumerate(class_names):
        cdir = os.path.join(root, cname)
        files = sorted(
            f for f in os.listdir(cdir) if f.lower().endswith(tuple(extensions))
        )
        perm = rng.permutation(len(files))
        n_train = (
            min(train_count, len(files))
            if train_count is not None
            else int(np.ceil(train_percent * len(files)))
        )
        for i, p in enumerate(perm):
            path = os.path.join(cdir, files[p])
            if i < n_train:
                train_paths.append(path)
                train_labels.append(ci)
            else:
                val_paths.append(path)
                val_labels.append(ci)
    return ImageLists(
        train_paths,
        np.asarray(train_labels, np.int64),
        val_paths,
        np.asarray(val_labels, np.int64),
        class_names,
    )


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    """keras_finetune_prune.py:865-875 augmentation parameters."""

    rotation_degrees: float = 10.0
    shift_fraction: float = 0.1
    shear: float = 0.1
    zoom: float = 0.1
    horizontal_flip: bool = True


@partial(jax.jit, static_argnames=("cfg",))
def augment_batch(
    images: jax.Array,  # [B, H, W, C] float
    key: jax.Array,
    cfg: AugmentConfig = AugmentConfig(),
) -> jax.Array:
    """One random affine warp per image (rotation+shear+zoom+shift compose
    into a single 2x2 + offset), bilinear resample, optional horizontal
    flip. Fully batched and jitted."""
    b, h, w, c = images.shape
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    theta = jax.random.uniform(
        k1, (b,), minval=-1.0, maxval=1.0
    ) * (cfg.rotation_degrees * np.pi / 180.0)
    shear = jax.random.uniform(k2, (b,), minval=-cfg.shear, maxval=cfg.shear)
    zoom = 1.0 + jax.random.uniform(k3, (b,), minval=-cfg.zoom, maxval=cfg.zoom)
    tx = jax.random.uniform(
        k4, (b,), minval=-cfg.shift_fraction, maxval=cfg.shift_fraction
    ) * h
    ty = jax.random.uniform(
        k5, (b,), minval=-cfg.shift_fraction, maxval=cfg.shift_fraction
    ) * w
    flip = (
        jax.random.bernoulli(k6, 0.5, (b,))
        if cfg.horizontal_flip
        else jnp.zeros((b,), bool)
    )

    cos, sin = jnp.cos(theta), jnp.sin(theta)
    # inverse-map matrix rows (output coords -> input coords)
    a11 = cos / zoom
    a12 = (sin + shear * cos) / zoom
    a21 = -sin / zoom
    a22 = (cos - shear * sin) / zoom

    yy, xx = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32),
        jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yc = yy - cy
    xc = xx - cx

    def warp_one(img, a11, a12, a21, a22, tx, ty, flip):
        src_y = a11 * yc + a12 * xc + cy + tx
        src_x = a21 * yc + a22 * xc + cx + ty
        src_x = jnp.where(flip, (w - 1) - src_x, src_x)
        coords = jnp.stack([src_y.ravel(), src_x.ravel()])
        out = jnp.stack(
            [
                jax.scipy.ndimage.map_coordinates(
                    img[:, :, ch], coords, order=1, mode="nearest"
                ).reshape(h, w)
                for ch in range(c)
            ],
            axis=-1,
        )
        return out

    return jax.vmap(warp_one)(images, a11, a12, a21, a22, tx, ty, flip)


class BatchGenerator:
    """Seeded shuffling batch iterator over in-memory arrays with optional
    on-device augmentation — the ImageListIterator/get_generators analog
    (sequential_inference.py:305-326)."""

    def __init__(
        self,
        images: np.ndarray,
        labels: np.ndarray,
        batch_size: int = 32,
        augment: Optional[AugmentConfig] = None,
        seed: int = 123,  # RANDOM_SEED (sequential_inference.py:30-32)
        shuffle: bool = True,
    ):
        self.images = images
        self.labels = labels
        self.batch_size = batch_size
        self.augment = augment
        self.shuffle = shuffle
        self._rng = np.random.default_rng(seed)
        self._key = jax.random.PRNGKey(seed)
        self.samples = len(labels)

    def __iter__(self):
        order = (
            self._rng.permutation(self.samples)
            if self.shuffle
            else np.arange(self.samples)
        )
        for s in range(0, self.samples, self.batch_size):
            idx = order[s : s + self.batch_size]
            x = jnp.asarray(self.images[idx], jnp.float32)
            if self.augment is not None:
                self._key, sub = jax.random.split(self._key)
                x = augment_batch(x, sub, self.augment)
            yield x, jnp.asarray(self.labels[idx], jnp.int32)

    def __len__(self):
        return -(-self.samples // self.batch_size)
