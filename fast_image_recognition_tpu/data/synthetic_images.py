"""Deterministic many-class synthetic IMAGE dataset (the Caltech-256 regime).

The reference's trained-cascade claims are made on Caltech-256 — 257
classes with heavy intra-class variation, split by
``create_image_lists`` (tf_keras/sequential_inference.py:231-269) and
augmented with rotation/shift/shear/zoom/flip
(tf_keras/prunned/keras_finetune_prune.py:865-875). No real image
dataset ships in this environment, so this module builds a structured
procedural stand-in with the same statistical shape:

- each CLASS is a fixed smooth random texture (a sum of low-frequency
  2-D sinusoids per RGB channel — band-limited, so class identity
  survives resampling) plus a class-specific color cast;
- each INSTANCE applies a random affine warp (rotation/scale/shift —
  the reference's augmentation family), brightness/contrast jitter, and
  additive pixel noise whose per-instance amplitude is drawn from a
  spread, so instances span easy -> hard (the difficulty spread that
  gives early-exit cascades something to exit ON);
- everything derives from ``seed`` — regenerating with the same
  arguments is bit-identical (no files to ship).

Images are uint8 RGB in [0, 255] — the serving surface's native input
(the BN-fold bakes (x - MEAN_RGB)/STDDEV_RGB into the stem). Training
code normalizes as it pleases.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def _class_prototypes(
    num_classes: int, res: int, rng: np.random.Generator, waves: int = 6
) -> np.ndarray:
    """[C, res, res, 3] float32 in [0, 1]: band-limited random textures.

    Frequencies are capped at ~6 cycles/image so a +-25 deg rotation or
    20% zoom changes phase smoothly instead of aliasing class identity
    away."""
    yy, xx = np.meshgrid(
        np.linspace(0.0, 1.0, res, dtype=np.float32),
        np.linspace(0.0, 1.0, res, dtype=np.float32),
        indexing="ij",
    )
    protos = np.zeros((num_classes, res, res, 3), np.float32)
    for c in range(num_classes):
        img = np.zeros((res, res, 3), np.float32)
        for ch in range(3):
            fx = rng.uniform(-6.0, 6.0, waves).astype(np.float32)
            fy = rng.uniform(-6.0, 6.0, waves).astype(np.float32)
            ph = rng.uniform(0, 2 * np.pi, waves).astype(np.float32)
            amp = rng.uniform(0.4, 1.0, waves).astype(np.float32)
            img[..., ch] = np.tensordot(
                np.sin(
                    2.0 * np.pi
                    * (fx[:, None, None] * xx + fy[:, None, None] * yy)
                    + ph[:, None, None]
                ),
                amp,
                axes=(0, 0),
            )
        img -= img.min()
        img /= max(img.max(), 1e-6)
        # class-specific color cast keeps channel statistics distinct
        cast = rng.uniform(0.6, 1.0, 3).astype(np.float32)
        protos[c] = img * cast
    return protos


def _affine_sample(
    proto: np.ndarray,  # [R, R, 3] float32
    angle: float,
    scale: float,
    tx: float,
    ty: float,
) -> np.ndarray:
    """Inverse-mapped affine warp with bilinear sampling and reflect
    padding (one vectorized gather per instance)."""
    r = proto.shape[0]
    c = (r - 1) / 2.0
    yy, xx = np.meshgrid(
        np.arange(r, dtype=np.float32), np.arange(r, dtype=np.float32),
        indexing="ij",
    )
    ca, sa = np.cos(angle), np.sin(angle)
    # inverse transform: out pixel -> source coords
    xs = ((xx - c - tx) * ca + (yy - c - ty) * sa) / scale + c
    ys = (-(xx - c - tx) * sa + (yy - c - ty) * ca) / scale + c
    x0 = np.floor(xs).astype(np.int64)
    y0 = np.floor(ys).astype(np.int64)
    wx = (xs - x0)[..., None]
    wy = (ys - y0)[..., None]

    def at(yi, xi):
        yi = np.abs(yi)
        yi = np.where(yi >= r, 2 * (r - 1) - yi, yi).clip(0, r - 1)
        xi = np.abs(xi)
        xi = np.where(xi >= r, 2 * (r - 1) - xi, xi).clip(0, r - 1)
        return proto[yi, xi]

    top = at(y0, x0) * (1 - wx) + at(y0, x0 + 1) * wx
    bot = at(y0 + 1, x0) * (1 - wx) + at(y0 + 1, x0 + 1) * wx
    return top * (1 - wy) + bot * wy


def make_synthetic_image_dataset(
    num_classes: int = 128,
    per_class: int = 60,
    res: int = 112,
    seed: int = 0,
    max_rotate: float = 0.44,  # radians (~25 deg), keras_finetune_prune.py:869
    scale_range: Tuple[float, float] = (0.8, 1.2),
    max_shift: float = 0.1,  # fraction of res
    noise_lo: float = 0.0,
    noise_hi: float = 0.25,  # per-instance noise amplitude spread
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (images [C*per, res, res, 3] uint8, labels [C*per] int64).

    Instances are grouped by class (labels non-decreasing) and the
    per-instance difficulty (noise amplitude, warp magnitude) is drawn
    uniformly, so any contiguous split keeps the difficulty spread."""
    rng = np.random.default_rng(seed)
    protos = _class_prototypes(num_classes, res, rng)
    n = num_classes * per_class
    images = np.empty((n, res, res, 3), np.uint8)
    labels = np.repeat(np.arange(num_classes, dtype=np.int64), per_class)
    i = 0
    for c in range(num_classes):
        for _ in range(per_class):
            img = _affine_sample(
                protos[c],
                angle=rng.uniform(-max_rotate, max_rotate),
                scale=rng.uniform(*scale_range),
                tx=rng.uniform(-max_shift, max_shift) * res,
                ty=rng.uniform(-max_shift, max_shift) * res,
            )
            bright = rng.uniform(-0.1, 0.1)
            contrast = rng.uniform(0.85, 1.15)
            img = (img - 0.5) * contrast + 0.5 + bright
            img = img + rng.normal(
                0.0, rng.uniform(noise_lo, noise_hi), img.shape
            ).astype(np.float32)
            images[i] = (img.clip(0.0, 1.0) * 255.0).astype(np.uint8)
            i += 1
    return images, labels


def split_synthetic_image_dataset(
    images: np.ndarray,
    labels: np.ndarray,
    train_per_class: int,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """(train_idx, val_idx) — per-class shuffled split, the shared-
    permutation discipline of db_features.cpp:117-162."""
    rng = np.random.default_rng(seed)
    tr, va = [], []
    for c in np.unique(labels):
        idx = rng.permutation(np.nonzero(labels == c)[0])
        tr.append(idx[:train_per_class])
        va.append(idx[train_per_class:])
    return np.concatenate(tr), np.concatenate(va)
