"""Many-class procedural image dataset (the Caltech-256 regime stand-in,
tf_keras/sequential_inference.py:231-269): determinism, shape contract,
class separability, and split discipline."""

import numpy as np

from fast_image_recognition_tpu.data.synthetic_images import (
    make_synthetic_image_dataset,
    split_synthetic_image_dataset,
)


def test_deterministic_and_shapes():
    x, y = make_synthetic_image_dataset(12, 6, 48, seed=5)
    x2, y2 = make_synthetic_image_dataset(12, 6, 48, seed=5)
    assert x.shape == (72, 48, 48, 3) and x.dtype == np.uint8
    np.testing.assert_array_equal(x, x2)
    np.testing.assert_array_equal(y, y2)
    x3, _ = make_synthetic_image_dataset(12, 6, 48, seed=6)
    assert (x != x3).any()


def test_classes_are_separable_but_not_trivial():
    """Nearest-class-mean in pixel space should be strong (structured
    classes) but imperfect (instances carry real augmentation noise)."""
    x, y = make_synthetic_image_dataset(16, 10, 48, seed=1)
    xf = x.reshape(len(x), -1).astype(np.float32)
    means = np.stack([xf[y == c].mean(0) for c in range(16)])
    pred = ((xf[:, None, :] - means[None]) ** 2).sum(-1).argmin(1)
    acc = (pred == y).mean()
    assert 0.8 <= acc < 1.0, acc


def test_split_per_class_counts():
    x, y = make_synthetic_image_dataset(8, 10, 32, seed=2)
    tr, va = split_synthetic_image_dataset(x, y, train_per_class=7, seed=0)
    assert len(tr) == 56 and len(va) == 24
    assert not set(tr) & set(va)
    for c in range(8):
        assert (y[tr] == c).sum() == 7
        assert (y[va] == c).sum() == 3
