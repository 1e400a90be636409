"""Data layer: feature-file parsing, normalization, splits.

Parity anchors: qt_cpp/db_features.cpp:44-162, qt_cpp/classification.cpp:942-990.
"""

import numpy as np
import pytest

from fast_image_recognition_tpu.data import (
    load_feature_file,
    make_synthetic_gallery,
    normalize_features,
    split_by_class_fraction,
    train_test_split_images,
    write_feature_file,
)


def _write_sample(tmp_path, rows, labels, class_names, fname="feats.txt"):
    path = tmp_path / fname
    write_feature_file(str(path), rows, labels, class_names)
    return str(path)


def test_roundtrip_and_l2_normalization(tmp_path):
    rng = np.random.default_rng(0)
    rows = rng.normal(size=(6, 16)).astype(np.float32)
    labels = np.array([0, 0, 1, 1, 2, 2])
    names = ["alpha", "beta", "gamma"]
    path = _write_sample(tmp_path, rows, labels, names)

    db = load_feature_file(path, features_count=16)
    assert db.num_images == 6
    assert db.num_classes == 3
    assert db.class_names == names
    # |f| < 1e-4 zeroing happens BEFORE normalization (db_features.cpp:85-101)
    expected = normalize_features(rows)
    np.testing.assert_allclose(db.features, expected, rtol=1e-6)
    norms = np.linalg.norm(db.features, axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_tiny_values_zeroed_before_norm(tmp_path):
    rows = np.array([[5e-5, 3.0, 4.0, -9e-5]], dtype=np.float32)
    path = _write_sample(tmp_path, rows, [0], ["a"])
    db = load_feature_file(path, features_count=4)
    np.testing.assert_allclose(db.features[0], [0.0, 0.6, 0.8, 0.0], atol=1e-6)


def test_skip_clutter_classes(tmp_path):
    rows = np.ones((3, 4), dtype=np.float32)
    path = _write_sample(
        tmp_path, rows, [0, 1, 2], ["cat", "257.clutter", "BACKGROUND_Google_x"]
    )
    db = load_feature_file(
        path,
        features_count=4,
        skip_class_substrings=("BACKGROUND_Google", "257.clutter"),
    )
    assert db.num_images == 1
    assert db.class_names == ["cat"]


def test_class_cap(tmp_path):
    rows = np.ones((5, 4), dtype=np.float32)
    path = _write_sample(tmp_path, rows, [0, 1, 2, 3, 4], list("abcde"))
    db = load_feature_file(path, features_count=4, max_classes=2)
    # Parsing breaks at the first record of a 3rd class (db_features.cpp:66-70)
    assert db.num_classes == 2
    assert db.num_images == 2


def test_class_name_leading_whitespace_stripped(tmp_path):
    path = tmp_path / "ws.txt"
    path.write_text("f.jpg\n   spaced_class\n1 2 3 4\n")
    db = load_feature_file(str(path), features_count=4)
    assert db.class_names == ["spaced_class"]


def test_drop_singleton_classes():
    feats, labels = make_synthetic_gallery(4, 3, 8, seed=0)
    labels = labels.copy()
    labels[labels == 2] = 1  # class 2 merged away; class indices not dense
    from fast_image_recognition_tpu.data.feature_io import FeatureDB

    db = FeatureDB(feats, labels, ["a", "b", "c", "d"], [""] * len(labels))
    # class 2 now empty -> counts: a=3, b=6, c=0, d=3
    dropped = db.drop_singleton_classes()
    assert dropped.num_classes == 3
    assert set(np.unique(dropped.labels)) == {0, 1, 2}


def test_shared_permutation_split_counts():
    _, labels = make_synthetic_gallery(5, 40, 4, seed=1)
    rng = np.random.default_rng(13)
    split = train_test_split_images(labels, rng, train_images_per_class=30)
    # Caltech mode: exactly 30 gallery images per class (db_features.cpp:132-133)
    train_labels = labels[split.train_idx]
    for c in range(5):
        assert (train_labels == c).sum() == 30
    assert split.train_idx.size + split.test_idx.size == labels.size
    assert np.intersect1d(split.train_idx, split.test_idx).size == 0


def test_fraction_split_clamps():
    labels = np.array([0] * 2 + [1] * 50)
    rng = np.random.default_rng(7)
    split = train_test_split_images(
        labels, rng, train_images_per_class=None, train_fraction=0.03
    )
    train_labels = labels[split.train_idx]
    # ceil(0.03*2)=1, ceil(0.03*50)=2 -> clamped to [1, n-1]
    assert (train_labels == 0).sum() == 1
    assert (train_labels == 1).sum() == 2


def test_split_by_class_fraction_absolute_and_stats():
    feats, labels = make_synthetic_gallery(3, 10, 6, seed=3)
    rng = np.random.default_rng(0)
    split, stats = split_by_class_fraction(labels, rng, fraction=4, features=feats)
    assert all((labels[split.train_idx] == c).sum() == 4 for c in range(3))
    rows = feats[split.train_idx].astype(np.float64)
    np.testing.assert_allclose(stats.mean, rows.mean(axis=0), rtol=1e-9)
    np.testing.assert_allclose(stats.std, rows.std(axis=0, ddof=1), rtol=1e-6)


def test_split_determinism():
    _, labels = make_synthetic_gallery(4, 20, 4, seed=5)
    s1 = train_test_split_images(labels, np.random.default_rng(13), 5)
    s2 = train_test_split_images(labels, np.random.default_rng(13), 5)
    np.testing.assert_array_equal(s1.train_idx, s2.train_idx)
    np.testing.assert_array_equal(s1.test_idx, s2.test_idx)


def test_sum_normalization_for_chi2():
    rows = np.array([[1.0, 3.0]], dtype=np.float32)
    out = normalize_features(rows, l2=False)
    np.testing.assert_allclose(out[0], [0.25, 0.75], atol=1e-7)
