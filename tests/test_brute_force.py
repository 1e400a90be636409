"""Brute-force 1-NN parity vs the NumPy oracle (qt_cpp/db_features.cpp:319-335)
and the end-to-end evaluation slice (load -> split -> match -> metrics)."""

import numpy as np

from fast_image_recognition_tpu.config import DistanceKind
from fast_image_recognition_tpu.data import (
    load_feature_file,
    make_synthetic_gallery,
    train_test_split_images,
    write_feature_file,
)
from fast_image_recognition_tpu.evaluation import evaluate_matcher
from fast_image_recognition_tpu.ops import oracle_pairwise
from fast_image_recognition_tpu.search import BruteForceMatcher


def test_top1_matches_oracle_argmin():
    gallery, _ = make_synthetic_gallery(16, 8, 96, seed=21)
    probes, _ = make_synthetic_gallery(16, 2, 96, seed=22)
    probes = probes[:20]
    matcher = BruteForceMatcher(gallery)
    res = matcher.search(probes)
    want = oracle_pairwise(probes, gallery).argmin(axis=1)
    np.testing.assert_array_equal(res.indices, want)


def test_feature_prefix_truncation():
    gallery, _ = make_synthetic_gallery(8, 8, 128, seed=31)
    probes, _ = make_synthetic_gallery(8, 1, 128, seed=32)
    matcher = BruteForceMatcher(gallery, max_features=64)
    res = matcher.search(probes)
    want = oracle_pairwise(probes, gallery, start=0, end=64).argmin(axis=1)
    np.testing.assert_array_equal(res.indices, want)


def test_chi2_matcher():
    gallery, _ = make_synthetic_gallery(8, 8, 64, seed=41, l2=False)
    probes, _ = make_synthetic_gallery(8, 1, 64, seed=42, l2=False)
    matcher = BruteForceMatcher(gallery, kind=DistanceKind.CHI2)
    res = matcher.search(probes)
    want = oracle_pairwise(probes, gallery, kind=DistanceKind.CHI2).argmin(axis=1)
    np.testing.assert_array_equal(res.indices, want)


def test_end_to_end_slice(tmp_path):
    """The minimum end-to-end slice of SURVEY.md §7 step 2: write a text
    feature file, load it, split, run 1-NN on device, print metrics."""
    feats, labels = make_synthetic_gallery(10, 20, 64, seed=5)
    names = [f"class_{c:03d}" for c in range(10)]
    path = tmp_path / "db.txt"
    write_feature_file(str(path), feats, labels, names)

    db = load_feature_file(str(path), features_count=64)
    split = train_test_split_images(
        db.labels, np.random.default_rng(13), train_images_per_class=12
    )
    matcher = BruteForceMatcher(db.features[split.train_idx])
    result = evaluate_matcher(
        matcher,
        db.labels[split.train_idx],
        db.features[split.test_idx],
        db.labels[split.test_idx],
        num_classes=db.num_classes,
        verbose=False,
    )
    # Synthetic blobs are widely separable: near-zero error expected.
    assert result.error_rate < 5.0
    assert result.macro_recall > 95.0
    assert result.checked_percent == 100.0
