"""Native C++ ingest (runtime/ingest.cpp) parity vs the NumPy parser."""

import numpy as np
import pytest

from fast_image_recognition_tpu.data import (
    load_feature_file,
    make_synthetic_gallery,
    write_feature_file,
)
from fast_image_recognition_tpu.runtime.native import native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native ingest library unavailable"
)


@pytest.fixture(scope="module")
def sample(tmp_path_factory):
    feats, labels = make_synthetic_gallery(12, 8, 64, seed=9)
    names = [f"cls_{c:02d}" for c in range(12)]
    path = tmp_path_factory.mktemp("native") / "db.txt"
    write_feature_file(str(path), feats, labels, names)
    return str(path)


def test_full_parity(sample):
    py = load_feature_file(sample, 64, engine="python")
    nat = load_feature_file(sample, 64, engine="native")
    np.testing.assert_allclose(nat.features, py.features, rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(nat.labels, py.labels)
    assert nat.class_names == py.class_names
    assert nat.file_names == py.file_names


def test_skip_and_cap_parity(tmp_path):
    feats, _ = make_synthetic_gallery(1, 6, 16, seed=1)
    labels = np.array([0, 1, 2, 3, 4, 5])
    names = ["keep_a", "257.clutter", "keep_b", "BACKGROUND_Google_x", "keep_c", "keep_d"]
    path = tmp_path / "db.txt"
    write_feature_file(str(path), feats, labels, names)
    kwargs = dict(
        skip_class_substrings=("BACKGROUND_Google", "257.clutter"),
        max_classes=2,
    )
    py = load_feature_file(str(path), 16, engine="python", **kwargs)
    nat = load_feature_file(str(path), 16, engine="native", **kwargs)
    assert py.class_names == nat.class_names == ["keep_a", "keep_b"]
    # parsing BREAKS at the first record of a 3rd class
    assert py.num_images == nat.num_images == 2


def test_short_vector_padded(tmp_path):
    path = tmp_path / "short.txt"
    path.write_text("f.jpg\nc\n1.0 2.0\n")
    nat = load_feature_file(str(path), 8, engine="native")
    py = load_feature_file(str(path), 8, engine="python")
    np.testing.assert_allclose(nat.features, py.features, atol=1e-7)


def test_sum_normalization_parity(tmp_path):
    path = tmp_path / "s.txt"
    path.write_text("f.jpg\nc\n1.0 3.0\n")
    nat = load_feature_file(str(path), 2, engine="native", l2_normalize=False)
    np.testing.assert_allclose(nat.features[0], [0.25, 0.75], atol=1e-7)
