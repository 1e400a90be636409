"""Config-driven factory (the db.h replacement)."""

import numpy as np
import pytest

from fast_image_recognition_tpu.config import (
    DatasetConfig,
    FrameworkConfig,
    MatcherConfig,
)
from fast_image_recognition_tpu.data import (
    make_gallery_and_probes,
    write_feature_file,
)
from fast_image_recognition_tpu.factory import (
    build_matcher,
    build_twd_classifiers,
    load_dataset_from_config,
)


@pytest.fixture(scope="module")
def sets():
    return make_gallery_and_probes(10, 12, 2, 64, seed=151)


@pytest.mark.parametrize(
    "method", ["bf", "dem", "dem-gather", "dem-full", "proj", "sw", "kdtree"]
)
def test_matchers_from_config(sets, method):
    g, gl, p, pl = sets
    m = build_matcher(
        method, g, gl, MatcherConfig(image_count_to_check=40), seed=1
    )
    res = m.search(p)
    # graph search at a 40-of-120 budget is approximate by design
    floor = 0.6 if method == "sw" else 0.9
    assert (gl[res.indices] == pl).mean() > floor


def test_unknown_method(sets):
    g, gl, _, _ = sets
    with pytest.raises(ValueError, match="unknown matcher"):
        build_matcher("bogus", g, gl)


def test_twd_battery_from_config(sets):
    g, gl, p, pl = sets
    classifiers = build_twd_classifiers(g, gl, 10)
    assert len(classifiers) == 5
    for clf in classifiers:
        assert (clf.predict(p) == pl).mean() > 0.85


def test_dataset_from_config(tmp_path, sets):
    g, gl, p, pl = sets
    feats = np.concatenate([g, p])
    labels = np.concatenate([gl, pl])
    path = tmp_path / "db.txt"
    write_feature_file(str(path), feats, labels, [f"c{i}" for i in range(10)])
    cfg = DatasetConfig(
        features_file=str(path), features_count=64, train_images_per_class=8
    )
    gallery, glabels, probes, plabels, c = load_dataset_from_config(cfg)
    assert c == 10
    assert (np.bincount(glabels) == 8).all()
    assert len(plabels) == len(labels) - 80
