"""TWD classifiers vs the scalar oracle (qt_cpp/ImageTesting.cpp:74-288)."""

import numpy as np
import pytest

from fast_image_recognition_tpu.cascade import ConventionalTWD, ProposedTWD, TWDType
from fast_image_recognition_tpu.cascade.twd import proposed_twd_oracle
from fast_image_recognition_tpu.data import make_gallery_and_probes
from fast_image_recognition_tpu.ops import oracle_pairwise


@pytest.fixture(scope="module")
def data():
    return make_gallery_and_probes(16, 10, 2, 256, seed=81)


def test_proposed_twd_matches_oracle(data):
    gallery, glabels, probes, _ = data
    clf = ProposedTWD(gallery, glabels, 16, chunk_features=32, theta=0.7)
    preds = clf.predict(probes)
    agree = 0
    unreliable_oracle = 0
    for i in range(probes.shape[0]):
        want, needed2 = proposed_twd_oracle(probes[i], gallery, glabels, 32, 0.7)
        agree += int(preds[i] == want)
        unreliable_oracle += int(needed2)
    assert agree >= int(0.95 * probes.shape[0])
    # unreliable counter ~ oracle count
    assert abs(clf.unreliable_count - unreliable_oracle) <= 2


def test_proposed_twd_class_granularity_runs(data):
    gallery, glabels, probes, plabels = data
    clf = ProposedTWD(
        gallery, glabels, 16, chunk_features=64, theta=0.7, granularity="class"
    )
    preds = clf.predict(probes)
    assert (preds == plabels).mean() > 0.9


@pytest.mark.parametrize(
    "twd_type,threshold",
    [
        (TWDType.POSTERIORS, 0.24),
        (TWDType.DIST_DIFF, 0.003),
        (TWDType.DIST_RATIO, 0.7),
    ],
)
def test_conventional_twd_types(data, twd_type, threshold):
    """The three reference configurations (ImageTesting.cpp:531-533)."""
    gallery, glabels, probes, plabels = data
    clf = ConventionalTWD(gallery, glabels, 16, twd_type, threshold)
    preds = clf.predict(probes)
    assert (preds == plabels).mean() > 0.9
    assert 0 <= clf.unreliable_count <= probes.shape[0]


def test_conventional_reliable_stage1_equals_prefix_bf(data):
    """With an always-reliable threshold, conventional TWD must equal plain
    64-dim-prefix brute force."""
    gallery, glabels, probes, _ = data
    clf = ConventionalTWD(
        gallery, glabels, 16, TWDType.DIST_RATIO, threshold=1e9
    )  # ratio < 1e9 always true -> always reliable
    preds = clf.predict(probes)
    want = glabels[oracle_pairwise(probes, gallery, 0, 64).argmin(1)]
    np.testing.assert_array_equal(preds, want)


def test_conventional_unreliable_refines_to_256(data):
    """With a never-reliable threshold, result must equal 256-dim prefix BF."""
    gallery, glabels, probes, _ = data
    clf = ConventionalTWD(gallery, glabels, 16, TWDType.DIST_DIFF, threshold=1e9)
    preds = clf.predict(probes)  # diff > 1e9 never true -> always refine
    want = glabels[oracle_pairwise(probes, gallery, 0, 256).argmin(1)]
    np.testing.assert_array_equal(preds, want)
    assert clf.unreliable_count == probes.shape[0]


def test_conventional_refine_compaction_matches_full_refine(data):
    """The host-compacted refine (only unreliable probes pay the 64->256
    extension) must produce the same predictions as refining every probe."""
    import jax.numpy as jnp

    from fast_image_recognition_tpu.cascade.twd import (
        ConventionalTWD,
        TWDType,
        _twd_refine,
        _twd_stage1,
    )

    gallery, labels, probes, _ = data
    num_classes = int(labels.max()) + 1
    clf = ConventionalTWD(
        gallery, labels, num_classes, TWDType.DIST_RATIO, 0.8,
        reduced_features=16, refine_to=64,
    )
    preds = clf.predict(probes)
    # full-batch refine reference
    q = jnp.asarray(probes, jnp.float32)
    d1, best_idx, reliable = _twd_stage1(
        q, clf._g, clf._l, num_classes, 16, 0.8, TWDType.DIST_RATIO, clf.kind
    )
    refined = _twd_refine(q, d1, clf._g, 16, 64, clf.kind)
    import numpy as np

    want_idx = np.where(np.asarray(reliable), np.asarray(best_idx), np.asarray(refined))
    np.testing.assert_array_equal(preds, labels[want_idx])
    assert clf.unreliable_count == int((~np.asarray(reliable)).sum())
