"""Golden-file parity: a committed feature file + expected distances lock
the loader + distance semantics across rounds (the role the shipped
precomputed_features play for the reference, SURVEY.md §4 fixtures)."""

import os

import numpy as np
import pytest

from fast_image_recognition_tpu.config import DistanceKind
from fast_image_recognition_tpu.data import load_feature_file
from fast_image_recognition_tpu.ops import oracle_pairwise, pairwise_distances
from fast_image_recognition_tpu.ops.distance_kernel import topk_l2
from fast_image_recognition_tpu.search import BruteForceMatcher

HERE = os.path.dirname(os.path.abspath(__file__))
DB = os.path.join(HERE, "data", "golden_db.txt")
EXPECTED = os.path.join(HERE, "data", "golden_expected.npz")


@pytest.fixture(scope="module")
def golden():
    db = load_feature_file(DB, 32, engine="python")
    exp = dict(np.load(EXPECTED).items())
    return db, exp


def test_loader_shape_and_norms(golden):
    db, _ = golden
    assert db.num_images == 30 and db.num_classes == 6
    np.testing.assert_allclose(
        np.linalg.norm(db.features, axis=1), 1.0, atol=1e-5
    )


@pytest.mark.parametrize("kind", [DistanceKind.L2, DistanceKind.CHI2, DistanceKind.KL])
def test_distances_match_golden(golden, kind):
    db, exp = golden
    probes = exp["probes"]
    d = oracle_pairwise(probes, db.features, kind=kind)
    np.testing.assert_allclose(d, exp[f"dist_{kind.value}"], rtol=1e-9)
    dj = np.asarray(pairwise_distances(probes, db.features, kind=kind))
    np.testing.assert_allclose(dj, exp[f"dist_{kind.value}"], rtol=2e-4, atol=1e-7)
    np.testing.assert_array_equal(dj.argmin(1), exp[f"top1_{kind.value}"])


def test_window_distances_match_golden(golden):
    db, exp = golden
    d = oracle_pairwise(exp["probes"], db.features, 8, 24)
    np.testing.assert_allclose(d, exp["dist_l2_window_8_24"], rtol=1e-9)


def test_matcher_and_kernel_top1_match_golden(golden):
    db, exp = golden
    probes = exp["probes"]
    res = BruteForceMatcher(db.features).search(probes)
    np.testing.assert_array_equal(res.indices, exp["top1_l2"])
    _, idx = topk_l2(probes, db.features, k=1, tile_g=32, precise=True)
    np.testing.assert_array_equal(np.asarray(idx)[:, 0], exp["top1_l2"])


def test_native_loader_matches_golden(golden):
    from fast_image_recognition_tpu.runtime.native import native_available

    if not native_available():
        pytest.skip("native ingest unavailable")
    db, exp = golden
    nat = load_feature_file(DB, 32, engine="native")
    np.testing.assert_allclose(nat.features, db.features, rtol=1e-6, atol=1e-7)
