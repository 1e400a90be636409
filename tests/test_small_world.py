"""Small-world graph ANN (ann.cpp:214-235 small_world_rand counterpart):
graph build, budgeted search accuracy, distance-computation accounting."""

import numpy as np
import pytest

from fast_image_recognition_tpu.data import make_gallery_and_probes
from fast_image_recognition_tpu.search import BruteForceMatcher
from fast_image_recognition_tpu.search.small_world import (
    SmallWorldMatcher,
    build_neighbor_table,
)


@pytest.fixture(scope="module")
def dataset():
    # 200 classes x 10 gallery rows; near-duplicate probes
    return make_gallery_and_probes(200, 10, 1, 64, seed=0)


def test_neighbor_table_structure(dataset):
    import jax.numpy as jnp

    g, gl, p, pl = dataset
    nbrs = np.asarray(build_neighbor_table(jnp.asarray(g), k_nn=5, k_rand=3, seed=0))
    n = g.shape[0]
    assert nbrs.shape == (n, 8)
    assert nbrs.min() >= 0 and nbrs.max() < n
    # no self loops in the kNN part
    own = np.arange(n)[:, None]
    assert not (nbrs[:, :5] == own).any()
    # kNN edges point at genuinely near rows: edge distance far below the
    # average pairwise distance
    d_edge = np.linalg.norm(g[nbrs[0, :5]] - g[0], axis=1).mean()
    d_rand = np.linalg.norm(g[np.random.default_rng(1).integers(0, n, 50)] - g[0],
                            axis=1).mean()
    assert d_edge < 0.8 * d_rand


def test_search_matches_bruteforce_at_high_budget(dataset):
    g, gl, p, pl = dataset
    bf = BruteForceMatcher(g)
    want = bf.search(p)
    m = SmallWorldMatcher(g, seed=0, beam=8)
    m.set_budget(g.shape[0])  # unlimited: greedy walk until local optimum
    got = m.search(p)
    agree = float(np.mean(got.indices == want.indices))
    # graph search is approximate even unbudgeted (local minima) but with a
    # well-separated synthetic set the walk should almost always land exactly
    assert agree >= 0.9
    # distances reported for agreeing rows must match the true ones
    same = got.indices == want.indices
    np.testing.assert_allclose(
        got.distances[same], want.distances[same], rtol=1e-4, atol=1e-5
    )


def test_budget_bounds_work_and_accuracy_degrades_gracefully(dataset):
    g, gl, p, pl = dataset
    n = g.shape[0]
    bf = BruteForceMatcher(g)
    want = bf.search(p)

    m = SmallWorldMatcher(g, seed=0)
    m.set_budget(max(20, n // 50))  # tight budget
    tight = m.search(p)
    m.set_budget(n // 2)
    loose = m.search(p)

    # accounting: every query touched at most budget + one expansion wave
    k = int(np.asarray(m.neighbors).shape[1])
    slack = (m.beam * k + m.beam) / n
    assert (tight.checked_fraction <= (max(20, n // 50) / n) + slack + 1e-6).all()
    assert tight.checked_fraction.mean() < 0.2
    # sub-linear: the tight run touches far less than the gallery
    agree_tight = float(np.mean(tight.indices == want.indices))
    agree_loose = float(np.mean(loose.indices == want.indices))
    assert agree_loose >= agree_tight - 0.05  # more budget never much worse
    assert agree_tight >= 0.1  # still ~300x better than random (1/2000)


def test_label_accuracy_via_matcher(dataset):
    g, gl, p, pl = dataset
    m = SmallWorldMatcher(g, seed=0, beam=8)
    m.set_budget(g.shape[0] // 4)
    r = m.search(p)
    acc = float(np.mean(gl[r.indices] == pl))
    assert acc >= 0.9
