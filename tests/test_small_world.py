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
    m = SmallWorldMatcher(g, seed=0, beam=12)
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
    m = SmallWorldMatcher(g, seed=0, beam=12)
    m.set_budget(g.shape[0] // 4)
    r = m.search(p)
    acc = float(np.mean(gl[r.indices] == pl))
    assert acc >= 0.9


def test_routed_search_uses_budget_and_improves(dataset):
    """The production path (no explicit entries) routes through a coarse
    sample scan and RESTARTS from ranked entries until the budget is spent —
    a pure walk saturates after ~beam*K probes and wastes the rest (the
    100k-gallery failure mode). More budget must mean more rows checked and
    no-worse accuracy; accounting stays within one expansion wave."""
    g, gl, p, pl = dataset
    n = g.shape[0]
    bf = BruteForceMatcher(g)
    want = bf.search(p)
    m = SmallWorldMatcher(g, seed=0, beam=8)
    k = int(np.asarray(m.neighbors).shape[1])

    results = {}
    for budget in (n // 20, n // 2):
        m.set_budget(budget)
        r = m.search(p)
        assert (r.checked_fraction * n <= budget + m.beam * k + 1e-6).all()
        results[budget] = r
    tight, loose = results[n // 20], results[n // 2]
    # restarts keep consuming budget instead of stopping at saturation
    assert loose.checked_fraction.mean() > 2 * tight.checked_fraction.mean()
    agree_tight = float(np.mean(tight.indices == want.indices))
    agree_loose = float(np.mean(loose.indices == want.indices))
    assert agree_loose >= max(agree_tight, 0.9)


def test_pca_space_walk_with_full_rescore():
    """pca_dim mode (VERDICT r3 #3): graph build + routed walk in the PCA
    projection, exact full-D rescore of the final beam. The projection is
    lossy on isotropic data (PCA-16 of 200 isotropic class directions
    scores FAR worse — the documented negative result), so the win
    condition is data with low INTRINSIC dimension: here D=96 features on
    a 16-d latent manifold, where PCA-16 is information-preserving and the
    walk gets D/P = 6x probes for the same arithmetic budget."""
    rng = np.random.default_rng(3)
    n_classes, per, lat, d = 200, 10, 16, 96
    basis = rng.standard_normal((lat, d)).astype(np.float32)
    centers = rng.standard_normal((n_classes, lat)).astype(np.float32) * 3
    z = np.repeat(centers, per, axis=0) + 0.3 * rng.standard_normal(
        (n_classes * per, lat)
    ).astype(np.float32)
    g = z @ basis + 0.01 * rng.standard_normal(
        (n_classes * per, d)
    ).astype(np.float32)
    pz = centers + 0.3 * rng.standard_normal((n_classes, lat)).astype(
        np.float32
    )
    p = pz @ basis
    n = g.shape[0]
    bf = BruteForceMatcher(g)
    want = bf.search(p)

    m_pca = SmallWorldMatcher(g, seed=0, beam=8, pca_dim=lat)
    m_full = SmallWorldMatcher(g, seed=0, beam=8)
    budget = n // 10
    m_pca.set_budget(budget)
    m_full.set_budget(budget)
    r_pca = m_pca.search(p)
    r_full = m_full.search(p)
    agree_pca = float(np.mean(r_pca.indices == want.indices))
    agree_full = float(np.mean(r_full.indices == want.indices))
    assert agree_pca >= agree_full - 0.02  # never worse at equal budget
    assert agree_pca >= 0.5
    # exact distances on agreeing rows (full-D rescore, not PCA estimates)
    same = r_pca.indices == want.indices
    np.testing.assert_allclose(
        r_pca.distances[same], want.distances[same], rtol=1e-4, atol=1e-5
    )
    # full-D-equivalent accounting: walk probes cost P/D each, so the
    # equivalent count stays within the budget + one expansion wave
    k = int(np.asarray(m_pca.neighbors).shape[1])
    wave_eq = (m_pca.beam * k + m_pca.beam) * (lat / d) + m_pca.beam + 1
    assert (r_pca.checked_fraction * n <= budget + wave_eq + 1e-4).all()


def test_packed_visited_bitmap_at_scale():
    """The visited state is bit-packed [B, ceil(N/32)] uint32 — at 100k+
    rows the search must run (a [B, N] bool map would be the old 1 GB/1M-row
    design) and the budget accounting must hold exactly."""
    import jax.numpy as jnp
    from sklearn.neighbors import NearestNeighbors

    from fast_image_recognition_tpu.search.small_world import _sw_search

    n, d, b, beam = 100_000, 16, 64, 8
    rng = np.random.default_rng(0)
    g = rng.standard_normal((n, d)).astype(np.float32)
    # neighbor table from sklearn (the Pallas build is interpret-mode-slow
    # on the CPU test mesh); k_nn=7 + 4 random long-range edges
    nn = NearestNeighbors(n_neighbors=8).fit(g)
    _, knn = nn.kneighbors(g[: n // 10])  # subsample build for test speed
    # tile the subsampled table: rows >= n//10 get random edges only
    tbl = rng.integers(0, n, size=(n, 11), dtype=np.int64)
    tbl[: n // 10, :7] = knn[:, 1:8]
    gallery = jnp.asarray(g)
    budget = 2_000
    qidx = rng.integers(0, n // 10, size=b)
    entries = np.stack([rng.choice(n, size=beam, replace=False) for _ in range(b)])
    idx, dist, checked = _sw_search(
        jnp.asarray(g[qidx]),
        gallery,
        jnp.sum(gallery * gallery, axis=1),
        jnp.asarray(tbl, jnp.int32),
        jnp.asarray(entries, jnp.int32),
        beam=beam,
        budget=budget,
        max_steps=64,
    )
    checked = np.asarray(checked)
    k = tbl.shape[1]
    # accounting: never more than budget + one final expansion wave
    assert (checked <= budget + beam * k).all()
    assert (checked >= beam).all()
    # sub-linear: far below the gallery size
    assert checked.max() < 0.05 * n
    # the walk finds genuinely near rows: reported best distance beats the
    # median pairwise distance by a wide margin for most queries
    ref = np.linalg.norm(g[rng.integers(0, n, 256)] - g[qidx[0]], axis=1)
    med = float(np.median(ref**2) / d)
    assert float(np.median(np.asarray(dist))) < 0.5 * med
