"""Directed Enumeration Method: TPU batched implementation vs the
sequential NumPy oracle (qt_cpp/ann.cpp:269-507 PIVOT semantics)."""

import numpy as np
import pytest

from fast_image_recognition_tpu.data import make_gallery_and_probes
from fast_image_recognition_tpu.evaluation import evaluate_matcher
from fast_image_recognition_tpu.ops import oracle_pairwise
from fast_image_recognition_tpu.search import BruteForceMatcher
from fast_image_recognition_tpu.search.dem import (
    DirectedEnumerationMatcher,
    dem_oracle_search,
    select_pivots,
    select_pivots_device,
)


@pytest.fixture(scope="module")
def data():
    return make_gallery_and_probes(32, 12, 2, 96, seed=71)  # N=384


@pytest.fixture(scope="module")
def matcher(data):
    gallery, glabels, _, _ = data
    return DirectedEnumerationMatcher(gallery, glabels, seed=3)


def test_pivot_selection_properties(data):
    gallery, glabels, _, _ = data
    rng = np.random.default_rng(0)
    pivots, p_matrix, other_min = select_pivots(gallery, glabels, rng)
    n = gallery.shape[0]
    want_count = min(32, max(5, int(n * 0.015)))
    assert len(pivots) == want_count
    assert len(set(pivots.tolist())) == len(pivots)  # distinct
    assert p_matrix.shape == (len(pivots), n)
    # each P row must be the distances from that pivot
    for i in [0, len(pivots) - 1]:
        want = oracle_pairwise(gallery[pivots[i]][None], gallery)[0]
        np.testing.assert_allclose(p_matrix[i], want, rtol=1e-5)


def test_device_build_matches_host_build(data):
    """select_pivots_device / from_device vs the host build — the device
    index build (used at production scale where the gallery never touches
    the host) must pick the same pivots and produce the same P_matrix and
    threshold, up to fp32 matmul rounding."""
    import jax.numpy as jnp

    gallery, glabels, probes, _ = data
    rng = np.random.default_rng(9)
    piv_h, pm_h, om_h = select_pivots(gallery, glabels, rng)
    gal_dev = jnp.asarray(gallery, jnp.float32)
    piv_d, pm_d, om_d = select_pivots_device(gal_dev, glabels, seed=9)
    np.testing.assert_array_equal(piv_h, piv_d)
    np.testing.assert_allclose(np.asarray(pm_d), pm_h, rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(om_d, om_h, rtol=2e-4, atol=1e-5)

    host_m = DirectedEnumerationMatcher(
        gallery, glabels, seed=9, probe_mode="gather", image_count_to_check=60
    )
    dev_m = DirectedEnumerationMatcher.from_device(
        gal_dev, glabels, seed=9, probe_mode="gather", image_count_to_check=60
    )
    assert dev_m.budget == host_m.budget
    assert abs(dev_m.index.threshold - host_m.index.threshold) <= 1e-3 * max(
        1.0, abs(host_m.index.threshold)
    )
    r_h = host_m.search(probes)
    r_d = dev_m.search(probes)
    # Identical pivots, but the device P_matrix is computed from the
    # bf16-stored gallery (~0.1% input rounding) while the host one comes
    # from the fp32 features — likelihood near-ties among same-class rows
    # reorder freely, so compare at the LABEL level (on the real MXU the
    # row-level agreement drops to ~0.5 while labels stay ~0.98).
    agree = float(np.mean(glabels[r_h.indices] == glabels[r_d.indices]))
    assert agree >= 0.9


def test_matches_oracle_probe_semantics(data, matcher):
    gallery, glabels, probes, _ = data
    budget = 60
    matcher.set_budget(budget)
    res = matcher.search(probes)
    agree = 0
    checked_close = 0
    for i in range(probes.shape[0]):
        oi, od, oc = dem_oracle_search(probes[i], gallery, matcher.index, budget)
        agree += int(res.indices[i] == oi)
        tpu_checked = int(round(res.checked_fraction[i] * gallery.shape[0]))
        checked_close += int(abs(tpu_checked - oc) <= 2)
    # fp32 vs fp64 likelihood near-ties may reorder rare probes
    assert agree >= int(0.92 * probes.shape[0])
    assert checked_close >= int(0.9 * probes.shape[0])


def test_full_budget_matches_brute_force(data, matcher):
    gallery, glabels, probes, _ = data
    matcher.set_budget(0)  # full gallery
    res = matcher.search(probes)
    bf = BruteForceMatcher(gallery).search(probes)
    # with an unlimited budget DEM may still early-exit below threshold, but
    # the returned label must match BF's class on separable data
    assert (glabels[res.indices] == glabels[bf.indices]).mean() >= 0.95


def test_accuracy_improves_with_budget(data):
    gallery, glabels, probes, plabels = data
    # disable the FAR early-exit (tiny threshold) so the budget is the only
    # stopping rule and checked%% must grow with it
    matcher = DirectedEnumerationMatcher(gallery, glabels, seed=5, threshold=1e-12)
    errors = []
    checked = []
    for ratio in (0.05, 0.2, 0.6):
        matcher.set_budget(int(ratio * gallery.shape[0]))
        r = evaluate_matcher(
            matcher, glabels, probes, plabels, num_classes=32, verbose=False
        )
        errors.append(r.error_rate)
        checked.append(r.checked_percent)
    assert errors[-1] <= errors[0] + 1e-9
    assert checked[0] < checked[-1] <= 100.0


def test_early_exit_reduces_checked(data):
    """With the FAR threshold active, easy probes (exact gallery rows) must
    exit after a handful of probes."""
    gallery, glabels, _, _ = data
    matcher = DirectedEnumerationMatcher(gallery, glabels, seed=7)
    matcher.set_budget(gallery.shape[0])
    res = matcher.search(gallery[:16])  # self-queries: distance 0 < threshold
    n = gallery.shape[0]
    assert (res.checked_fraction * n <= len(matcher.index.pivot_indices) + 2).all()
    # Early exit accepts the FIRST probe below threshold (ann.cpp:396-399),
    # which for a near-duplicate may be a same-class pivot, not the query
    # row itself — assert class-level correctness.
    np.testing.assert_array_equal(glabels[res.indices], glabels[:16])


def test_gather_mode_matches_exact(data):
    """The gather probe path must agree with the exact path (same probe
    set, bf16 rounding may flip rare near-ties)."""
    gallery, glabels, probes, _ = data
    exact = DirectedEnumerationMatcher(gallery, glabels, seed=3)
    gather = DirectedEnumerationMatcher(
        gallery, glabels, seed=3, probe_mode="gather"
    )
    for budget in (40, 120):
        exact.set_budget(budget)
        gather.set_budget(budget)
        re = exact.search(probes)
        rg = gather.search(probes)
        assert (re.indices == rg.indices).mean() > 0.9
        # label agreement should be near-total
        assert (glabels[re.indices] == glabels[rg.indices]).mean() > 0.97


def test_gather_mode_rejects_chi2(data):
    gallery, glabels, _, _ = data
    import pytest as _pytest

    from fast_image_recognition_tpu.config import DistanceKind

    with _pytest.raises(ValueError, match="L2 only"):
        DirectedEnumerationMatcher(
            gallery, glabels, kind=DistanceKind.CHI2, probe_mode="gather"
        )


def test_budget_at_or_below_pivot_count_probes_zero_candidates(data, matcher):
    """budget <= n_pivots: the pivot phase exhausts imageCountToCheck and no
    candidates are probed (ann.cpp:472 loop condition) — checked counts must
    never exceed the pivot count and results equal the pivot-phase best."""
    gallery, glabels, probes, _ = data
    n_pivots = len(matcher.index.pivot_indices)
    matcher.set_budget(n_pivots)
    assert matcher.budget == 0
    res = matcher.search(probes)
    n = gallery.shape[0]
    for i in range(probes.shape[0]):
        oi, od, oc = dem_oracle_search(
            probes[i], gallery, matcher.index, n_pivots
        )
        assert int(round(res.checked_fraction[i] * n)) == oc
        assert res.indices[i] == oi
        np.testing.assert_allclose(res.distances[i], od, rtol=1e-4)
    matcher.set_budget(0)  # restore: 0 means unlimited


@pytest.mark.parametrize("probe_mode", ["exact", "gather"])
def test_batch_invariance(data, probe_mode):
    """Searching probes one-at-a-time must match searching them as one
    batch. Regression guard for the MXU precision trap: the likelihood
    expansion qp_sq + pm_sq - 2*d_qp@P cancels ~2500:1, and at batch>=8
    XLA lowers the cross-term matmul to the MXU whose DEFAULT fp32
    precision uses bf16 multiplies — without Precision.HIGHEST the
    candidate ranking randomized (error 35-89% at batch 32 on TPU, 0% at
    batch 1). On CPU both lowerings are fp32, so this only bites with
    FIR_TEST_TPU=1 — keep it cheap so it always runs."""
    gallery, glabels, probes, _ = data
    m = DirectedEnumerationMatcher(
        gallery, glabels, seed=3, probe_mode=probe_mode
    )
    m.set_budget(60)
    batched = m.search(probes)
    singles = np.concatenate(
        [m.search(probes[i : i + 1]).indices for i in range(probes.shape[0])]
    )
    # bf16 probe distances may flip rare near-ties between tilings; the
    # ranking itself must be batch-independent.
    assert (batched.indices == singles).mean() >= 0.95
    assert (glabels[batched.indices] == glabels[singles]).mean() >= 0.97


# ---------------------------------------------------------------------------
# Non-PIVOT (full-matrix) DEM — ann.cpp:283-300, 474-499 #ifndef PIVOT
# ---------------------------------------------------------------------------

from fast_image_recognition_tpu.search.dem import (  # noqa: E402
    FullMatrixDEM,
    dem_full_oracle_search,
)


@pytest.fixture(scope="module")
def full_matcher(data):
    gallery, glabels, _, _ = data
    return FullMatrixDEM(gallery, glabels, seed=3)


def test_full_dem_matches_oracle(data, full_matcher):
    gallery, glabels, probes, _ = data
    budget = 60
    full_matcher.set_budget(budget)
    res = full_matcher.search(probes)
    p_full = np.asarray(full_matcher._p_full)
    starts = np.asarray(full_matcher._start_idx)
    agree = 0
    checked_close = 0
    for i in range(probes.shape[0]):
        oi, od, oc = dem_full_oracle_search(
            probes[i], gallery, p_full, starts, full_matcher.threshold, budget
        )
        agree += int(res.indices[i] == oi)
        tpu_checked = int(round(res.checked_fraction[i] * gallery.shape[0]))
        checked_close += int(abs(tpu_checked - oc) <= 2)
    # fp32 vs fp64 refinement near-ties may reorder rare probes
    assert agree >= int(0.9 * probes.shape[0])
    assert checked_close >= int(0.85 * probes.shape[0])


def test_full_dem_unlimited_budget_is_exact(data):
    gallery, glabels, probes, _ = data
    # threshold tiny -> no early exit; budget = N -> probes everything
    m = FullMatrixDEM(gallery, glabels, threshold=1e-12, seed=3)
    m.set_budget(0)
    res = m.search(probes)
    bf = BruteForceMatcher(gallery).search(probes)
    np.testing.assert_array_equal(res.indices, bf.indices)
    np.testing.assert_allclose(res.distances, bf.distances, rtol=1e-4, atol=1e-5)


def test_full_dem_refinement_directs_better_than_pivot_at_tight_budget(data):
    """The point of the full-matrix variant: per-probe refinement should
    check no more of the gallery than the fixed pivot ranking at the same
    budget (and usually converge faster on the true NN)."""
    gallery, glabels, probes, _ = data
    bf = BruteForceMatcher(gallery).search(probes)
    budget = 50
    full = FullMatrixDEM(gallery, glabels, seed=3)
    full.set_budget(budget)
    rf = full.search(probes)
    acc_full = float(np.mean(glabels[rf.indices] == glabels[bf.indices]))
    assert acc_full >= 0.5  # directed walk finds most NNs within 13% of N
    assert rf.checked_fraction.max() <= budget / gallery.shape[0] + 1e-6
