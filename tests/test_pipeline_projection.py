"""Projection-index ANN baseline (NMSLIB proj_incsort analog,
qt_cpp/ann.cpp:198-267), kd-tree baseline, image-list pipeline +
augmentation, leave-one-out pruning metric, per-level timing probe."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_image_recognition_tpu.data import make_gallery_and_probes
from fast_image_recognition_tpu.data.pipeline import (
    AugmentConfig,
    BatchGenerator,
    augment_batch,
    create_image_lists,
)
from fast_image_recognition_tpu.ops import oracle_pairwise
from fast_image_recognition_tpu.search.projection import (
    KDTreeMatcher,
    ProjectionIndexMatcher,
)


@pytest.fixture(scope="module")
def sets():
    return make_gallery_and_probes(24, 12, 2, 128, seed=131)


def test_projection_full_budget_is_exact(sets):
    g, gl, p, pl = sets
    m = ProjectionIndexMatcher(g, proj_dim=32)
    m.set_budget(0)  # full
    res = m.search(p)
    dense = oracle_pairwise(p, g)
    np.testing.assert_array_equal(res.indices, dense.argmin(1))


@pytest.mark.parametrize("proj_type", ["random", "pca"])
def test_projection_budgeted_accuracy(sets, proj_type):
    g, gl, p, pl = sets
    m = ProjectionIndexMatcher(g, proj_dim=32, proj_type=proj_type)
    m.set_budget(int(0.1 * g.shape[0]))
    res = m.search(p)
    assert (gl[res.indices] == pl).mean() > 0.9
    np.testing.assert_allclose(res.checked_fraction, 0.1, atol=0.01)


def test_projection_budget_improves(sets):
    g, gl, p, pl = sets
    m = ProjectionIndexMatcher(g, proj_dim=8)
    errs = []
    for frac in (0.02, 0.5):
        m.set_budget(int(frac * g.shape[0]))
        res = m.search(p)
        errs.append((gl[res.indices] != pl).mean())
    assert errs[1] <= errs[0]


def test_kdtree_matches_bruteforce(sets):
    g, gl, p, pl = sets
    m = KDTreeMatcher(g)
    res = m.search(p)
    dense = oracle_pairwise(p, g)
    np.testing.assert_array_equal(res.indices, dense.argmin(1))
    np.testing.assert_allclose(res.distances, dense.min(1), rtol=1e-5)


def test_kdtree_checks_budget_honored(sets):
    """SearchParams(checks) semantics (ann.cpp:190): the traversal stops
    at the budget, reports what it actually evaluated, and accuracy
    degrades gracefully with fewer checks."""
    g, gl, p, pl = sets
    n = g.shape[0]
    m = KDTreeMatcher(g, seed=3)
    dense = oracle_pairwise(p, g)
    exact = dense.argmin(1)

    m.set_budget(n // 8)
    tight = m.search(p)
    assert (tight.checked_fraction <= (n // 8) / n + 1e-9).all()
    assert (tight.checked_fraction > 0).all()

    m.set_budget(n // 2)
    loose = m.search(p)
    agree_tight = float(np.mean(tight.indices == exact))
    agree_loose = float(np.mean(loose.indices == exact))
    assert agree_loose >= agree_tight
    # well-separated blobs: even the tight budget usually lands right
    assert agree_tight >= 0.5
    # distances reported for agreeing rows are the true ones
    same = loose.indices == exact
    np.testing.assert_allclose(
        loose.distances[same], dense.min(1)[same], rtol=1e-4
    )


def test_kdtree_degenerate_split_duplicates():
    """Duplicate-heavy galleries force the degenerate median-split path;
    the split value must come from the SUBTREE's rows (regression: it was
    read from the full dataset with a subtree-local position, poisoning
    every non-root degenerate node)."""
    rng = np.random.default_rng(0)
    g = np.repeat(rng.normal(size=(50, 16)).astype(np.float32), 20, axis=0)
    m = KDTreeMatcher(g)  # unlimited budget = exact
    q = (g[::20] + 1e-3).astype(np.float32)
    res = m.search(q)
    dense = oracle_pairwise(q, g)
    exact = dense.argmin(1)
    # duplicates make index ties legal — compare by row value
    assert np.all(np.isclose(g[res.indices], g[exact], atol=1e-6))


def test_heap_push_pop_matches_heapq():
    """Property test for the vectorized lockstep binary heap
    (projection._heap_push/_heap_pop): random interleaved push/pop
    sequences on a batch of independent heaps must pop exactly what a
    per-probe ``heapq`` pops, in the same order (ties broken by bound
    only — node payloads ride along)."""
    import heapq

    from fast_image_recognition_tpu.search.projection import (
        _heap_pop,
        _heap_push,
    )

    rng = np.random.default_rng(7)
    B, H, STEPS = 9, 128, 400
    hb = np.full((B, H), np.inf, np.float32)
    hn = np.zeros((B, H), np.int32)
    hs = np.zeros(B, np.int64)
    refs = [[] for _ in range(B)]
    next_node = 0
    for step in range(STEPS):
        # random subset of probes takes part in each op (mirrors the
        # live/active row filtering the search loop does)
        rows = np.nonzero(rng.random(B) < 0.6)[0]
        if len(rows) == 0:
            continue
        if rng.random() < 0.6 or any(len(refs[r]) == 0 for r in rows):
            bounds = rng.random(len(rows)).astype(np.float32)
            nodes = np.arange(next_node, next_node + len(rows), dtype=np.int32)
            next_node += len(rows)
            _heap_push(hb, hn, hs, rows, bounds, nodes)
            for r, b, nd in zip(rows, bounds, nodes):
                heapq.heappush(refs[r], (np.float32(b), int(nd)))
        else:
            bound, node = _heap_pop(hb, hn, hs, rows)
            for k, r in enumerate(rows):
                eb, en = heapq.heappop(refs[r])
                assert bound[k] == eb
                # equal bounds may legally order nodes differently; with
                # float32 uniforms collisions are absent at this scale, so
                # payloads must agree too
                assert node[k] == en
    # drain every heap completely and compare full pop order
    for r in range(B):
        while refs[r]:
            bound, node = _heap_pop(hb, hn, hs, np.asarray([r]))
            eb, en = heapq.heappop(refs[r])
            assert bound[0] == eb and node[0] == en
    assert (hs == 0).all()
    # pop-side invariant: vacated slots are re-primed to +inf so future
    # sift-downs need no size masks
    assert np.isinf(hb).all()


@pytest.mark.parametrize("budget_frac", [0.0, 0.25])
def test_kdtree_batched_equals_single(sets, budget_frac):
    """The lockstep batch traversal is an amortization, not an
    approximation: searching probes together must return exactly what
    searching each alone does (indices, distances, checked counts)."""
    g, gl, p, pl = sets
    m = KDTreeMatcher(g, seed=11)
    m.set_budget(int(budget_frac * g.shape[0]))
    batched = m.search(p)
    for i in range(0, p.shape[0], 5):
        single = m.search(p[i : i + 1])
        assert single.indices[0] == batched.indices[i]
        np.testing.assert_allclose(
            single.distances[0], batched.distances[i], rtol=1e-6
        )
        assert single.checked_fraction[0] == batched.checked_fraction[i]


def test_create_image_lists(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    for cls in ("aa", "bb"):
        (tmp_path / cls).mkdir()
        for i in range(6):
            Image.fromarray(
                rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)
            ).save(tmp_path / cls / f"{i}.png")
    lists = create_image_lists(str(tmp_path), np.random.default_rng(1), train_count=4)
    assert len(lists.train_paths) == 8 and len(lists.val_paths) == 4
    assert lists.class_names == ["aa", "bb"]
    assert (np.bincount(lists.train_labels) == 4).all()
    # percent mode
    lists2 = create_image_lists(
        str(tmp_path), np.random.default_rng(1), train_percent=0.5
    )
    assert len(lists2.train_paths) == 6


def test_augment_batch_shapes_and_variation():
    rng = np.random.default_rng(0)
    imgs = rng.normal(size=(4, 16, 16, 3)).astype(np.float32)
    out = augment_batch(jnp.asarray(imgs), jax.random.PRNGKey(0))
    assert out.shape == imgs.shape
    # augmentation must actually change pixels but keep magnitude sane
    diff = np.abs(np.asarray(out) - imgs).mean()
    assert diff > 1e-3
    assert np.abs(np.asarray(out)).max() < 10 * np.abs(imgs).max() + 1
    # identity config (all zeros, no flip) reproduces the input
    ident = AugmentConfig(0.0, 0.0, 0.0, 0.0, horizontal_flip=False)
    out2 = augment_batch(jnp.asarray(imgs), jax.random.PRNGKey(0), ident)
    np.testing.assert_allclose(np.asarray(out2), imgs, atol=1e-4)


def test_batch_generator_epochs():
    imgs = np.random.default_rng(0).normal(size=(10, 8, 8, 3)).astype(np.float32)
    labels = np.arange(10) % 2
    gen = BatchGenerator(imgs, labels, batch_size=4, augment=AugmentConfig())
    batches = list(gen)
    assert len(batches) == 3
    assert sum(b[0].shape[0] for b in batches) == 10
    # deterministic given the seed
    gen2 = BatchGenerator(imgs, labels, batch_size=4, augment=AugmentConfig())
    b1 = list(gen)[0]
    b2 = list(gen2)[1]  # different epoch state -> different order likely
    assert batches[0][1].shape == (4,)


def test_leave_one_out_pruning():
    from fast_image_recognition_tpu.models import create_efficientnet
    from fast_image_recognition_tpu.models.pruning import (
        parameter_count,
        prune_efficientnet,
    )

    model, variables = create_efficientnet("b0", 0, resolution=32)
    rng = np.random.default_rng(0)
    imgs = rng.normal(size=(4, 32, 32, 3)).astype(np.float32)
    labels = np.arange(4) % 2
    m2, v2 = prune_efficientnet(
        model, variables, 0.25, "leave_one_out",
        images=imgs, labels=labels, num_classes=2,
    )
    assert parameter_count(v2) < parameter_count(variables)
    out = m2.apply(v2, jnp.asarray(imgs[:1]))
    assert out["embedding"].shape == (1, 1280)


def test_segment_latency_probe():
    from fast_image_recognition_tpu.cascade.engine import SequentialInferencePipeline
    from fast_image_recognition_tpu.models import create_efficientnet, default_taps

    model, variables = create_efficientnet("b0", 0, resolution=32)
    taps = default_taps("b0")
    out = model.apply(variables, jnp.zeros((1, 32, 32, 3)), taps=taps)
    dims = [int(out["taps"][t].shape[-1]) for t in taps] + [1280]
    coefs = [np.zeros((3, d), np.float32) for d in dims]
    intercepts = [np.zeros(3, np.float32) for _ in dims]
    pipe = SequentialInferencePipeline(
        model, variables, taps, coefs, intercepts,
        thresholds=[0.0] * (len(dims) - 1), buckets=(8,),
    )
    imgs = np.zeros((4, 32, 32, 3), np.float32)
    per_level, cumulative = pipe.measure_segment_latency(imgs, iters=2)
    assert per_level.shape == (len(dims),)
    assert (per_level > 0).all()
    np.testing.assert_allclose(cumulative[-1], per_level.sum(), rtol=1e-6)
