"""Exit-policy cascades (tf_keras/sequential_inference.py parity targets)
and the segment-compaction inference engine."""

import jax.numpy as jnp
import numpy as np
import pytest

from fast_image_recognition_tpu.cascade.exits import (
    LinearExitCascade,
    entropy_exit_cascade,
    knn_exits_with_final_classifier,
    sequential_knn_cascade,
    train_linear_svc,
    tune_far_threshold,
)
from fast_image_recognition_tpu.data import make_gallery_and_probes


@pytest.fixture(scope="module")
def levels():
    """Three 'levels' of embeddings with increasing quality (noise shrinking)
    — emulating cheap -> expensive exits over one dataset."""
    out = []
    for noise in (1.6, 0.8, 0.3):
        g, gl, p, pl = make_gallery_and_probes(
            12, 15, 4, 64, seed=91, within_class_noise=noise
        )
        out.append((g, gl, p, pl))
    x_train = [o[0] for o in out]
    y_train = out[0][1]
    x_val = [o[2] for o in out]
    y_val = out[0][3]
    return x_train, y_train, x_val, y_val


def test_sequential_knn_cascade(levels):
    x_train, y_train, x_val, y_val = levels
    res = sequential_knn_cascade(x_train, y_train, x_val, ratio=0.8)
    assert res.predictions.shape == y_val.shape
    assert np.isclose(res.break_counts.sum(), 1.0)
    acc = (res.predictions == y_val).mean()
    # must beat the worst single level (cheap exits only fire when unanimous)
    level0 = sequential_knn_cascade(x_train[:1], y_train, x_val[:1])
    assert acc >= (level0.predictions == y_val).mean() - 0.05


def test_knn_cascade_late_levels_help(levels):
    x_train, y_train, x_val, y_val = levels
    res = sequential_knn_cascade(x_train, y_train, x_val, ratio=0.8)
    # some probes must exit early AND some must continue past level 0
    assert res.break_counts[0] > 0
    assert res.break_counts[0] < 1.0


def test_linear_exit_cascade_far_tuned(levels):
    x_train, y_train, x_val, y_val = levels
    cascade = LinearExitCascade.train(x_train, y_train, num_classes=12, far=0.01)
    res = cascade.evaluate(x_val)
    acc = (res.predictions == y_val).mean()
    assert acc > 0.8
    assert len(cascade.thresholds) == 3
    assert cascade.thresholds[-1] == -1.0  # final level always fires


def test_linear_exit_cascade_fixed_threshold(levels):
    x_train, y_train, x_val, y_val = levels
    cascade = LinearExitCascade.train(
        x_train, y_train, num_classes=12, fixed_threshold=0.06
    )
    res = cascade.evaluate(x_val)
    assert np.isclose(res.break_counts.sum(), 1.0)


def test_linear_svc_jax_fallback(levels):
    x_train, y_train, _, _ = levels
    w, b = train_linear_svc(x_train[2], y_train, 12, use_sklearn=False)
    acc = ((x_train[2] @ w.T + b).argmax(1) == y_train).mean()
    assert acc > 0.9


def test_tune_far_threshold_blocks_mistakes():
    rng = np.random.default_rng(0)
    n, c = 400, 5
    y = rng.integers(0, c, n)
    dv = rng.normal(0, 0.1, (n, c))
    dv[np.arange(n), y] += 1.0  # mostly correct with score ~1
    # corrupt 10%: wrong argmax with LOWER max score (the separable case the
    # reference's threshold walk can actually block, :622-631)
    bad = rng.choice(n, 40, replace=False)
    dv[bad] = rng.normal(0, 0.1, (40, c))
    dv[bad, (y[bad] + 1) % c] += 0.5
    t = tune_far_threshold(dv, y, far=0.01)
    preds = dv.argmax(1)
    accepted = dv.max(1) > t
    far = ((preds != y) & accepted).sum() / n
    assert far <= 0.015
    # most correct predictions must still be accepted
    assert ((preds == y) & accepted).sum() / n > 0.5


def test_entropy_cascade_modes():
    rng = np.random.default_rng(1)
    lvl1 = rng.dirichlet(np.ones(6) * 0.3, 100)  # confident-ish
    lvl2 = rng.dirichlet(np.ones(6) * 0.3, 100)
    res_e = entropy_exit_cascade([lvl1, lvl2], threshold=0.8, mode="entropy")
    res_p = entropy_exit_cascade([lvl1, lvl2], threshold=0.7, mode="max_prob")
    for res in (res_e, res_p):
        assert np.isclose(res.break_counts.sum(), 1.0)
        assert res.break_counts[0] > 0  # some confident exits


def test_hybrid_knn_svc(levels):
    x_train, y_train, x_val, y_val = levels
    res = knn_exits_with_final_classifier(
        x_train, y_train, x_val, num_classes=12, ratio=0.8
    )
    assert (res.predictions == y_val).mean() > 0.75


def test_segment_pipeline_end_to_end():
    from fast_image_recognition_tpu.cascade.engine import SequentialInferencePipeline
    from fast_image_recognition_tpu.models import create_efficientnet, default_taps

    num_classes = 5
    model, variables = create_efficientnet("b0", 0, resolution=32)
    taps = default_taps("b0")
    images = np.random.default_rng(0).normal(size=(12, 32, 32, 3)).astype(np.float32)

    # random heads with matching dims
    out = model.apply(variables, jnp.asarray(images[:1]), taps=taps)
    dims = [int(out["taps"][t].shape[-1]) for t in taps] + [
        int(out["embedding"].shape[-1])
    ]
    rng = np.random.default_rng(0)
    coefs = [rng.normal(0, 0.1, (num_classes, d)).astype(np.float32) for d in dims]
    intercepts = [np.zeros(num_classes, dtype=np.float32) for _ in dims]

    # threshold -inf: everyone exits at level 0
    pipe = SequentialInferencePipeline(
        model, variables, taps, coefs, intercepts,
        thresholds=[-1e9] * (len(dims) - 1), buckets=(8, 16),
    )
    res = pipe.predict(images)
    assert res.break_counts[0] == 1.0
    # threshold +inf: everyone reaches the final level
    pipe2 = SequentialInferencePipeline(
        model, variables, taps, coefs, intercepts,
        thresholds=[1e9] * (len(dims) - 1), buckets=(8, 16),
    )
    res2 = pipe2.predict(images)
    assert res2.break_counts[-1] == 1.0

    # level-0 predictions must equal the standalone tap computation
    full = model.apply(variables, jnp.asarray(images), taps=taps)
    emb0 = np.asarray(full["taps"][taps[0]])
    emb0 = emb0 / np.linalg.norm(emb0, axis=1, keepdims=True)
    want = (emb0 @ coefs[0].T + intercepts[0]).argmax(1)
    np.testing.assert_array_equal(res.predictions, want)


def _make_pipe(num_classes=5, n=24, res=32, seed=0, **kw):
    from fast_image_recognition_tpu.cascade.engine import SequentialInferencePipeline
    from fast_image_recognition_tpu.models import create_efficientnet, default_taps

    model, variables = create_efficientnet("b0", 0, resolution=res)
    taps = default_taps("b0")
    images = np.random.default_rng(seed).normal(size=(n, res, res, 3)).astype(
        np.float32
    )
    out = model.apply(variables, jnp.asarray(images[:1]), taps=taps)
    dims = [int(out["taps"][t].shape[-1]) for t in taps] + [
        int(out["embedding"].shape[-1])
    ]
    rng = np.random.default_rng(0)
    coefs = [rng.normal(0, 0.1, (num_classes, d)).astype(np.float32) for d in dims]
    intercepts = [np.zeros(num_classes, dtype=np.float32) for _ in dims]
    pipe = SequentialInferencePipeline(
        model, variables, taps, coefs, intercepts,
        thresholds=[0.0] * (len(dims) - 1), buckets=(8, 16, 32), **kw,
    )
    return pipe, images


def test_fused_cascade_matches_host_compaction():
    """predict_fused with full-batch capacities (no overflow possible) must
    reproduce predict()'s sequential semantics exactly."""
    pipe, images = _make_pipe()
    pipe.calibrate(images, quantile=0.5)
    want = pipe.predict(images)
    got = pipe.predict_fused(images, capacities=[len(images)] * pipe.num_levels)
    np.testing.assert_array_equal(got.predictions, want.predictions)
    np.testing.assert_array_equal(got.exit_level, want.exit_level)
    assert got.forced_fraction == 0.0
    # a real break distribution: some exit early, some reach the end
    assert want.break_counts[0] > 0 and want.break_counts[0] < 1.0


def test_fused_cascade_capacity_overflow_forces_exits():
    """With capacity 1 past level 0, all but one survivor per level must
    force-exit with the current level's (provisional) prediction."""
    pipe, images = _make_pipe()
    # thresholds so high nobody fires before the final level
    pipe.thresholds = [1e9] * (pipe.num_levels - 1)
    got = pipe.predict_fused(
        images, capacities=[len(images)] + [1] * (pipe.num_levels - 1)
    )
    assert got.forced_fraction > 0.5
    # exactly one image reaches the final level
    assert (got.exit_level == pipe.num_levels - 1).sum() == 1
    # forced exits carry the level they stopped at
    assert (got.exit_level == 0).sum() == len(images) - 1


def test_fused_cascade_calibrated_capacities():
    pipe, images = _make_pipe()
    pipe.calibrate(images, quantile=0.5)
    caps = pipe.capacities_for(len(images), slack=1.5, multiple=8)
    assert caps[0] == len(images)
    assert all(c2 <= c1 for c1, c2 in zip(caps, caps[1:]))
    got = pipe.predict_fused(images)
    assert np.isclose(got.break_counts.sum(), 1.0)
    assert got.forced_fraction <= 0.5


def test_pooled_cascade_matches_host_compaction():
    """predict_pooled (level-major cross-batch compaction) must reproduce
    predict()'s sequential semantics exactly, across bucket sizes that
    force multi-chunk levels and tail padding."""
    pipe, images = _make_pipe()
    pipe.calibrate(images, quantile=0.5)
    want = pipe.predict(images)
    for bucket in (8, 16, 64):
        got = pipe.predict_pooled(images, bucket=bucket)
        np.testing.assert_array_equal(got.predictions, want.predictions)
        np.testing.assert_array_equal(got.exit_level, want.exit_level)
        np.testing.assert_allclose(got.break_counts, want.break_counts)


def test_fused_cache_keys_on_thresholds():
    """Recalibrating must not silently reuse a fused program compiled with
    the OLD thresholds (regression: the cache key omitted them, so a
    recalibration that left the capacities unchanged kept stale exits)."""
    pipe, images = _make_pipe()
    caps = [len(images)] * pipe.num_levels
    pipe.thresholds = [-1e9] * (pipe.num_levels - 1)  # everyone exits at 0
    first = pipe.predict_fused(images, capacities=caps)
    assert (first.exit_level == 0).all()
    pipe.thresholds = [1e9] * (pipe.num_levels - 1)  # nobody exits early
    second = pipe.predict_fused(images, capacities=caps)
    assert (second.exit_level == pipe.num_levels - 1).all()


def test_folded_engine_matches_bind_engine():
    """engine='folded' segments (BN-folded functional path) produce the
    same exit decisions/predictions as the bind path at matched
    thresholds (bf16 fold noise can flip near-ties only)."""
    pipe_b, images = _make_pipe(n=16)
    pipe_f, _ = _make_pipe(n=16, engine="folded")
    pipe_b.calibrate(images)
    pipe_f.thresholds = list(pipe_b.thresholds)
    rb = pipe_b.predict(images)
    rf = pipe_f.predict(images)
    agree = (rb.predictions == rf.predictions).mean()
    assert agree >= 0.9
    assert (rb.exit_level == rf.exit_level).mean() >= 0.8


def _make_knn_pipe(n_gal=30, n_val=16, num_classes=6, res=32, **kw):
    from fast_image_recognition_tpu.cascade.engine import SequentialInferencePipeline
    from fast_image_recognition_tpu.models import create_efficientnet, default_taps

    model, variables = create_efficientnet("b0", 0, resolution=res)
    taps = default_taps("b0")
    rng = np.random.default_rng(3)
    gal_images = rng.normal(size=(n_gal, res, res, 3)).astype(np.float32)
    val_images = rng.normal(size=(n_val, res, res, 3)).astype(np.float32)
    labels = rng.integers(0, num_classes, n_gal)

    # per-level galleries from the backbone itself (the reference caches
    # per-level train embeddings, sequential_inference.py:816-822); a
    # throwaway knn pipe with placeholder galleries extracts them
    # (level_embeddings never touches the head)
    tmp = SequentialInferencePipeline(
        model, variables, taps,
        head_mode="knn",
        galleries=[np.eye(2, dtype=np.float32)] * (len(taps) + 1),
        gallery_labels=np.zeros(2, np.int64),
        buckets=(8, 16, 32), **kw,
    )
    gal_levels = tmp.level_embeddings(gal_images)
    pipe = SequentialInferencePipeline(
        model, variables, taps,
        head_mode="knn",
        galleries=gal_levels,
        gallery_labels=labels,
        buckets=(8, 16, 32), **kw,
    )
    return pipe, gal_levels, labels, gal_images, val_images


def test_knn_head_matches_sequential_knn_cascade():
    """head_mode='knn' predict() must reproduce the standalone
    sequential_knn_cascade policy (sequential_inference.py:483-508) run on
    the same per-level embeddings."""
    pipe, gal_levels, labels, _, val_images = _make_knn_pipe()
    val_levels = pipe.level_embeddings(val_images)
    want = sequential_knn_cascade(gal_levels, labels, val_levels, ratio=0.8)
    got = pipe.predict(val_images)
    np.testing.assert_array_equal(got.predictions, want.predictions)
    np.testing.assert_array_equal(got.exit_level, want.exit_level)
    # a real cascade: not everyone exits at level 0
    assert 0.0 < got.break_counts[0] < 1.0 or got.break_counts[-1] > 0


def test_knn_fused_matches_host_compaction():
    pipe, _, _, gal_images, val_images = _make_knn_pipe()
    pipe.calibrate(gal_images)  # fractions only; thresholds stay 0 (knn)
    assert all(t == 0.0 for t in pipe.thresholds)
    want = pipe.predict(val_images)
    got = pipe.predict_fused(
        val_images, capacities=[len(val_images)] * pipe.num_levels
    )
    np.testing.assert_array_equal(got.predictions, want.predictions)
    np.testing.assert_array_equal(got.exit_level, want.exit_level)
    assert got.forced_fraction == 0.0


def test_segment_pipeline_on_pruned_backbone():
    """The cascade engine must run over a pruned model (SURVEY.md §7 step 7:
    exits over pruned-checkpoint ladders) — hidden_overrides + segments."""
    from fast_image_recognition_tpu.cascade.engine import SequentialInferencePipeline
    from fast_image_recognition_tpu.models import create_efficientnet, default_taps
    from fast_image_recognition_tpu.models.pruning import prune_efficientnet

    model, variables = create_efficientnet("b0", 0, resolution=32)
    pruned_model, pruned_vars = prune_efficientnet(model, variables, 0.25, "l1")
    taps = default_taps("b0")
    images = np.random.default_rng(1).normal(size=(6, 32, 32, 3)).astype(np.float32)

    out = pruned_model.apply(pruned_vars, jnp.asarray(images[:1]), taps=taps)
    dims = [int(out["taps"][t].shape[-1]) for t in taps] + [
        int(out["embedding"].shape[-1])
    ]
    rng = np.random.default_rng(0)
    coefs = [rng.normal(0, 0.1, (4, d)).astype(np.float32) for d in dims]
    intercepts = [np.zeros(4, dtype=np.float32) for _ in dims]
    pipe = SequentialInferencePipeline(
        pruned_model, pruned_vars, taps, coefs, intercepts,
        thresholds=[0.05] * (len(dims) - 1), buckets=(8,),
    )
    res = pipe.predict(images)
    assert res.predictions.shape == (6,)
    assert np.isclose(res.break_counts.sum(), 1.0)
    # level-0 parity against the standalone pruned forward
    full = pruned_model.apply(pruned_vars, jnp.asarray(images), taps=taps)
    emb0 = np.asarray(full["taps"][taps[0]])
    emb0 = emb0 / np.linalg.norm(emb0, axis=1, keepdims=True)
    scores0 = emb0 @ coefs[0].T + intercepts[0]
    fired0 = scores0.max(1) > 0.05
    np.testing.assert_array_equal(
        res.predictions[fired0 & (res.exit_level == 0)],
        scores0.argmax(1)[fired0 & (res.exit_level == 0)],
    )
