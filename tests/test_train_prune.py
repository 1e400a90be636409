"""Two-phase multi-exit training (sequential_inference.py:1170-1232,
keras_finetune_prune.py:943-982) and channel-pruning surgery
(keras_finetune_prune.py:519-571)."""

import jax.numpy as jnp
import numpy as np
import pytest

from fast_image_recognition_tpu.models import create_efficientnet, default_taps
from fast_image_recognition_tpu.models.pruning import (
    METRICS,
    l1_kernel_importance,
    parameter_count,
    prune_efficientnet,
    round_down_multiple,
)
from fast_image_recognition_tpu.models.train import (
    MultiExitTrainer,
    TrainConfig,
    class_weights,
)


@pytest.fixture(scope="module")
def tiny_model():
    return create_efficientnet("b0", 0, resolution=32)


@pytest.fixture(scope="module")
def tiny_data():
    rng = np.random.default_rng(0)
    n, c = 48, 4
    labels = np.arange(n) % c
    # class-dependent image statistics so the heads can actually learn
    images = rng.normal(size=(n, 32, 32, 3)).astype(np.float32)
    images += labels[:, None, None, None] * 0.8
    return images, labels.astype(np.int64), c


def test_round_down_multiple():
    # 25% of 384 -> 288 (multiple of 16 already); 0.75*96=72 -> 64
    assert round_down_multiple(int(384 * 0.75), 16) == 288
    assert round_down_multiple(int(96 * 0.75), 16) == 64
    assert round_down_multiple(7, 16) == 16  # floor


def test_prune_reduces_params_and_runs(tiny_model):
    model, variables = tiny_model
    before = parameter_count(variables)
    pruned_model, pruned_vars = prune_efficientnet(model, variables, 0.25, "l1")
    after = parameter_count(pruned_vars)
    assert after < 0.85 * before
    x = jnp.ones((2, 32, 32, 3))
    out = pruned_model.apply(pruned_vars, x, taps=default_taps("b0"))
    assert out["embedding"].shape == (2, 1280)  # block I/O untouched
    assert len(out["taps"]) == len(default_taps("b0"))


def test_prune_keeps_top_l1_channels(tiny_model):
    model, variables = tiny_model
    name = "block2a"
    scores = l1_kernel_importance(variables, name)
    _, pruned_vars = prune_efficientnet(model, variables, 0.25, "l1")
    kept_kernel = pruned_vars["params"][name]["expand_conv"]["kernel"]
    new_f = kept_kernel.shape[3]
    want_keep = np.sort(np.argsort(scores)[::-1][:new_f])
    orig_kernel = variables["params"][name]["expand_conv"]["kernel"]
    np.testing.assert_allclose(
        np.asarray(kept_kernel), np.asarray(orig_kernel)[:, :, :, want_keep]
    )


def test_prune_metrics_with_calibration(tiny_model, tiny_data):
    model, variables = tiny_model
    images, labels, c = tiny_data
    for metric in ("apoz", "class_sep", "taylor", "random"):
        m2, v2 = prune_efficientnet(
            model, variables, 0.25, metric,
            images=images[:8], labels=labels[:8], num_classes=c,
        )
        out = m2.apply(v2, jnp.asarray(images[:2]))
        assert out["embedding"].shape == (2, 1280)


def test_unknown_metric_raises(tiny_model):
    model, variables = tiny_model
    with pytest.raises(ValueError, match="unknown metric"):
        prune_efficientnet(model, variables, 0.25, "bogus")


def test_class_weights_balanced():
    labels = np.array([0] * 30 + [1] * 10)
    w = class_weights(labels, 2)
    assert w[1] > w[0]
    np.testing.assert_allclose(w[0] * 30 + w[1] * 10, 40, rtol=1e-6)


def test_two_phase_training_learns(tiny_model, tiny_data):
    model, variables = tiny_model
    images, labels, c = tiny_data
    cfg = TrainConfig(
        num_classes=c,
        taps=tuple(default_taps("b0")),
        resolution=32,
        batch_size=16,
        phase1_epochs=2,
        phase2_epochs=1,
        phase1_lr=5e-3,
        phase2_lr=1e-4,
    )
    trainer = MultiExitTrainer(model, variables, cfg)
    frozen_backbone = jnp.asarray(
        variables["params"]["stem_conv"]["kernel"]
    ).copy()
    history = trainer.fit(images, labels, images, labels, verbose=False)
    # loss must decrease over training
    assert history["loss"][-1] < history["loss"][0]
    # phase 2 unfreezes the backbone: stem kernel must have moved
    moved = np.abs(
        np.asarray(trainer.params["stem_conv"]["kernel"]) - np.asarray(frozen_backbone)
    ).max()
    assert moved > 0
    # separable-by-brightness data: train accuracy should be decent
    assert trainer.evaluate(images, labels) >= 0.45
    logits = trainer.head_logits(images[:4])
    assert len(logits) == len(cfg.taps) + 1
    assert logits[0].shape == (4, c)


def test_phase1_freezes_backbone(tiny_model, tiny_data):
    model, variables = tiny_model
    images, labels, c = tiny_data
    cfg = TrainConfig(
        num_classes=c,
        taps=tuple(default_taps("b0")),
        resolution=32,
        batch_size=16,
        phase1_epochs=1,
        phase2_epochs=0,
    )
    trainer = MultiExitTrainer(model, variables, cfg)
    before = np.asarray(variables["params"]["stem_conv"]["kernel"]).copy()
    trainer.fit(images, labels, verbose=False)
    after = np.asarray(trainer.params["stem_conv"]["kernel"])
    np.testing.assert_array_equal(before, after)  # backbone untouched
