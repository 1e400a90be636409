"""Checkpoint / profiling utilities (SURVEY.md §5 aux subsystems)."""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_image_recognition_tpu.utils.checkpoint import (
    BestCheckpoint,
    EarlyStopping,
    EmbeddingCache,
    ema_update,
    load_variables,
    save_variables,
)
from fast_image_recognition_tpu.utils.profiling import Counters, Timer, time_jitted


def test_save_load_variables(tmp_path):
    variables = {
        "params": {"w": jnp.ones((3, 2)), "b": jnp.zeros(2)},
        "batch_stats": {"m": jnp.full((2,), 0.5)},
    }
    path = str(tmp_path / "ckpt.msgpack")
    save_variables(path, variables)
    loaded = load_variables(path, template=variables)
    np.testing.assert_allclose(
        np.asarray(loaded["params"]["w"]), np.asarray(variables["params"]["w"])
    )
    # template-free restore also works
    raw = load_variables(path)
    assert "params" in raw


def test_best_checkpoint_keeps_best(tmp_path):
    path = str(tmp_path / "best.msgpack")
    ckpt = BestCheckpoint(path, mode="max")
    assert ckpt.update(0.5, {"w": jnp.ones(2)})
    assert not ckpt.update(0.4, {"w": jnp.zeros(2)})  # worse: not saved
    assert ckpt.update(0.9, {"w": jnp.full(2, 9.0)})
    best = load_variables(path)
    np.testing.assert_allclose(best["w"], [9.0, 9.0])


def test_early_stopping_patience():
    stop = EarlyStopping(patience=2, mode="max")
    assert not stop.update(0.5)
    assert not stop.update(0.4)
    assert not stop.update(0.4)
    assert stop.update(0.3)  # third bad epoch > patience=2


def test_ema_update():
    ema = {"w": jnp.zeros(3)}
    params = {"w": jnp.ones(3)}
    out = ema_update(ema, params, decay=0.9)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.1)


def test_embedding_cache_roundtrip(tmp_path):
    cache = EmbeddingCache(str(tmp_path), "netname_")
    levels = [np.random.rand(4, 8).astype(np.float32) for _ in range(3)]
    labels = np.arange(4)
    assert not cache.exists("train")
    cache.save("train", levels, labels)
    assert cache.exists("train")
    got_levels, got_labels = cache.load("train")
    assert len(got_levels) == 3
    np.testing.assert_allclose(got_levels[1], levels[1])
    np.testing.assert_array_equal(got_labels, labels)


def test_counters_semantics():
    c = Counters(gallery_size=200)
    c.add_checked(np.asarray([10, 30, 60]))
    assert c.distance_calcs == 100
    assert c.probes == 3
    # avgCheckedPercent = 100 * calcs / (probes * N) (ann.h:29-30 semantics)
    np.testing.assert_allclose(c.avg_checked_percent, 100 * 100 / 600)
    empty = Counters()
    assert empty.avg_checked_percent == -1.0


def test_timer_spans():
    t = Timer()
    with t.span("work", sync=False):
        time.sleep(0.01)
    with t.span("work", sync=False):
        time.sleep(0.01)
    assert t.counts["work"] == 2
    assert t.totals["work"] >= 0.02
    assert "work" in t.report()


def test_time_jitted_separates_compile():
    fn = jax.jit(lambda x: x * 2 + 1)
    out = time_jitted(fn, jnp.ones((64, 64)), iters=3)
    assert out["compile_s"] > 0 and out["steady_s"] > 0
    assert out["compile_s"] >= out["steady_s"]
