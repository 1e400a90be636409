"""Parity of the folded inference path vs the flax module (train=False)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_image_recognition_tpu.models import create_efficientnet, default_taps
from fast_image_recognition_tpu.models.inference import (
    fold_efficientnet,
    folded_blocks,
    folded_forward,
    folded_stem,
    make_infer_fn,
)


def _randomize_bn(variables, seed=0):
    """Give every BN non-trivial scale/bias/mean/var so folding is exercised
    beyond the init-state identity."""
    rng = np.random.default_rng(seed)

    def bump(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        leaf = np.asarray(leaf)
        if names[-1] == "mean":
            return leaf + rng.normal(0, 0.3, leaf.shape).astype(leaf.dtype)
        if names[-1] == "var":
            return leaf * rng.uniform(0.5, 2.0, leaf.shape).astype(leaf.dtype)
        if names[-1] == "scale":
            return leaf * rng.uniform(0.7, 1.3, leaf.shape).astype(leaf.dtype)
        if names[-1] == "bias" and "Norm" not in str(names):
            return leaf + rng.normal(0, 0.05, leaf.shape).astype(leaf.dtype)
        if names[-1] == "bias":
            return leaf + rng.normal(0, 0.1, leaf.shape).astype(leaf.dtype)
        return leaf

    return jax.tree_util.tree_map_with_path(bump, variables)


@pytest.fixture(scope="module")
def b0_fp32():
    model, variables = create_efficientnet(
        "b0", 0, resolution=64, dtype=jnp.float32
    )
    variables = _randomize_bn(variables)
    return model, variables


def test_folded_forward_matches_module(b0_fp32):
    model, variables = b0_fp32
    taps = tuple(default_taps("b0"))
    rng = np.random.default_rng(1)
    images = rng.integers(0, 255, (4, 64, 64, 3)).astype(np.float32)

    from fast_image_recognition_tpu.models import preprocess_images

    x = preprocess_images(jnp.asarray(images), 64)
    ref = model.apply(variables, x, train=False, taps=taps)

    infer, folded = make_infer_fn(
        model, variables, taps=taps, resolution=64, dtype=jnp.float32
    )
    out = jax.jit(infer)(folded, jnp.asarray(images))

    np.testing.assert_allclose(
        np.asarray(out["embedding"]),
        np.asarray(ref["embedding"]),
        rtol=2e-4,
        atol=2e-5,
    )
    for t in taps:
        np.testing.assert_allclose(
            np.asarray(out["taps"][t]),
            np.asarray(ref["taps"][t]),
            rtol=2e-4,
            atol=2e-5,
        )


def test_folded_segments_match_run_blocks(b0_fp32):
    model, variables = b0_fp32
    folded, configs = fold_efficientnet(model, variables, dtype=jnp.float32)
    rng = np.random.default_rng(2)
    x0 = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))

    stem_ref = model.apply(variables, x0, method=lambda m, x: m.stem(x))
    stem_out = folded_stem(folded, x0)
    np.testing.assert_allclose(
        np.asarray(stem_out), np.asarray(stem_ref), rtol=2e-4, atol=2e-5
    )

    mid = len(configs) // 2
    seg_ref = model.apply(
        variables, stem_ref, method=lambda m, x: m.run_blocks(x, 0, mid)
    )
    seg_out = folded_blocks(folded, configs, stem_out, 0, mid)
    np.testing.assert_allclose(
        np.asarray(seg_out), np.asarray(seg_ref), rtol=5e-4, atol=5e-5
    )
    # resuming from the midpoint matches too (cascade segment contract)
    end_ref = model.apply(
        variables, seg_ref, method=lambda m, x: m.run_blocks(x, mid, len(configs))
    )
    end_out = folded_blocks(folded, configs, seg_out, mid, None)
    np.testing.assert_allclose(
        np.asarray(end_out), np.asarray(end_ref), rtol=2e-3, atol=2e-4
    )


def test_folded_bf16_close_to_fp32(b0_fp32):
    model, variables = b0_fp32
    rng = np.random.default_rng(3)
    images = rng.integers(0, 255, (2, 64, 64, 3)).astype(np.float32)
    infer32, folded32 = make_infer_fn(model, variables, resolution=64, dtype=jnp.float32)
    infer16, folded16 = make_infer_fn(model, variables, resolution=64, dtype=jnp.bfloat16)
    e32 = np.asarray(infer32(folded32, jnp.asarray(images))["embedding"])
    e16 = np.asarray(infer16(folded16, jnp.asarray(images))["embedding"])
    # bf16 compute tracks fp32 to ~1% — embeddings are used for NN matching
    cos = (e32 * e16).sum(1) / (
        np.linalg.norm(e32, axis=1) * np.linalg.norm(e16, axis=1)
    )
    assert (cos > 0.999).all()
