"""Fused MBConv Pallas kernel: parity with the folded XLA block path
(models/inference.py::_block) across block shapes, plus the s2d stem fold
and per-family preprocessing constants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_image_recognition_tpu.models import create_efficientnet
from fast_image_recognition_tpu.models.inference import (
    _block,
    fold_backbone,
    make_infer_fn,
)
from fast_image_recognition_tpu.ops.mbconv_kernel import fused_mbconv


@pytest.fixture(scope="module")
def b0_folded():
    model, variables = create_efficientnet("b0", 0, resolution=64,
                                           dtype=jnp.float32)
    folded, configs = fold_backbone(model, variables, dtype=jnp.bfloat16)
    return model, variables, folded, configs


# stride-1 representatives: no-expand, k3, k5, SE, residual, wide channels
@pytest.mark.parametrize("block_index", [0, 2, 4, 6, 8, 12, 15])
@pytest.mark.parametrize("hw", [7, 14, 16])
def test_fused_block_matches_xla(b0_folded, block_index, hw):
    _, _, folded, configs = b0_folded
    cfg = configs[block_index]
    p = folded["blocks"][block_index]
    cin = (
        p["w_exp"].shape[2] if cfg["has_expand"] else p["w_dw"].shape[-1]
    )
    x = jnp.asarray(
        np.random.default_rng(block_index).normal(size=(4, hw, hw, cin)),
        jnp.bfloat16,
    )
    want = np.asarray(_block(x, p, cfg), np.float32)
    got = np.asarray(fused_mbconv(x, p, cfg), np.float32)
    assert got.shape == want.shape
    scale = np.abs(want).max() + 1e-9
    assert np.abs(got - want).max() / scale < 0.03  # bf16 packing noise


@pytest.mark.parametrize("bias_scale", [1.0, 50.0])
def test_fused_block_border_columns(b0_folded, bias_scale):
    """The horizontal SAME-pad columns must read true zeros after the
    expand matmul (the XLA path pads AFTER expand, so act(b_exp) leaking
    into the border taps is a bug). An inflated expand bias makes any leak
    dominate the border columns; compare first/last columns explicitly."""
    _, _, folded, configs = b0_folded
    block_index = 2  # k3, expand, SE, residual
    cfg = configs[block_index]
    p = dict(folded["blocks"][block_index])
    p["b_exp"] = p["b_exp"] * bias_scale
    cin = p["w_exp"].shape[2]
    x = jnp.asarray(
        np.random.default_rng(7).normal(size=(2, 14, 14, cin)), jnp.bfloat16
    )
    want = np.asarray(_block(x, p, cfg), np.float32)
    got = np.asarray(fused_mbconv(x, p, cfg), np.float32)
    for col in (0, 1, -2, -1):  # the k=3 halo columns on both edges
        w, g = want[:, :, col, :], got[:, :, col, :]
        scale = np.abs(w).max() + 1e-9
        assert np.abs(g - w).max() / scale < 0.03, f"border col {col} leaks"


def test_fused_rejects_stride2(b0_folded):
    _, _, folded, configs = b0_folded
    cfg = configs[1]  # block2a, stride 2
    p = folded["blocks"][1]
    x = jnp.zeros((2, 16, 16, p["w_exp"].shape[2]), jnp.bfloat16)
    with pytest.raises(NotImplementedError):
        fused_mbconv(x, p, cfg)


def test_fused_full_forward_matches_unfused(b0_folded):
    model, variables, _, _ = b0_folded
    rng = np.random.default_rng(3)
    imgs = jnp.asarray(rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8))
    infer_f, folded_f = make_infer_fn(model, variables, resolution=64,
                                      fused=True)
    infer_u, folded_u = make_infer_fn(model, variables, resolution=64,
                                      fused=False)
    ef = np.asarray(infer_f(folded_f, imgs)["embedding"], np.float32)
    eu = np.asarray(infer_u(folded_u, imgs)["embedding"], np.float32)
    scale = np.abs(eu).max() + 1e-9
    assert np.abs(ef - eu).max() / scale < 0.05


def test_s2d_stem_fold_is_exact(b0_folded):
    """Space-to-depth stem (fold_stem_space_to_depth) is a re-layout of
    the same linear map — bit-comparable at fp32."""
    model, variables, _, _ = b0_folded
    rng = np.random.default_rng(4)
    imgs = jnp.asarray(rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8))
    infer, folded = make_infer_fn(model, variables, resolution=64,
                                  dtype=jnp.float32, space_to_depth=True)
    assert "stem_s2d_w" in folded
    e1 = np.asarray(infer(folded, imgs)["embedding"])
    folded_plain = {k: v for k, v in folded.items() if k != "stem_s2d_w"}
    e2 = np.asarray(infer(folded_plain, imgs)["embedding"])
    np.testing.assert_allclose(e1, e2, rtol=2e-5, atol=2e-5)
