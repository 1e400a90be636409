"""Variables-level BN fold (models/fold.py): folded model.apply must match
the unfolded forward for every non-MBConv zoo family, and the unified
serving entry must work for EVERY zoo name (the reference's full model menu,
dnn_feature_extractor.py:19-56)."""

import jax.numpy as jnp
import numpy as np
import pytest

from fast_image_recognition_tpu.models import backbone_info, create_backbone
from fast_image_recognition_tpu.models.fold import (
    fold_tf_preprocess_into_valid_stem,
    fold_variables,
    make_serving_fn,
)

# (name, test resolution) — small enough for the CPU mesh, large enough for
# the VALID-padded inception stems (>= 75)
_FOLD_FAMILIES = [
    ("resnet50", 64),
    ("resnet50v2", 64),
    ("inception_v3", 96),
    ("inception_resnet_v2", 96),
    ("mobilenetv1", 64),
]


def _rand_images(n, res, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).integers(0, 255, (n, res, res, 3)),
        jnp.float32,
    )


@pytest.mark.parametrize("name,res", _FOLD_FAMILIES)
def test_fold_variables_parity(name, res):
    """model.apply(folded) == model.apply(raw) at bf16 noise level. Random
    init gives non-trivial BN stats only after a train step, so perturb the
    stats to make the fold actually do work."""
    model, variables = create_backbone(name, 0, resolution=res)
    rng = np.random.default_rng(1)

    def perturb(node):
        try:
            return {k: perturb(v) for k, v in node.items()}
        except AttributeError:
            a = np.asarray(node)
            return a + rng.uniform(0.05, 0.2, a.shape).astype(a.dtype)

    variables = {
        "params": variables["params"],
        "batch_stats": perturb(variables["batch_stats"]),
    }
    folded = fold_variables(model, variables)
    x = _rand_images(2, res) / 127.5 - 1.0
    want = np.asarray(
        model.apply(variables, x, train=False)["embedding"], np.float32
    )
    got = np.asarray(
        model.apply(folded, x, train=False)["embedding"], np.float32
    )
    scale = np.abs(want).max() + 1e-9
    assert np.abs(got - want).max() / scale < 0.02, name


@pytest.mark.parametrize("name", ["inception_v3", "inception_resnet_v2"])
def test_preprocess_fold_is_exact_for_valid_stems(name):
    """VALID stem => conv(x/127.5 - 1, W) == conv(x, W/127.5) - sum(W)
    exactly; the folded model consumes raw 0..255 images."""
    res = 96
    model, variables = create_backbone(name, 0, resolution=res, dtype=jnp.float32)
    folded = fold_variables(model, variables)
    folded_pp = fold_tf_preprocess_into_valid_stem(folded)
    raw = _rand_images(2, res, seed=2)
    want = np.asarray(
        model.apply(folded, raw / 127.5 - 1.0, train=False)["embedding"]
    )
    got = np.asarray(model.apply(folded_pp, raw, train=False)["embedding"])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize(
    "name,res",
    [("b0", 64), ("mobilenetv2", 64), ("vgg19", 64)] + _FOLD_FAMILIES,
)
def test_make_serving_fn_covers_the_zoo(name, res):
    """The unified entry returns embeddings + requested taps for every
    family, consuming raw images (fixes the silent downgrade of
    models/extractor.py:58-59 and the bench KeyError of ADVICE r2)."""
    info = backbone_info(name)
    model, variables = create_backbone(name, 0, resolution=res)
    taps = tuple(info["taps"][:1])
    fn, params = make_serving_fn(
        model, variables, info, resolution=res, taps=taps
    )
    out = fn(params, _rand_images(2, res, seed=3))
    assert out["embedding"].shape == (2, info["embedding_dim"])
    assert set(out["taps"].keys()) == set(taps)
    assert np.isfinite(np.asarray(out["embedding"], np.float32)).all()


def test_serving_fn_folded_matches_unfolded():
    """End-to-end: folded serving == unfolded serving on the flagship
    (InceptionResNetV2, the 1536-d gallery producer of qt_cpp/db.h:79-91)."""
    res = 96
    info = backbone_info("inception_resnet_v2")
    model, variables = create_backbone("inception_resnet_v2", 0, resolution=res)
    imgs = _rand_images(2, res, seed=4)
    fn_f, p_f = make_serving_fn(model, variables, info, resolution=res)
    fn_u, p_u = make_serving_fn(
        model, variables, info, resolution=res, folded=False
    )
    ef = np.asarray(fn_f(p_f, imgs)["embedding"], np.float32)
    eu = np.asarray(fn_u(p_u, imgs)["embedding"], np.float32)
    scale = np.abs(eu).max() + 1e-9
    assert np.abs(ef - eu).max() / scale < 0.02
