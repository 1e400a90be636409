"""jaxpr FLOPs counter: exact counts on known shapes, zoo coverage."""

import jax.numpy as jnp
import numpy as np

from fast_image_recognition_tpu.utils.flops import fn_flops


def test_dot_general_count():
    a = jnp.zeros((8, 64))
    b = jnp.zeros((64, 32))
    got = fn_flops(lambda x, y: x @ y, a, b)
    assert got == 2 * 8 * 64 * 32


def test_conv_count_same_padding():
    import jax

    x = jnp.zeros((2, 16, 16, 8))
    k = jnp.zeros((3, 3, 8, 24))
    got = fn_flops(
        lambda x, k: jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        ),
        x,
        k,
    )
    assert got == 2 * (2 * 16 * 16 * 24) * (3 * 3 * 8)


def test_grouped_conv_counts_per_group_features():
    import jax

    x = jnp.zeros((1, 8, 8, 16))
    k = jnp.zeros((3, 3, 1, 16))  # depthwise
    got = fn_flops(
        lambda x, k: jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=16,
        ),
        x,
        k,
    )
    assert got == 2 * (1 * 8 * 8 * 16) * (3 * 3 * 1)


def test_backbone_forward_flops_close_to_published():
    """EfficientNet-B0 at 224 is ~0.39 GMACs = ~0.78 GFLOPs published;
    the embedded extractor (no classifier) must land in that ballpark."""
    from fast_image_recognition_tpu.models import create_backbone

    model, variables = create_backbone("b0", 0, resolution=224)
    x = jnp.zeros((1, 224, 224, 3))
    got = fn_flops(
        lambda v, x: model.apply(v, x, train=False)["embedding"], variables, x
    )
    assert 0.6e9 < got < 0.9e9, got


def test_folded_and_unfolded_match():
    """The BN-folded serving path must count the same conv FLOPs as the
    stock apply (fold moves scales into weights, not FLOPs)."""
    from fast_image_recognition_tpu.models import backbone_info, create_backbone
    from fast_image_recognition_tpu.models.fold import make_serving_fn

    model, variables = create_backbone("b0", 0, resolution=64)
    x = jnp.zeros((2, 64, 64, 3))
    plain = fn_flops(
        lambda v, x: model.apply(v, x, train=False)["embedding"], variables, x
    )

    fn, folded = make_serving_fn(model, variables, backbone_info("b0"), resolution=64)
    served = fn_flops(lambda v, x: fn(v, x)["embedding"], folded, x)
    assert abs(served - plain) / plain < 0.05, (served, plain)
