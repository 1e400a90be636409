"""Sharded gallery + ICI top-k merge == global top-k, on the simulated
8-device CPU mesh (SURVEY.md §4 multi-chip test strategy)."""

import jax
import numpy as np
import pytest

from fast_image_recognition_tpu.data import make_synthetic_gallery
from fast_image_recognition_tpu.ops import oracle_pairwise
from fast_image_recognition_tpu.parallel import (
    ShardedGalleryMatcher,
    make_mesh,
    sharded_topk_l2,
)
from fast_image_recognition_tpu.parallel.mesh import gallery_mesh
from fast_image_recognition_tpu.parallel.sharded_gallery import shard_gallery


@pytest.fixture(scope="module")
def sets():
    gallery, glabels = make_synthetic_gallery(24, 30, 128, seed=61)  # N=720
    probes, _ = make_synthetic_gallery(24, 1, 128, seed=62)
    return probes[:12], gallery, glabels


def test_device_count():
    assert len(jax.devices()) == 8, "conftest must simulate 8 CPU devices"


@pytest.mark.parametrize("n_shards", [2, 4, 8])
def test_sharded_equals_global_topk(sets, n_shards):
    q, g, _ = sets
    mesh = gallery_mesh(n_shards)
    gal, n_valid = shard_gallery(g, mesh, tile_g=32, dtype=jax.numpy.float32)
    d, i = sharded_topk_l2(
        q, gal, mesh, k=3, n_valid_per_shard=n_valid, precise=True, tile_g=32
    )
    dense = oracle_pairwise(q, g)
    want_i = np.argsort(dense, axis=1)[:, :3]
    np.testing.assert_array_equal(np.asarray(i)[:, 0], want_i[:, 0])
    want_d = np.sort(dense, axis=1)[:, :3]
    np.testing.assert_allclose(np.asarray(d), want_d, rtol=2e-3, atol=1e-7)
    # padded shard rows must never leak into results
    assert (np.asarray(i) >= 0).all() and (np.asarray(i) < g.shape[0]).all()


def test_sharded_matcher_end_to_end(sets):
    q, g, glabels = sets
    mesh = gallery_mesh(4)
    matcher = ShardedGalleryMatcher(g, mesh, precise=True, tile_g=32)
    res = matcher.search(q)
    dense = oracle_pairwise(q, g)
    np.testing.assert_array_equal(res.indices, dense.argmin(1))


def test_ragged_last_shard(sets):
    """N chosen so the last shard is mostly padding."""
    q, g, _ = sets
    g = g[:530]  # 4 shards x 160 rows (tile 32) -> last shard 50 valid
    mesh = gallery_mesh(4)
    gal, n_valid = shard_gallery(g, mesh, tile_g=32, dtype=jax.numpy.float32)
    assert n_valid.sum() >= 530
    d, i = sharded_topk_l2(
        q, gal, mesh, k=1, n_valid_per_shard=n_valid, precise=True, tile_g=32
    )
    dense = oracle_pairwise(q, g)
    np.testing.assert_array_equal(np.asarray(i)[:, 0], dense.argmin(1))


def test_make_mesh_shapes():
    mesh = make_mesh(data=2, gallery=2, model=2)
    assert mesh.shape == {"data": 2, "gallery": 2, "model": 2}
    with pytest.raises(ValueError):
        make_mesh(data=4, gallery=4, model=4)


def test_two_level_mesh_merge(sets):
    """Multi-slice layout: gallery sharded over ('dcn', 'gallery') — per-
    slice ICI merge then a DCN-crossing merge — must equal global top-k."""
    import jax.numpy as jnp
    from jax.sharding import Mesh

    q, g, _ = sets
    devices = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devices, axis_names=("dcn", "gallery"))
    gal, n_valid = shard_gallery(
        g, mesh, tile_g=32, dtype=jnp.float32, axes=("dcn", "gallery")
    )
    d, i = sharded_topk_l2(
        q, gal, mesh, k=2, n_valid_per_shard=n_valid, precise=True,
        tile_g=32, axes=("dcn", "gallery"),
    )
    dense = oracle_pairwise(q, g)
    np.testing.assert_array_equal(np.asarray(i)[:, 0], dense.argmin(1))
