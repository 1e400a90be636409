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


def _fit_pca_pair(g, p):
    from fast_image_recognition_tpu.ops.pca import fit_pca

    pca = fit_pca(g, num_components=p)
    return pca.mean, pca.components.T  # mu [D], w [D, P]


@pytest.mark.parametrize("n_shards", [1, 2, 4, 8])
def test_sharded_packed_pca_equals_global(sets, n_shards):
    """Packed PCA candidate scan + shard-local exact rescore must recover
    the global 1-NN (candidate containment per shard + exact merge)."""
    import jax.numpy as jnp

    from fast_image_recognition_tpu.parallel.sharded_gallery import (
        shard_gallery_pca_aug,
        sharded_topk_pca_packed,
    )

    _, g, _ = sets
    # planted NNs: perturbed gallery rows spread across shards, so the
    # true 1-NN is unambiguous under the bf16 rescore contract
    rng = np.random.default_rng(71 + n_shards)
    planted = np.linspace(0, len(g) - 1, 12).astype(int)
    q = g[planted] + 0.01 * rng.standard_normal((12, g.shape[1])).astype(
        np.float32
    )
    mu, w = _fit_pca_pair(g, 32)
    mesh = gallery_mesh(n_shards)
    gal, n_valid = shard_gallery(g, mesh, tile_g=32, dtype=jnp.bfloat16)
    gal_aug = shard_gallery_pca_aug(gal, n_valid, mesh, mu, w, tile_g=32)
    # aug shards stay row-aligned with the gallery shards (local ids match)
    assert gal_aug.shape[0] == gal.shape[0]
    d, i = sharded_topk_pca_packed(
        q, gal_aug, gal, mesh, mu, w,
        k=1, rescore=8, n_valid_per_shard=n_valid, tile_g=32,
    )
    dense = oracle_pairwise(q, g)
    np.testing.assert_array_equal(np.asarray(i)[:, 0], dense.argmin(1))
    np.testing.assert_allclose(
        np.asarray(d)[:, 0], dense.min(1), rtol=5e-2, atol=1e-3
    )


def test_sharded_packed_weak_scaling_shape(sets):
    """Weak scaling: per-shard rows FIXED while devices grow 1 -> 8. The
    merge stays O(devices * k): per-query cross-chip traffic is exactly
    the [S, B, k] gathered candidate set, and results stay exact."""
    import jax.numpy as jnp

    from fast_image_recognition_tpu.parallel.sharded_gallery import (
        shard_gallery_pca_aug,
        sharded_topk_pca_packed,
    )

    rng = np.random.default_rng(7)
    rows_per_shard = 96  # fixed per-shard workload
    d_dim = 128
    for n_shards in (1, 2, 4, 8):
        n = rows_per_shard * n_shards
        g = rng.standard_normal((n, d_dim)).astype(np.float32)
        planted = np.linspace(0, n - 1, 8).astype(int)  # one+ per shard
        q = g[planted] + 0.01 * rng.standard_normal((8, d_dim)).astype(
            np.float32
        )
        mu, w = _fit_pca_pair(g, 32)
        mesh = gallery_mesh(n_shards)
        gal, n_valid = shard_gallery(g, mesh, tile_g=32, dtype=jnp.bfloat16)
        assert (n_valid == rows_per_shard).all()  # truly weak-scaled
        gal_aug = shard_gallery_pca_aug(gal, n_valid, mesh, mu, w, tile_g=32)
        k = 2
        d, i = sharded_topk_pca_packed(
            q, gal_aug, gal, mesh, mu, w,
            k=k, rescore=8, n_valid_per_shard=n_valid, tile_g=32,
        )
        dense = oracle_pairwise(q, g)
        np.testing.assert_array_equal(
            np.asarray(i)[:, 0], dense.argmin(1)
        )
        # merge input is exactly devices*k candidates per query
        assert np.asarray(i).shape == (8, k)


def test_sharded_packed_ragged_last_shard(sets):
    import jax.numpy as jnp

    from fast_image_recognition_tpu.parallel.sharded_gallery import (
        shard_gallery_pca_aug,
        sharded_topk_pca_packed,
    )

    _, g, _ = sets
    g = g[:530]  # 4 shards x 160 rows (tile 32) -> last shard 50 valid
    rng = np.random.default_rng(9)
    planted = np.linspace(0, 529, 12).astype(int)  # incl. the ragged shard
    q = g[planted] + 0.01 * rng.standard_normal((12, g.shape[1])).astype(
        np.float32
    )
    mu, w = _fit_pca_pair(g, 32)
    mesh = gallery_mesh(4)
    gal, n_valid = shard_gallery(g, mesh, tile_g=32, dtype=jnp.bfloat16)
    gal_aug = shard_gallery_pca_aug(gal, n_valid, mesh, mu, w, tile_g=32)
    d, i = sharded_topk_pca_packed(
        q, gal_aug, gal, mesh, mu, w,
        k=1, rescore=8, n_valid_per_shard=n_valid, tile_g=32,
    )
    dense = oracle_pairwise(q, g)
    np.testing.assert_array_equal(np.asarray(i)[:, 0], dense.argmin(1))
    assert (np.asarray(i) >= 0).all() and (np.asarray(i) < 530).all()


def test_serving_sharded_packed_self_match():
    """RecognitionService(match='sharded', sharded_scan='packed') finds
    planted self-matches through the full extract+match jit."""
    from fast_image_recognition_tpu.serving import build_service

    res = 32
    n_dev = 4
    mesh = gallery_mesh(n_dev)
    probe = build_service(
        "b0", np.eye(4, 1280, dtype=np.float32), resolution=res,
        match="exact",
    )
    imgs = (np.random.default_rng(2).random((4, res, res, 3)) * 255).astype(
        np.float32
    )
    emb = probe.embed(imgs)
    rng = np.random.default_rng(3)
    sgal = rng.standard_normal((n_dev * 600, 1280))
    sgal = (sgal / np.linalg.norm(sgal, axis=1, keepdims=True)).astype(
        np.float32
    )
    planted = np.arange(0, n_dev * 600, 601)[: len(imgs)]
    sgal[planted] = emb
    svc = build_service(
        "b0", sgal, resolution=res, match="sharded",
        sharded_scan="packed", mesh=mesh, pca_dim=64, rescore=8,
    )
    svc.sparams = probe.sparams
    rows, _ = svc.identify(imgs)
    np.testing.assert_array_equal(rows, planted)


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
