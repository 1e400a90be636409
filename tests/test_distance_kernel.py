"""Pallas fused distance/top-k kernel vs the jnp/NumPy oracle.

On CPU these run in Pallas interpreter mode; the same code path compiles to
Mosaic on TPU. Covers padding (N, B not tile multiples), top-k ordering,
feature windows, and bf16 galleries.
"""

import numpy as np
import pytest

from fast_image_recognition_tpu.data import make_synthetic_gallery
from fast_image_recognition_tpu.ops import oracle_pairwise
from fast_image_recognition_tpu.ops.distance_kernel import topk_l2

import jax.numpy as jnp


@pytest.fixture(scope="module")
def sets():
    gallery, glabels = make_synthetic_gallery(16, 20, 128, seed=51)
    probes, _ = make_synthetic_gallery(16, 2, 128, seed=52)
    return probes[:10], gallery


def test_top1_parity(sets):
    q, g = sets
    d, i = topk_l2(q, g, k=1, tile_g=64, precise=True)
    dense = oracle_pairwise(q, g)
    np.testing.assert_array_equal(np.asarray(i)[:, 0], dense.argmin(1))
    np.testing.assert_allclose(
        np.asarray(d)[:, 0], dense.min(1), rtol=2e-3, atol=1e-7
    )


def test_topk_sorted_and_correct(sets):
    q, g = sets
    k = 5
    d, i = topk_l2(q, g, k=k, tile_g=64, precise=True)
    d = np.asarray(d)
    i = np.asarray(i)
    dense = oracle_pairwise(q, g)
    want_i = np.argsort(dense, axis=1)[:, :k]
    want_d = np.take_along_axis(dense, want_i, axis=1)
    np.testing.assert_allclose(d, want_d, rtol=2e-3, atol=1e-7)
    # fp32 rounding may swap near-ties deep in the top-k; require the
    # top-1 to match exactly and >= k-1 of k indices to overlap per row.
    np.testing.assert_array_equal(i[:, 0], want_i[:, 0])
    overlap = [len(set(i[r]) & set(want_i[r])) for r in range(i.shape[0])]
    assert min(overlap) >= k - 1
    # reported distances must be the true distances of the reported indices
    at_i = np.take_along_axis(dense, i, axis=1)
    np.testing.assert_allclose(d, at_i, rtol=2e-3, atol=1e-7)
    assert (np.diff(d, axis=1) >= -1e-9).all()


def test_ragged_sizes():
    # B and N deliberately not multiples of the tiles
    g, _ = make_synthetic_gallery(7, 13, 96, seed=1)  # N=91
    q, _ = make_synthetic_gallery(7, 1, 96, seed=2)  # B=7
    d, i = topk_l2(q, g, k=3, tile_g=32, precise=True)
    dense = oracle_pairwise(q, g)
    np.testing.assert_array_equal(np.asarray(i)[:, 0], dense.argmin(1))
    assert (np.asarray(i) < 91).all() and (np.asarray(i) >= 0).all()


def test_feature_window(sets):
    q, g = sets
    d, i = topk_l2(q, g, k=1, tile_g=64, window=(32, 96), precise=True)
    dense = oracle_pairwise(q, g, start=32, end=96)
    np.testing.assert_array_equal(np.asarray(i)[:, 0], dense.argmin(1))
    np.testing.assert_allclose(np.asarray(d)[:, 0], dense.min(1), rtol=2e-3)


def test_bf16_gallery_top1_parity(sets):
    q, g = sets
    gb = jnp.asarray(g, dtype=jnp.bfloat16)
    d, i = topk_l2(jnp.asarray(q), gb, k=1, tile_g=64)
    dense = oracle_pairwise(q, g)
    agree = (np.asarray(i)[:, 0] == dense.argmin(1)).mean()
    assert agree >= 0.9  # bf16 quantization may flip rare near-ties


def test_tile_min_parity(sets):
    from fast_image_recognition_tpu.ops.distance_kernel import tile_min_l2

    q, g = sets
    tile = 64
    d, i = tile_min_l2(q, g, tile_g=tile)
    d, i = np.asarray(d), np.asarray(i)
    dense = oracle_pairwise(q, g)
    n = g.shape[0]
    n_tiles = -(-max(n, tile) // tile)
    assert d.shape == (q.shape[0], n_tiles)
    for j in range(n_tiles):
        blk = dense[:, j * tile : min((j + 1) * tile, n)]
        if blk.shape[1] == 0:
            assert (d[:, j] > 1e30).all()
            continue
        np.testing.assert_array_equal(i[:, j], j * tile + blk.argmin(1))
        np.testing.assert_allclose(d[:, j], blk.min(1), rtol=2e-2, atol=1e-6)


def test_topk_candidates_contain_exact_nn(sets):
    from fast_image_recognition_tpu.ops.distance_kernel import (
        topk_candidates_l2,
    )

    q, g = sets
    cand = np.asarray(topk_candidates_l2(q, g, 4, tile_g=64))
    assert cand.shape == (q.shape[0], 4)
    nn = oracle_pairwise(q, g).argmin(1)
    assert all(nn[b] in cand[b] for b in range(q.shape[0]))
    # candidate rows come from distinct tiles
    assert all(len(set(cand[b] // 64)) == 4 for b in range(q.shape[0]))


def test_tile_min_ragged_n():
    from fast_image_recognition_tpu.ops.distance_kernel import (
        tile_min_l2,
        topk_candidates_l2,
    )

    gallery, _ = make_synthetic_gallery(7, 13, 96, seed=3)  # 91 rows
    probes, _ = make_synthetic_gallery(3, 1, 96, seed=4)
    d, i = tile_min_l2(probes, gallery, tile_g=32)
    dense = oracle_pairwise(probes, gallery)
    # last tile is ragged (91 = 2*32 + 27): pad rows must be masked
    blk = dense[:, 64:91]
    np.testing.assert_array_equal(np.asarray(i)[:, 2], 64 + blk.argmin(1))
    cand = np.asarray(topk_candidates_l2(probes, gallery, 2, tile_g=32))
    assert (cand < 91).all()


def test_tile_min_precomputed_gsq_and_bf16_scores(sets):
    """gsq= precompute must match the inline path exactly; bf16 scores
    agree up to near-ties (the rescore contract)."""
    import jax

    from fast_image_recognition_tpu.ops.distance_kernel import (
        gallery_sq_norms,
        tile_min_l2,
    )

    q, g = sets
    gsq = gallery_sq_norms(jnp.asarray(g, jnp.bfloat16), g.shape[0], tile_g=64)
    d_inline, i_inline = tile_min_l2(q, g, tile_g=64)
    d_pre, i_pre = tile_min_l2(q, g, tile_g=64, gsq=gsq)
    np.testing.assert_array_equal(np.asarray(i_inline), np.asarray(i_pre))
    np.testing.assert_allclose(np.asarray(d_inline), np.asarray(d_pre))

    d16, i16 = tile_min_l2(q, g, tile_g=64, precise_scores=False)
    # indices may flip only between bf16 near-ties; distances stay close
    n_tiles = np.asarray(d_inline).shape[1]
    dense = oracle_pairwise(q, g)
    for b in range(q.shape[0]):
        for t in range(n_tiles):
            blk = dense[b, t * 64 : min((t + 1) * 64, g.shape[0])]
            if blk.size == 0:
                continue
            # the chosen row's true distance is within bf16 slack of the min
            chosen = dense[b, np.asarray(i16)[b, t]]
            assert chosen <= blk.min() * 1.02 + 1e-5


def test_tile_min_packed_parity(sets):
    """Packed single-reduce scan (MXU-assembled distance + value|index in
    one int32 min) vs the dense oracle: per-tile argmin up to bf16 operand
    rounding, per-tile min distance to the 2^-13 key quantization, the
    true 1-NN always contained (the rescore contract)."""
    from fast_image_recognition_tpu.ops.distance_kernel import (
        pack_gallery_aug,
        tile_min_l2_packed,
        topk_candidates_l2_packed,
    )

    q, g = sets
    tile = 64
    n = g.shape[0]
    gaug = pack_gallery_aug(jnp.asarray(g), n, tile_g=tile)
    assert gaug.shape[1] == 256 and gaug.dtype == jnp.bfloat16  # 128+4 -> 256
    d, i = tile_min_l2_packed(q, gaug, g.shape[1], tile_g=tile)
    d, i = np.asarray(d), np.asarray(i)
    dense = oracle_pairwise(q, g)
    n_tiles = -(-n // tile)
    assert d.shape == (q.shape[0], n_tiles)
    for b in range(q.shape[0]):
        for t in range(n_tiles):
            blk = dense[b, t * tile : min((t + 1) * tile, n)]
            # chosen row within bf16 slack of the tile min; reported
            # distance matches the chosen row up to key quantization
            chosen = dense[b, i[b, t]]
            assert i[b, t] // tile == t and i[b, t] < n
            assert chosen <= blk.min() * 1.02 + 1e-5
            np.testing.assert_allclose(d[b, t], chosen, rtol=2e-2, atol=1e-5)
    # 1-NN containment through the candidate surface
    cand = np.asarray(topk_candidates_l2_packed(q, gaug, g.shape[1], 4, tile_g=tile))
    nn = dense.argmin(1)
    assert all(nn[b] in cand[b] for b in range(q.shape[0]))


def test_tile_min2_packed_second_min_and_cert(sets):
    """tile_min2 emits each tile's min AND second-min; the certificate
    bound must lower-bound the true raw squared distance of every row the
    candidate set does not contain (the escalation soundness contract)."""
    from fast_image_recognition_tpu.ops.distance_kernel import (
        pack_gallery_aug,
        tile_min2_l2_packed,
        topk_candidates_l2_packed_cert,
    )

    q, g = sets
    tile = 64
    n, dim = g.shape
    gaug = pack_gallery_aug(jnp.asarray(g), n, tile_g=tile)
    d1, i, d2 = tile_min2_l2_packed(q, gaug, dim, tile_g=tile)
    d1, i, d2 = np.asarray(d1), np.asarray(i), np.asarray(d2)
    dense = oracle_pairwise(q, g) * dim  # raw squared (oracle is /dim)
    n_tiles = -(-n // tile)
    for b in range(q.shape[0]):
        for t in range(n_tiles):
            blk = np.sort(dense[b, t * tile : min((t + 1) * tile, n)])
            assert d2[b, t] >= d1[b, t]
            # both values track the tile's two smallest up to bf16 +
            # key-quantization slack (argmin flips swap near-ties only)
            np.testing.assert_allclose(d1[b, t], blk[0], rtol=3e-2, atol=1e-4)
            np.testing.assert_allclose(d2[b, t], blk[1], rtol=3e-2, atol=1e-4)
    r = 3
    cand, bound = topk_candidates_l2_packed_cert(q, gaug, dim, r, tile_g=tile)
    cand, bound = np.asarray(cand), np.asarray(bound)
    for b in range(q.shape[0]):
        unscored = np.setdiff1d(np.arange(n), cand[b])
        true_min_unscored = dense[b, unscored].min()
        # soundness: bound never exceeds the true unscored min by more
        # than the numeric slack the caller's escalate margin covers
        assert bound[b] <= true_min_unscored * 1.03 + 1e-4


def test_tile_min_packed_ragged_n():
    """Pad rows past n_valid carry a huge key and never win a tile min."""
    from fast_image_recognition_tpu.ops.distance_kernel import (
        pack_gallery_aug,
        tile_min_l2_packed,
    )

    gallery, _ = make_synthetic_gallery(7, 13, 96, seed=3)  # 91 rows
    probes, _ = make_synthetic_gallery(3, 1, 96, seed=4)
    gaug = pack_gallery_aug(jnp.asarray(gallery), 91, tile_g=32)
    d, i = tile_min_l2_packed(probes, gaug, 96, tile_g=32)
    dense = oracle_pairwise(probes, gallery)
    blk = dense[:, 64:91]  # ragged last tile: 91 = 2*32 + 27
    assert (np.asarray(i)[:, 2] < 91).all()
    np.testing.assert_allclose(
        np.asarray(d)[:, 2],
        dense[np.arange(3), np.asarray(i)[:, 2]],
        rtol=2e-2,
    )
    assert (np.asarray(d)[:, 2] <= blk.min(1) * 1.02 + 1e-5).all()
