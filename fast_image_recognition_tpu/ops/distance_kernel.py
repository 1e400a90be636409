"""Pallas TPU kernel: blocked gallery distance scan with fused running top-k.

This is the TPU-native replacement for the scalar gallery loops of
qt_cpp/db_features.cpp:319-335 / qt_cpp/ann.cpp:113-126 at production scale:
the query batch stays resident in VMEM, the gallery lives in HBM and is
streamed tile-by-tile (Pallas double-buffers the DMA via the grid BlockSpec),
each tile's distances are computed on the MXU via the ``|q|^2 + |g|^2 -
2 q.g`` expansion, and a per-query top-k carry persists in VMEM scratch
across the gallery grid — the ring-attention-shaped loop with a top-k carry
instead of softmax state (SURVEY.md §5). The [B, N] score matrix is never
materialized and every gallery byte is read exactly once per batch, so the
kernel is compute-bound on the MXU for bf16 galleries.

Feature-window support (``start``/``end`` over the feature axis) implements
the partial-range primitive under the TWD / sequential classifiers
(db_features.cpp:22-26 start_pos/end_pos) via lane masking, keeping shapes
static for XLA.

Top-k with small static k is computed by iterative argmin extraction (the
reference only ever needs k=1; shard-merge paths use k<=16).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG_DIST = 3.4e38
_INT_BIG = 2**31 - 1

# Max query rows held VMEM-resident per kernel launch; larger batches are
# chunked at the host level by ``topk_l2``.
MAX_QUERY_BLOCK = 1024


def _masked_argmin(d: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(min, argmin) along axis=1 of [TQ, TG] without lax.argmin (keeps the
    lowering friendly for Mosaic): equality mask + iota min. The equality
    compare runs on fp32 operands even for bf16 ``d``: a bf16 compare
    yields an i1 vector in Mosaic's (16, 128) bf16 tiling which cannot be
    relayouted to select against the (8, 128)-tiled int32 iota ("Invalid
    relayout ... vector<...xi1>"); upcasting just the compare keeps the
    mask in the 32-bit layout. Exact — upcasts preserve bf16 values."""
    tq, tg = d.shape
    mins = jnp.min(d, axis=1, keepdims=True)
    cols = jax.lax.broadcasted_iota(jnp.int32, (tq, tg), 1)
    eq = d.astype(jnp.float32) == mins.astype(jnp.float32)
    arg = jnp.min(jnp.where(eq, cols, _INT_BIG), axis=1)
    return mins[:, 0], arg


def _merge_topk(
    best_d: jax.Array,  # [B, k] ascending
    best_i: jax.Array,  # [B, k]
    tile_d: jax.Array,  # [B, TG]
    tile_base: jax.Array,  # scalar: global index of tile column 0
    k: int,
) -> Tuple[jax.Array, jax.Array]:
    """Extract the k smallest of tile_d and merge into the sorted carry."""
    b = tile_d.shape[0]
    cand_d = []
    cand_i = []
    d = tile_d
    for _ in range(k):
        m, a = _masked_argmin(d)
        cand_d.append(m)
        cand_i.append(tile_base + a)
        if k > 1:
            tg = d.shape[1]
            cols = jax.lax.broadcasted_iota(jnp.int32, (b, tg), 1)
            d = jnp.where(cols == a[:, None], BIG_DIST, d)
    # Select the k smallest of the 2k carried + candidate entries.
    all_d = jnp.concatenate([best_d] + [c[:, None] for c in cand_d], axis=1)
    all_i = jnp.concatenate([best_i] + [c[:, None] for c in cand_i], axis=1)
    out_d = []
    out_i = []
    for _ in range(k):
        m, a = _masked_argmin(all_d)
        out_d.append(m)
        cols = jax.lax.broadcasted_iota(jnp.int32, all_d.shape, 1)
        sel = cols == a[:, None]
        out_i.append(jnp.sum(jnp.where(sel, all_i, 0), axis=1))
        all_d = jnp.where(sel, BIG_DIST, all_d)
    return jnp.stack(out_d, axis=1), jnp.stack(out_i, axis=1)


def _topk_kernel(
    # scalar prefetch
    n_valid_ref,  # [1] int32: true gallery row count
    window_ref,  # [2] int32: feature window [start, end)
    # inputs
    q_ref,  # [B, D]   (whole padded query block, VMEM-resident)
    g_ref,  # [TG, D]  (streamed gallery tile)
    # outputs
    out_d_ref,  # [B, k]
    out_i_ref,  # [B, k]
    # scratch
    best_d,  # VMEM [B, k]
    best_i,  # VMEM [B, k]
    qsq,  # VMEM [B, 1] cached |q|^2 over the window
    *,
    k: int,
    tile_g: int,
    windowed: bool,
    precise: bool,
):
    j = pl.program_id(0)
    n_tiles_g = pl.num_programs(0)

    if windowed:
        start = window_ref[0]
        end = window_ref[1]
        lanes = jax.lax.broadcasted_iota(jnp.int32, (1, q_ref.shape[1]), 1)
        fmask = (lanes >= start) & (lanes < end)
    else:
        fmask = None

    def masked(x):
        return x * fmask.astype(x.dtype) if fmask is not None else x

    @pl.when(j == 0)
    def _init():
        best_d[:] = jnp.full_like(best_d, BIG_DIST)
        best_i[:] = jnp.full_like(best_i, -1)
        qf = masked(q_ref[:]).astype(jnp.float32)
        qsq[:] = jnp.sum(qf * qf, axis=1, keepdims=True)

    q = masked(q_ref[:])
    g = masked(g_ref[:])
    gf = g.astype(jnp.float32)
    gn = jnp.sum(gf * gf, axis=1, keepdims=True)  # [TG, 1]
    if precise:
        # fp32 MXU passes regardless of the storage dtype: a bf16-stored
        # gallery is upcast per-tile in VMEM (exact), which keeps the HBM
        # stream at bf16 width — Mosaic rejects bf16 operands at HIGHEST
        # precision, and 'precise' means fp32 contraction of stored values.
        q = q.astype(jnp.float32)
        g = gf
    cross = jax.lax.dot_general(
        q,
        g,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=(
            jax.lax.Precision.HIGHEST if precise else jax.lax.Precision.DEFAULT
        ),
    )  # [B, TG]
    tile_d = jnp.maximum(qsq[:] + gn.reshape(1, -1) - 2.0 * cross, 0.0)

    # Mask padded gallery rows beyond the true N.
    tile_base = j * tile_g
    cols = jax.lax.broadcasted_iota(jnp.int32, tile_d.shape, 1) + tile_base
    tile_d = jnp.where(cols < n_valid_ref[0], tile_d, BIG_DIST)

    new_d, new_i = _merge_topk(best_d[:], best_i[:], tile_d, tile_base, k)
    best_d[:] = new_d
    best_i[:] = new_i

    @pl.when(j == n_tiles_g - 1)
    def _emit():
        out_d_ref[:] = best_d[:]
        out_i_ref[:] = best_i[:]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _tilemin_kernel(
    # inputs
    q_ref,  # [B, D]    (whole padded query block, VMEM-resident)
    g_ref,  # [TG, D]   (streamed gallery tile)
    gsq_ref,  # [8, TG] row j%8 = |g|^2 of this tile (BIG on padded rows)
    # outputs (row j%8 of the revisited 8-row block = this tile's min)
    out_d_ref,  # [8, B]
    out_i_ref,  # [8, B]
    *,
    tile_g: int,
    score_t,
):
    """Minimal VPU epilogue: the gallery squared-norms arrive precomputed
    (one pass on the wrapper side, amortized across calls when the caller
    passes them), padded rows carry BIG so no iota/n_valid masking is
    needed, and the per-query |q|^2 term — constant along the gallery
    axis, hence irrelevant to every argmin — is added back OUTSIDE the
    kernel on the tiny [B, n_tiles] output. Per tile: one MXU dot, one
    fused subtract, one min+argmin.

    ``score_t=bfloat16`` (wrapper ``precise_scores=False``) runs the
    subtract/min/argmin passes — the measured cost ceiling of this kernel,
    ~2x the bare dot — at half width; the MXU accumulator and the kernel
    boundary (gsq in, min out) stay fp32 (bf16 refs with 8-sublane blocks
    would violate Mosaic's (16, 128) bf16 tiling). bf16 rounding can flip
    the within-tile argmin between rows whose distances agree to ~0.4%;
    downstream rescoring absorbs that."""
    j = pl.program_id(0)
    cross = jax.lax.dot_general(
        q_ref[:],
        g_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [B, TG]
    tile_d = (
        gsq_ref[j % 8, :][None, :].astype(score_t)
        - jnp.asarray(2.0, score_t) * cross.astype(score_t)
    )
    m, a = _masked_argmin(tile_d)
    # Pallas TPU blocks need >=8 rows: 8 consecutive grid steps revisit one
    # 8-row output block (flushed to HBM when the block index advances).
    out_d_ref[j % 8, :] = m.astype(jnp.float32)
    out_i_ref[j % 8, :] = j * tile_g + a


@functools.partial(
    jax.jit, static_argnames=("tile_g", "interpret", "precise_scores")
)
def _tilemin_l2_block(
    queries: jax.Array,  # [Bp, D]
    gallery: jax.Array,  # [Np, D] (padded to tile_g)
    gsq_rows: jax.Array,  # [n_rows8, TG] fp32 (BIG on padded gallery rows)
    tile_g: int,
    interpret: bool,
    precise_scores: bool,
):
    bp, d = queries.shape
    np_, _ = gallery.shape
    n_tiles = np_ // tile_g
    n_rows = _round_up(n_tiles, 8)
    score_t = jnp.float32 if precise_scores else jnp.bfloat16
    kernel = functools.partial(_tilemin_kernel, tile_g=tile_g, score_t=score_t)
    out_d, out_i = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((bp, d), lambda j: (0, 0)),
            pl.BlockSpec((tile_g, d), lambda j: (j, 0)),
            pl.BlockSpec((8, tile_g), lambda j: (j // 8, 0)),
        ],
        out_specs=[
            pl.BlockSpec((8, bp), lambda j: (j // 8, 0)),
            pl.BlockSpec((8, bp), lambda j: (j // 8, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_rows, bp), jnp.float32),
            jax.ShapeDtypeStruct((n_rows, bp), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * np_ * d,
            bytes_accessed=int(np_ * d * gallery.dtype.itemsize),
            transcendentals=0,
        ),
        interpret=interpret,
    )(queries, gallery, gsq_rows)
    return out_d[:n_tiles], out_i[:n_tiles]


def gallery_sq_norms(
    gallery: jax.Array, n_valid: int, tile_g: int = 1024
) -> jax.Array:
    """Precompute |g|^2 for ``tile_min_l2`` in its kernel layout:
    [roundup(n_tiles, 8), tile_g] fp32 with BIG on rows >= n_valid (pad
    rows need no separate masking in the kernel). Compute once per gallery
    and pass via ``gsq=`` to amortize the extra full-gallery pass."""
    gallery = pad_gallery(gallery, tile_g)
    np_ = gallery.shape[0]
    n_tiles = np_ // tile_g
    n_rows = _round_up(n_tiles, 8)
    gsq = jnp.einsum(
        "nd,nd->n", gallery, gallery, preferred_element_type=jnp.float32
    )
    gsq = jnp.where(jnp.arange(np_) < n_valid, gsq, BIG_DIST)
    gsq = gsq.reshape(n_tiles, tile_g)
    if n_rows != n_tiles:
        gsq = jnp.pad(
            gsq, ((0, n_rows - n_tiles), (0, 0)), constant_values=BIG_DIST
        )
    return gsq


def tile_min_l2(
    queries: jax.Array,
    gallery: jax.Array,
    *,
    n_valid: Optional[int] = None,
    tile_g: int = 1024,
    interpret: Optional[bool] = None,
    gsq: Optional[jax.Array] = None,
    precise_scores: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Per-gallery-tile L2 min: (dist [B, n_tiles], index [B, n_tiles]).

    The hierarchical candidate-generation primitive: one cheap argmin per
    tile instead of ``topk_l2``'s k iterative extraction passes, so cost is
    independent of how many candidates are taken downstream. The global
    1-NN is always the min of its own tile, so top-R over the tile mins is
    an NN-preserving candidate set of R spatially diverse rows.

    Precision contract: the MXU cross term always runs on bf16 operands
    (fp32 inputs are downcast — that IS the kernel's speed), so NN
    containment holds up to bf16 operand rounding (~0.4% near-ties) in
    EVERY mode; downstream full-precision rescoring of the candidate rows
    absorbs it (the e2e bench audits this — 100% measured agreement with
    the fp32 scan at 1M rows). ``precise_scores`` selects only the
    reduction/accumulation precision: ``False`` runs the kernel's
    reduction passes in bf16 too (~25% faster at D=256) at slightly wider
    near-tie loss.

    ``gsq``: precomputed ``gallery_sq_norms(...)`` — pass it when the same
    gallery serves many calls to skip the norm pass."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, d = queries.shape
    n = n_valid if n_valid is not None else gallery.shape[0]
    gallery = pad_gallery(gallery, tile_g)
    if gallery.dtype == jnp.float32:
        gallery = gallery.astype(jnp.bfloat16)
    if gsq is None:
        gsq = gallery_sq_norms(gallery, n, tile_g)
    queries = jnp.asarray(queries)
    qsq = jnp.einsum(
        "bd,bd->b", queries, queries, preferred_element_type=jnp.float32
    )
    queries = queries.astype(gallery.dtype)
    # lane-dim output rows want a 128 multiple; queries are cheap to pad
    bp = _round_up(max(b, 128), 128)
    if bp != b:
        queries = jnp.pad(queries, ((0, bp - b), (0, 0)))
    outs_d = []
    outs_i = []
    for s in range(0, bp, MAX_QUERY_BLOCK):
        chunk = queries[s : s + MAX_QUERY_BLOCK]
        od, oi = _tilemin_l2_block(
            chunk, gallery, gsq, tile_g, interpret, precise_scores
        )
        outs_d.append(od.T)
        outs_i.append(oi.T)
    out_d = jnp.concatenate(outs_d, axis=0) if len(outs_d) > 1 else outs_d[0]
    out_i = jnp.concatenate(outs_i, axis=0) if len(outs_i) > 1 else outs_i[0]
    # |q|^2 is constant along the gallery axis (argmin-neutral): applied
    # here on the [B, n_tiles] output instead of [B, N] inside the kernel.
    out_d = jnp.maximum(out_d[:b] + qsq[:b, None], 0.0)
    return out_d / d, out_i[:b]


def _tilemin_packed_kernel(
    # inputs
    q_ref,  # [B, Da] bf16 augmented queries (whole block, VMEM-resident)
    g_ref,  # [TG, Da] bf16 augmented gallery tile (streamed)
    # outputs (row j%8 of the revisited 8-row block = this tile's min)
    out_ref,  # [8, B] int32 packed (quantized distance | row-in-tile)
    *,
    tile_g: int,
):
    """Measured-bottleneck rewrite of ``_tilemin_kernel`` (profile_match on
    v5e, 1M x 128, B=1024: 8.7 ms/batch, ~27x over the HBM bound — the
    subtract/min/eq/where/min epilogue over [B, TG] per tile is VPU issue-
    bound, the D=128 MXU dot is ~5% of it). Three changes:

    1. ZERO elementwise distance math: the augmented columns (see
       ``pack_gallery_aug``) make the MXU emit the full
       ``|q|^2 + |g|^2 - 2 q.g`` directly.
    2. Transposed [TG, B] output: the tile reduce runs along SUBLANES
       (a chain of whole-vreg ``min`` ops, ~1/8 instruction per element)
       instead of lanes (per-row shuffle trees, twice).
    3. ONE reduce for value+index: distances are >= 0 so their f32 bit
       patterns order as int32; mask the low log2(TG) mantissa bits, OR in
       a row iota, and a single ``min`` carries the argmin for free. The
       masking quantizes the carried distance to ~2^-13 relative — far
       inside the bf16 operand rounding the scan already accepts, and the
       caller's full-precision rescore absorbs both. (Rounding can push a
       true ~0 distance slightly negative; its bit pattern then has the
       sign bit set and sorts below every positive key — i.e. the
       nearest row still wins, exactly as wanted.)
    """
    j = pl.program_id(0)
    cross = jax.lax.dot_general(
        g_ref[:],
        q_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [TG, B] = full squared L2 (augmented columns)
    bits = jax.lax.bitcast_convert_type(cross, jnp.int32)
    rows = jax.lax.broadcasted_iota(jnp.int32, bits.shape, 0)
    key = (bits & ~(tile_g - 1)) | rows
    out_ref[j % 8, :] = jnp.min(key, axis=0)


def _tilemin2_packed_kernel(
    # inputs
    q_ref,  # [B, Da] bf16 augmented queries (whole block, VMEM-resident)
    g_ref,  # [TG, Da] bf16 augmented gallery tile (streamed)
    # outputs (row j%8 of the revisited 8-row block = this tile's values)
    out1_ref,  # [8, B] int32 packed min key
    out2_ref,  # [8, B] int32 packed SECOND-min key
    *,
    tile_g: int,
):
    """``_tilemin_packed_kernel`` + the tile's second-smallest key.

    The second min is what makes the candidate set CERTIFIABLE: for a
    tile whose argmin row was rescored exactly, every *unscored* row of
    that tile has PCA-space distance >= m2, and orthogonal projection
    only shrinks distances, so m2 lower-bounds the true full-D distance
    of everything the rescore did not look at (see
    ``topk_candidates_l2_packed_cert``). Keys are unique per tile (the
    low bits carry the row iota), so one eq+select+min extracts m2
    exactly — the only epilogue cost over the single-reduce kernel."""
    j = pl.program_id(0)
    cross = jax.lax.dot_general(
        g_ref[:],
        q_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [TG, B] = full squared L2 (augmented columns)
    bits = jax.lax.bitcast_convert_type(cross, jnp.int32)
    rows = jax.lax.broadcasted_iota(jnp.int32, bits.shape, 0)
    key = (bits & ~(tile_g - 1)) | rows
    m1 = jnp.min(key, axis=0)
    out1_ref[j % 8, :] = m1
    key2 = jnp.where(key == m1[None, :], _INT_BIG, key)
    out2_ref[j % 8, :] = jnp.min(key2, axis=0)


@functools.partial(jax.jit, static_argnames=("d", "tile_g", "interpret"))
def _tilemin2_packed_block(
    queries_aug: jax.Array,  # [Bp, Da] bf16
    gallery_aug: jax.Array,  # [Np, Da] bf16
    d: int,
    tile_g: int,
    interpret: bool,
):
    bp, da = queries_aug.shape
    np_, _ = gallery_aug.shape
    n_tiles = np_ // tile_g
    n_rows = _round_up(n_tiles, 8)
    out1, out2 = pl.pallas_call(
        functools.partial(_tilemin2_packed_kernel, tile_g=tile_g),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((bp, da), lambda j: (0, 0)),
            pl.BlockSpec((tile_g, da), lambda j: (j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((8, bp), lambda j: (j // 8, 0)),
            pl.BlockSpec((8, bp), lambda j: (j // 8, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_rows, bp), jnp.int32),
            jax.ShapeDtypeStruct((n_rows, bp), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * np_ * da,
            bytes_accessed=int(np_ * da * 2),
            transcendentals=0,
        ),
        interpret=interpret,
    )(queries_aug, gallery_aug)
    return out1[:n_tiles], out2[:n_tiles]


def _augment_queries(queries: jax.Array, d: int, da: int) -> jax.Array:
    """Query-side ``[-2q, 1, 1, |q|^2_hi, |q|^2_lo]`` layout matching
    ``pack_gallery_aug`` (shared by the packed scans)."""
    b, dq = queries.shape
    assert dq == d and d + 4 <= da, (dq, d, da)
    qf = jnp.asarray(queries, jnp.float32)
    qsq = jnp.einsum("bd,bd->b", qf, qf, preferred_element_type=jnp.float32)
    qhi = qsq.astype(jnp.bfloat16)
    qlo = (qsq - qhi.astype(jnp.float32)).astype(jnp.bfloat16)
    qa = jnp.zeros((b, da), jnp.bfloat16)
    qa = qa.at[:, :d].set((-2.0 * qf).astype(jnp.bfloat16))
    qa = qa.at[:, d].set(jnp.bfloat16(1))
    qa = qa.at[:, d + 1].set(jnp.bfloat16(1))
    qa = qa.at[:, d + 2].set(qhi)
    qa = qa.at[:, d + 3].set(qlo)
    return qa


def tile_min2_l2_packed(
    queries: jax.Array,  # [B, D] fp32/bf16 (raw, NOT augmented)
    gallery_aug: jax.Array,  # pack_gallery_aug(...) output
    d: int,
    *,
    tile_g: int = 1024,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """``tile_min_l2_packed`` + per-tile second-min distance:
    (d1 [B, n_tiles] RAW squared L2, index [B, n_tiles], d2 [B, n_tiles]
    raw squared L2). Distances are NOT divided by ``d`` (certificate
    callers compare them against raw rescored squared distances) and are
    quantized toward zero by ~2^-13 relative (conservative for a lower
    bound)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b = queries.shape[0]
    da = gallery_aug.shape[1]
    qa = _augment_queries(queries, d, da)
    bp = _round_up(max(b, 128), 128)
    if bp != b:
        qa = jnp.pad(qa, ((0, bp - b), (0, 0)))
    o1, o2 = [], []
    for s in range(0, bp, MAX_QUERY_BLOCK):
        k1, k2 = _tilemin2_packed_block(
            qa[s : s + MAX_QUERY_BLOCK], gallery_aug, d, tile_g, interpret
        )
        o1.append(k1.T)
        o2.append(k2.T)
    k1 = jnp.concatenate(o1, axis=0)[:b] if len(o1) > 1 else o1[0][:b]
    k2 = jnp.concatenate(o2, axis=0)[:b] if len(o2) > 1 else o2[0][:b]
    idx_in_tile = k1 & (tile_g - 1)
    n_tiles = k1.shape[1]
    out_i = jnp.arange(n_tiles, dtype=jnp.int32)[None, :] * tile_g + idx_in_tile
    d1 = jnp.maximum(
        jax.lax.bitcast_convert_type(k1 & ~(tile_g - 1), jnp.float32), 0.0
    )
    # a single-valid-row tile's m2 is the _INT_BIG sentinel -> huge float
    d2 = jnp.maximum(
        jax.lax.bitcast_convert_type(k2 & ~(tile_g - 1), jnp.float32), 0.0
    )
    return d1, out_i, d2


def topk_candidates_l2_packed_cert(
    queries: jax.Array,
    gallery_aug: jax.Array,  # pack_gallery_aug(...) output
    d: int,
    r: int,
    *,
    tile_g: int = 1024,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Certified candidate generation: (cand [B, R], bound [B]).

    ``bound`` is a LOWER bound (up to bf16 operand rounding + the 2^-13
    key quantization, both of which the caller's slack must cover) on the
    true full-D squared L2 distance of every gallery row the candidate
    set does NOT contain:

    - rows in UNSELECTED tiles: their tile's PCA min >= the (R+1)-th
      smallest tile min (exact top-k selection), and projection onto the
      PCA subspace only shrinks distances, so d_full >= d_pca >= that;
    - unscored rows in SELECTED tiles (the within-tile miss class the
      plain candidate set cannot see): everything but the argmin has
      d_pca >= the tile's second-min m2.

    If the exact rescored best distance d1 satisfies d1 < bound - slack,
    the 1-NN answer is PROVABLY exact; otherwise the caller escalates
    (serving.RecognitionService runs the full-D scan on such batches).
    Exact tile selection only — approx_min_k voids the unselected-tile
    half of the bound."""
    d1t, it, d2t = tile_min2_l2_packed(
        queries, gallery_aug, d, tile_g=tile_g, interpret=interpret
    )
    n_tiles = d1t.shape[1]
    r = min(r, n_tiles)
    k = min(r + 1, n_tiles)
    neg, tile_sel = jax.lax.top_k(-d1t, k)
    cand = jnp.take_along_axis(it, tile_sel[:, :r], axis=1)
    if k > r:
        unsel = -neg[:, -1]  # (r+1)-th smallest tile min
    else:  # every tile selected: no unselected class
        unsel = jnp.full((d1t.shape[0],), BIG_DIST, jnp.float32)
    sel_m2 = jnp.min(
        jnp.take_along_axis(d2t, tile_sel[:, :r], axis=1), axis=1
    )
    return cand, jnp.minimum(unsel, sel_m2)


def pack_gallery_aug(
    gallery: jax.Array,
    n_valid: Optional[int] = None,
    tile_g: int = 1024,
) -> jax.Array:
    """Augmented bf16 gallery for ``tile_min_l2_packed``: columns
    ``[g, |g|^2_hi, |g|^2_lo, 1, 1]`` padded to a 128-lane multiple, rows
    padded to ``tile_g`` with |g|^2 = 1e38 (finite in bf16 — BIG_DIST
    rounds to inf and the hi/lo split would produce inf + -inf = NaN).
    The hi/lo bf16 split carries the norm at ~2^-17 relative; with the
    query-side ``[-2q, 1, 1, |q|^2_hi, |q|^2_lo]`` layout the MXU dot
    emits the complete squared distance. Build once per gallery."""
    big = 1e38
    n = n_valid if n_valid is not None else gallery.shape[0]
    gallery = pad_gallery(gallery, tile_g).astype(jnp.bfloat16)
    np_, d = gallery.shape
    gsq = jnp.einsum(
        "nd,nd->n", gallery, gallery, preferred_element_type=jnp.float32
    )
    gsq = jnp.where(jnp.arange(np_) < n, gsq, big)
    hi = gsq.astype(jnp.bfloat16)
    lo = (gsq - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    da = _round_up(d + 4, 128)
    aug = jnp.zeros((np_, da), jnp.bfloat16)
    aug = aug.at[:, :d].set(gallery)
    aug = aug.at[:, d].set(hi)
    aug = aug.at[:, d + 1].set(lo)
    aug = aug.at[:, d + 2].set(jnp.bfloat16(1))
    aug = aug.at[:, d + 3].set(jnp.bfloat16(1))
    return aug


@functools.partial(jax.jit, static_argnames=("d", "tile_g", "interpret"))
def _tilemin_packed_block(
    queries_aug: jax.Array,  # [Bp, Da] bf16
    gallery_aug: jax.Array,  # [Np, Da] bf16
    d: int,
    tile_g: int,
    interpret: bool,
):
    bp, da = queries_aug.shape
    np_, _ = gallery_aug.shape
    n_tiles = np_ // tile_g
    n_rows = _round_up(n_tiles, 8)
    out = pl.pallas_call(
        functools.partial(_tilemin_packed_kernel, tile_g=tile_g),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((bp, da), lambda j: (0, 0)),
            pl.BlockSpec((tile_g, da), lambda j: (j, 0)),
        ],
        out_specs=pl.BlockSpec((8, bp), lambda j: (j // 8, 0)),
        out_shape=jax.ShapeDtypeStruct((n_rows, bp), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * np_ * da,
            bytes_accessed=int(np_ * da * 2),
            transcendentals=0,
        ),
        interpret=interpret,
    )(queries_aug, gallery_aug)
    return out[:n_tiles]


def tile_min_l2_packed(
    queries: jax.Array,  # [B, D] fp32/bf16 (raw, NOT augmented)
    gallery_aug: jax.Array,  # pack_gallery_aug(...) output
    d: int,  # original feature dim (gallery_aug is [Np, >=d+4])
    *,
    tile_g: int = 1024,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    """``tile_min_l2`` via the packed single-reduce kernel (see
    ``_tilemin_packed_kernel``): (dist [B, n_tiles] window means, index
    [B, n_tiles]). Returned distances are quantized to ~2^-13 relative
    (tile SELECTION fidelity; candidates get rescored exactly anyway)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b = queries.shape[0]
    da = gallery_aug.shape[1]
    qa = _augment_queries(queries, d, da)
    bp = _round_up(max(b, 128), 128)
    if bp != b:
        qa = jnp.pad(qa, ((0, bp - b), (0, 0)))
    outs = []
    for s in range(0, bp, MAX_QUERY_BLOCK):
        keys = _tilemin_packed_block(
            qa[s : s + MAX_QUERY_BLOCK], gallery_aug, d, tile_g, interpret
        )
        outs.append(keys.T)  # [chunk, n_tiles]
    keys = jnp.concatenate(outs, axis=0)[:b] if len(outs) > 1 else outs[0][:b]
    idx_in_tile = keys & (tile_g - 1)
    n_tiles = keys.shape[1]
    out_i = jnp.arange(n_tiles, dtype=jnp.int32)[None, :] * tile_g + idx_in_tile
    vals = jax.lax.bitcast_convert_type(keys & ~(tile_g - 1), jnp.float32)
    return jnp.maximum(vals, 0.0) / d, out_i


def _tilemin_quant_kernel(
    # inputs
    q_ref,  # [B, D] int8 (whole padded query block, VMEM-resident)
    qs_ref,  # [B, 1] fp32 per-query dequant scales
    g_ref,  # [TG, D] int8 (streamed gallery tile)
    gsq_ref,  # [8, TG] row j%8 = TRUE |g|^2 of this tile (BIG on pads)
    gsc_ref,  # [8, TG] row j%8 = per-row dequant scales (0 on pads)
    # outputs (row j%8 of the revisited 8-row block = this tile's min)
    out_d_ref,  # [8, B]
    out_i_ref,  # [8, B]
    *,
    tile_g: int,
    compute: str,
):
    """Int8 variant of ``_tilemin_kernel``: the gallery streams from HBM at
    1 byte/element (half the bf16 stream) and the cross term runs on the
    MXU's int8 path (2x the bf16 rate on v5e) when ``compute='int8'``;
    ``compute='bf16'`` upcasts in VMEM instead (halved HBM stream only —
    the measured fallback if Mosaic's int8 contraction underperforms).
    The distance uses the TRUE ``|g|^2`` (precomputed before quantization),
    so the only approximation is int8 rounding of the cross term —
    downstream exact rescoring of the candidate rows absorbs it."""
    j = pl.program_id(0)
    if compute == "int8":
        cross = jax.lax.dot_general(
            q_ref[:],
            g_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)  # [B, TG]
    else:
        cross = jax.lax.dot_general(
            q_ref[:].astype(jnp.bfloat16),
            g_ref[:].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    tile_d = gsq_ref[j % 8, :][None, :] - (2.0 * qs_ref[:]) * (
        cross * gsc_ref[j % 8, :][None, :]
    )
    m, a = _masked_argmin(tile_d)
    out_d_ref[j % 8, :] = m
    out_i_ref[j % 8, :] = j * tile_g + a


@functools.partial(jax.jit, static_argnames=("tile_g", "interpret", "compute"))
def _tilemin_quant_block(
    queries: jax.Array,  # [Bp, D] int8
    qscales: jax.Array,  # [Bp, 1] fp32
    gallery: jax.Array,  # [Np, D] int8 (padded to tile_g)
    gsq_rows: jax.Array,  # [n_rows8, TG] fp32 TRUE |g|^2 (BIG on pads)
    gsc_rows: jax.Array,  # [n_rows8, TG] fp32 row scales (0 on pads)
    tile_g: int,
    interpret: bool,
    compute: str,
):
    bp, d = queries.shape
    np_, _ = gallery.shape
    n_tiles = np_ // tile_g
    n_rows = _round_up(n_tiles, 8)
    kernel = functools.partial(
        _tilemin_quant_kernel, tile_g=tile_g, compute=compute
    )
    out_d, out_i = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((bp, d), lambda j: (0, 0)),
            pl.BlockSpec((bp, 1), lambda j: (0, 0)),
            pl.BlockSpec((tile_g, d), lambda j: (j, 0)),
            pl.BlockSpec((8, tile_g), lambda j: (j // 8, 0)),
            pl.BlockSpec((8, tile_g), lambda j: (j // 8, 0)),
        ],
        out_specs=[
            pl.BlockSpec((8, bp), lambda j: (j // 8, 0)),
            pl.BlockSpec((8, bp), lambda j: (j // 8, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_rows, bp), jnp.float32),
            jax.ShapeDtypeStruct((n_rows, bp), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * np_ * d,
            bytes_accessed=int(np_ * d),
            transcendentals=0,
        ),
        interpret=interpret,
    )(queries, qscales, gallery, gsq_rows, gsc_rows)
    return out_d[:n_tiles], out_i[:n_tiles]


def quant_gallery_scales(
    scales: jax.Array, n_valid: int, tile_g: int = 1024
) -> jax.Array:
    """Lay per-row dequant scales out like ``gallery_sq_norms`` does
    ([roundup(n_tiles, 8), tile_g] fp32, 0 beyond n_valid/pads)."""
    n = scales.shape[0]
    np_ = _round_up(max(n, tile_g), tile_g)
    s = jnp.pad(scales.astype(jnp.float32), (0, np_ - n))
    s = jnp.where(jnp.arange(np_) < n_valid, s, 0.0)
    n_tiles = np_ // tile_g
    n_rows = _round_up(n_tiles, 8)
    s = s.reshape(n_tiles, tile_g)
    if n_rows != n_tiles:
        s = jnp.pad(s, ((0, n_rows - n_tiles), (0, 0)))
    return s


def tile_min_l2_quant(
    queries: jax.Array,  # [B, D] fp32/bf16 (quantized per-row here)
    gallery_q: jax.Array,  # [Np, D] int8, pad_gallery-padded
    gsq_rows: jax.Array,  # gallery_sq_norms(...) of the ORIGINAL gallery
    gsc_rows: jax.Array,  # quant_gallery_scales(...)
    *,
    tile_g: int = 1024,
    interpret: Optional[bool] = None,
    compute: str = "int8",
) -> Tuple[jax.Array, jax.Array]:
    """Per-gallery-tile approximate L2 min over an int8 gallery:
    (dist [B, n_tiles], index [B, n_tiles]). See ``tile_min_l2``; this
    variant halves the HBM stream and (compute='int8') doubles the MXU
    rate, at int8-rounding distance error in the cross term."""
    from fast_image_recognition_tpu.ops.quant import quantize_rows

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, d = queries.shape
    qf = jnp.asarray(queries, jnp.float32)
    qsq = jnp.einsum("bd,bd->b", qf, qf, preferred_element_type=jnp.float32)
    q_i8, qs = quantize_rows(qf)
    bp = _round_up(max(b, 128), 128)
    if bp != b:
        q_i8 = jnp.pad(q_i8, ((0, bp - b), (0, 0)))
        qs = jnp.pad(qs, (0, bp - b))
    outs_d = []
    outs_i = []
    for s in range(0, bp, MAX_QUERY_BLOCK):
        od, oi = _tilemin_quant_block(
            q_i8[s : s + MAX_QUERY_BLOCK],
            qs[s : s + MAX_QUERY_BLOCK, None],
            gallery_q,
            gsq_rows,
            gsc_rows,
            tile_g,
            interpret,
            compute,
        )
        outs_d.append(od.T)
        outs_i.append(oi.T)
    out_d = jnp.concatenate(outs_d, axis=0) if len(outs_d) > 1 else outs_d[0]
    out_i = jnp.concatenate(outs_i, axis=0) if len(outs_i) > 1 else outs_i[0]
    out_d = jnp.maximum(out_d[:b] + qsq[:b, None], 0.0)
    return out_d / d, out_i[:b]


def topk_l2_quant(
    queries: jax.Array,  # [B, D] fp32/bf16
    gallery_q: jax.Array,  # [Np, D] int8 (pad_gallery-padded)
    gsq_rows: jax.Array,
    gsc_rows: jax.Array,
    rescore_gallery: jax.Array,  # [>=N, D] bf16/fp32 exact rows
    k: int = 1,
    *,
    r: int = 16,
    tile_g: int = 1024,
    interpret: Optional[bool] = None,
    compute: str = "int8",
) -> Tuple[jax.Array, jax.Array]:
    """Exact-rescored top-k over an int8-scanned gallery.

    The int8 tile-min proposes the best row of each of the ``r`` best
    tiles (contains the true 1-NN up to int8 rounding near-ties); the
    ``r`` candidate rows are then gathered from ``rescore_gallery`` and
    rescored exactly. Returns (window-mean distances [B, k], indices
    [B, k]) like ``topk_l2``. Candidates are one-per-tile, so effective
    k is capped at min(k, r, N/tile_g) — immaterial at production scale
    (a 1M gallery has 1024 tiles) but it binds on toy galleries."""
    d_t, i_t = tile_min_l2_quant(
        queries,
        gallery_q,
        gsq_rows,
        gsc_rows,
        tile_g=tile_g,
        interpret=interpret,
        compute=compute,
    )
    r = min(r, d_t.shape[1])
    _, tile_sel = jax.lax.top_k(-d_t, r)
    cand = jnp.take_along_axis(i_t, tile_sel, axis=1)  # [B, R]
    rows = jnp.take(rescore_gallery, cand, axis=0)  # [B, R, D]
    qf = jnp.asarray(queries).astype(rows.dtype)
    cross = jnp.einsum(
        "bd,brd->br", qf, rows, preferred_element_type=jnp.float32
    )
    rsq = jnp.einsum(
        "brd,brd->br", rows, rows, preferred_element_type=jnp.float32
    )
    qsq = jnp.einsum(
        "bd,bd->b",
        qf.astype(jnp.float32),
        qf.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    dist = jnp.maximum(qsq[:, None] + rsq - 2.0 * cross, 0.0)
    k_eff = min(k, r)
    neg_d, sel = jax.lax.top_k(-dist, k_eff)
    idx = jnp.take_along_axis(cand, sel, axis=1)
    dim = queries.shape[1]
    return -neg_d / dim, idx


def _select_tiles(d: jax.Array, r: int, select: str) -> jax.Array:
    """[B, n_tiles] tile-min distances -> [B, R] chosen tile columns.

    ``select='approx'`` uses ``lax.approx_min_k`` (TPU PartialReduce op) —
    the DEM path's measured lesson applies here too: XLA's exact top-k
    lowers to a per-row sort that can rival the whole O(N*D) scan at
    [1024, 1024]. recall_target=0.99 is per-element of the top-R; the
    1-NN's own tile ranks #1 by a wide margin on recognition workloads,
    so candidate-set misses land on the far tail of the R candidates
    (the e2e bench audits agreement vs the fp32 scan either way)."""
    if select == "approx":
        _, tile_sel = jax.lax.approx_min_k(d, r, recall_target=0.99)
        return tile_sel
    _, tile_sel = jax.lax.top_k(-d, r)
    return tile_sel


def topk_candidates_l2(
    queries: jax.Array,
    gallery: jax.Array,
    r: int,
    *,
    n_valid: Optional[int] = None,
    tile_g: int = 1024,
    interpret: Optional[bool] = None,
    gsq: Optional[jax.Array] = None,
    precise_scores: bool = True,
    select: str = "exact",
) -> jax.Array:
    """Top-R candidate row indices [B, R] via the tile-min hierarchy:
    the best row of each of the R best tiles. Contains the exact 1-NN up
    to bf16 operand rounding (see ``tile_min_l2``'s precision contract —
    callers are expected to rescore the R rows in a higher-fidelity
    space); the other R-1 rows are near-NN candidates from distinct
    gallery tiles. O(N*D) MXU work + O(B * N/tile_g) top-k — candidate
    count R is free. ``select`` picks the tile-selection op (see
    ``_select_tiles``)."""
    d, i = tile_min_l2(
        queries,
        gallery,
        n_valid=n_valid,
        tile_g=tile_g,
        interpret=interpret,
        gsq=gsq,
        precise_scores=precise_scores,
    )
    r = min(r, d.shape[1])
    tile_sel = _select_tiles(d, r, select)  # [B, R] tile ids
    return jnp.take_along_axis(i, tile_sel, axis=1)


def topk_candidates_l2_packed(
    queries: jax.Array,
    gallery_aug: jax.Array,  # pack_gallery_aug(...) output
    d: int,
    r: int,
    *,
    tile_g: int = 1024,
    interpret: Optional[bool] = None,
    select: str = "exact",
) -> jax.Array:
    """``topk_candidates_l2`` via the packed single-reduce scan (measured
    1.8x the fp32-scores kernel at 1M x 124, B=1024: 4.06 vs 7.40 ms).
    Candidate containment holds up to bf16 operand rounding + the 2^-13
    packed-key quantization — absorbed by the caller's exact rescore."""
    dt, it = tile_min_l2_packed(
        queries, gallery_aug, d, tile_g=tile_g, interpret=interpret
    )
    r = min(r, dt.shape[1])
    tile_sel = _select_tiles(dt, r, select)
    return jnp.take_along_axis(it, tile_sel, axis=1)


def topk_candidates_l2_quant(
    queries: jax.Array,
    gallery_q: jax.Array,
    gsq_rows: jax.Array,
    gsc_rows: jax.Array,
    r: int,
    *,
    tile_g: int = 1024,
    interpret: Optional[bool] = None,
    compute: str = "int8",
    select: str = "exact",
) -> jax.Array:
    """``topk_candidates_l2`` over an int8-quantized gallery: half the HBM
    stream and 2x the MXU rate in the scan; candidate containment holds up
    to int8 rounding near-ties, absorbed by the caller's exact rescore."""
    d, i = tile_min_l2_quant(
        queries,
        gallery_q,
        gsq_rows,
        gsc_rows,
        tile_g=tile_g,
        interpret=interpret,
        compute=compute,
    )
    r = min(r, d.shape[1])
    tile_sel = _select_tiles(d, r, select)
    return jnp.take_along_axis(i, tile_sel, axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("k", "tile_g", "interpret", "window", "precise"),
)
def _topk_l2_block(
    queries: jax.Array,  # [Bp, D] (Bp <= MAX_QUERY_BLOCK, multiple of 8)
    gallery: jax.Array,  # [Np, D] (padded to tile_g)
    n_valid: jax.Array,  # [1] int32
    k: int,
    tile_g: int,
    interpret: bool,
    window: Optional[Tuple[int, int]],
    precise: bool,
):
    bp, d = queries.shape
    np_, _ = gallery.shape
    grid = (np_ // tile_g,)
    windowed = window is not None
    win = jnp.asarray(window if windowed else (0, d), dtype=jnp.int32)

    kernel = functools.partial(
        _topk_kernel, k=k, tile_g=tile_g, windowed=windowed, precise=precise
    )
    out_d, out_i = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((bp, d), lambda j, *_: (0, 0)),
                pl.BlockSpec((tile_g, d), lambda j, *_: (j, 0)),
            ],
            out_specs=[
                pl.BlockSpec((bp, k), lambda j, *_: (0, 0)),
                pl.BlockSpec((bp, k), lambda j, *_: (0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((bp, k), jnp.float32),
                pltpu.VMEM((bp, k), jnp.int32),
                pltpu.VMEM((bp, 1), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bp, k), jnp.float32),
            jax.ShapeDtypeStruct((bp, k), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * np_ * d,
            bytes_accessed=int(np_ * d * gallery.dtype.itemsize),
            transcendentals=0,
        ),
        interpret=interpret,
    )(n_valid, win, queries, gallery)
    return out_d, out_i


def pad_gallery(gallery: jax.Array, tile_g: int = 1024) -> jax.Array:
    """Pad gallery rows to a tile multiple (do this ONCE at build time)."""
    n = gallery.shape[0]
    np_ = _round_up(max(n, tile_g), tile_g)
    if np_ == n:
        return gallery
    return jnp.pad(gallery, ((0, np_ - n), (0, 0)))


def topk_l2(
    queries: jax.Array,
    gallery: jax.Array,
    k: int = 1,
    *,
    n_valid: Optional[int] = None,
    tile_g: int = 1024,
    window: Optional[Tuple[int, int]] = None,
    precise: bool = False,
    interpret: Optional[bool] = None,
    query_block: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Fused L2 top-k over an HBM-resident gallery.

    queries: [B, D]; batches larger than ``query_block`` are chunked so the
    query block always fits VMEM. gallery: [N, D]; pass a ``pad_gallery``-
    padded array plus ``n_valid`` to avoid a per-call pad copy. ``precise``
    keeps full fp32 MXU passes for parity with the scalar reference
    (db_features.cpp:22-42); the default converts fp32 galleries to bf16 to
    run at full MXU rate. Returns (distances [B, k] window means, indices
    [B, k]) — distances are normalized by the window length
    (db_features.cpp:40).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if query_block is None:
        # fp32 HIGHEST-precision passes need larger MXU scratch; halve the
        # VMEM-resident query block to stay under the scoped-vmem limit.
        # Larger k also shrinks the block: the iterative argmin extraction in
        # _merge_topk keeps ~k live [B, TG] temporaries on the kernel stack
        # (measured: B=1024, TG=1024, k=12 wants 19.2M > the 16M scoped
        # limit), so halve once at k>4 and again at k>12.
        query_block = 256 if precise else MAX_QUERY_BLOCK
        if k > 12:
            query_block = min(query_block, 256)
        elif k > 4:
            query_block = min(query_block, 512)
    b, d = queries.shape
    if k > 4:
        # Larger k needs a smaller gallery tile too: the halved query block
        # alone still blew scoped VMEM at wide D (measured on v5e: B=512,
        # TG=1024, D=1536, k=12 bf16 -> 16.46M vs the 16M limit). Halving
        # the tile halves both the double-buffered gallery DMA and the ~k
        # live [B, TG] merge temporaries; 512-row tiles still divide every
        # `pad_gallery`-padded (1024-multiple) gallery.
        tile_g = min(tile_g, 512)
    n = n_valid if n_valid is not None else gallery.shape[0]

    if precise:
        # fp32 doubles both the double-buffered gallery tile (2*tile*d*4 B)
        # and the query block; at D>=1280 the default 1024-row tile blows
        # the 16 MB scoped-vmem limit. Cap the tile so the double-buffered
        # fp32 tile stays under ~9 MB (power of two, >=128; a 1024-padded
        # gallery is still a multiple of every smaller power of two).
        cap = max(128, int(9e6) // (8 * d))
        t = 128
        while t * 2 <= min(cap, tile_g):
            t *= 2
        tile_g = t

    gallery = pad_gallery(gallery, tile_g)
    if not precise and gallery.dtype == jnp.float32:
        gallery = gallery.astype(jnp.bfloat16)
    # precise keeps fp32 queries even over a bf16-stored gallery (the kernel
    # upcasts gallery tiles in VMEM); otherwise match the storage dtype.
    queries = jnp.asarray(queries).astype(
        jnp.float32 if precise else gallery.dtype
    )
    nv = jnp.asarray([n], dtype=jnp.int32)

    outs_d = []
    outs_i = []
    for s in range(0, b, query_block):
        chunk = queries[s : s + query_block]
        bc = chunk.shape[0]
        bp = _round_up(max(bc, 8), 8)
        if bp != bc:
            chunk = jnp.pad(chunk, ((0, bp - bc), (0, 0)))
        od, oi = _topk_l2_block(
            chunk, gallery, nv, k, tile_g, interpret, window, precise
        )
        outs_d.append(od[:bc])
        outs_i.append(oi[:bc])
    out_d = jnp.concatenate(outs_d, axis=0) if len(outs_d) > 1 else outs_d[0]
    out_i = jnp.concatenate(outs_i, axis=0) if len(outs_i) > 1 else outs_i[0]
    width = (window[1] - window[0]) if window is not None else d
    return out_d / width, out_i
