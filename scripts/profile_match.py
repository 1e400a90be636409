#!/usr/bin/env python
"""On-chip breakdown of the e2e serving step's match stage: the candidate
scan, the tile-selection op, and the gather-rescore, per precision variant.

The e2e gap analysis for round 3: plain forward ~19.1k img/s vs e2e
~18.5k — the ~2 ms/batch match stage is the remaining headroom
(VERDICT.md round-2 item 4). This script times each candidate variant of
the PCA-candidates+rescore match in isolation on the real chip so the
serving default is chosen from measurement, not guesswork.

Every timed function takes its device arrays as jit ARGUMENTS — a
closed-over jax.Array is baked into the lowered module as a constant, and
on the tunneled device the remote-compile request then ships the whole
gallery (2.6 GB at 1M x 1280) over HTTP.

Run: python scripts/profile_match.py [--gallery 1048576] [--batch 1024]
Timing is tunnel-safe (queue N dispatches, one tiny fetch).
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def _time(fn, args, fetch, iters):
    import numpy as np

    out = fn(*args)
    _ = np.asarray(fetch(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = np.asarray(fetch(out))
    return (time.perf_counter() - t0) / iters


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--gallery", type=int, default=1_048_576)
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--dim", type=int, default=1280)
    p.add_argument("--pca-dim", type=int, default=128)
    p.add_argument("--rescore", type=int, default=48)
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from fast_image_recognition_tpu.ops.distance_kernel import (
        gallery_sq_norms,
        quant_gallery_scales,
        tile_min_l2,
        tile_min_l2_quant,
        topk_l2,
    )
    from fast_image_recognition_tpu.ops.quant import quantize_rows

    n, d, b = args.gallery, args.dim, args.batch
    pdim, r = args.pca_dim, args.rescore

    # device-built unit-norm gallery + queries = noisy copies of rows 0..b
    @jax.jit
    def build(key):
        kg, kq = jax.random.split(key)
        g = jax.random.normal(kg, (n, d), jnp.bfloat16)
        g = g / jnp.linalg.norm(
            g.astype(jnp.float32), axis=1, keepdims=True
        ).astype(jnp.bfloat16)
        q = g[:b].astype(jnp.float32) + 0.01 * jax.random.normal(
            kq, (b, d), jnp.float32
        )
        q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
        return g, q

    gallery, queries = build(jax.random.PRNGKey(0))
    gallery.block_until_ready()

    # PCA projection fit on a host sample (as serving does)
    from fast_image_recognition_tpu.ops.pca import fit_pca

    sample = np.asarray(gallery[:8192].astype(jnp.float32), np.float32)
    pca = fit_pca(sample, num_components=pdim)
    mu = jnp.asarray(pca.mean, jnp.float32)
    w = jnp.asarray(pca.components.T, jnp.float32)
    gal_pca = jax.jit(
        lambda g, m, ww: ((g - m.astype(jnp.bfloat16)) @ ww.astype(jnp.bfloat16))
        .astype(jnp.bfloat16)
    )(gallery, mu, w)
    gal_sq = jax.jit(
        lambda g: gallery_sq_norms(g, n)
    )(gal_pca)
    qp = jax.jit(lambda q, m, ww: (q - m) @ ww)(queries, mu, w)

    gq, scales = jax.jit(quantize_rows)(gal_pca)
    gsc = jax.jit(lambda s: quant_gallery_scales(s, n))(scales)

    truth = np.arange(b)

    def report(name, fn, arrs, pick):
        jfn = jax.jit(fn)
        sec = _time(jfn, arrs, pick, args.iters)
        idx = np.asarray(pick(jfn(*arrs)))
        err = (
            100.0 * float(np.mean(idx != truth))
            if idx.shape == truth.shape
            else float("nan")
        )
        print(
            f"{name:42s} {sec * 1e3:8.3f} ms/batch "
            f"{b / sec:10.0f} q/s  err={err:.2f}%",
            flush=True,
        )
        return sec

    # 1. full-D exact scan (context: what match='exact' pays)
    report(
        "exact topk_l2 full-D",
        lambda q, g: topk_l2(q, g, k=1, n_valid=n),
        (queries, gallery),
        lambda o: o[1][:, 0],
    )

    # 2-4. the candidate scan per precision (fetch [1] to force completion)
    report(
        "pca scan tile_min fp32-scores",
        lambda q, g, gs: tile_min_l2(q, g, n_valid=n, gsq=gs)[1],
        (qp, gal_pca, gal_sq),
        lambda o: o[0, :1],
    )
    report(
        "pca scan tile_min bf16-scores",
        lambda q, g, gs: tile_min_l2(
            q, g, n_valid=n, gsq=gs, precise_scores=False
        )[1],
        (qp, gal_pca, gal_sq),
        lambda o: o[0, :1],
    )
    report(
        "pca scan tile_min int8",
        lambda q, g, gs, sc: tile_min_l2_quant(q, g, gs, sc)[1],
        (qp, gq, gal_sq, gsc),
        lambda o: o[0, :1],
    )

    # isolate the tile-selection cost: exact lax.top_k vs approx_min_k over
    # the [B, n_tiles] tile-min matrix (DEM's measured lesson: exact top-k
    # was its bottleneck at this shape)
    dd0, _ = jax.jit(
        lambda q, g, gs: tile_min_l2(q, g, n_valid=n, gsq=gs)
    )(qp, gal_pca, gal_sq)
    dd0.block_until_ready()
    report(
        "tile-select exact lax.top_k",
        lambda dd: jax.lax.top_k(-dd, r)[1],
        (dd0,),
        lambda o: o[0, :1],
    )
    report(
        "tile-select approx_min_k",
        lambda dd: jax.lax.approx_min_k(dd, r, recall_target=0.99)[1],
        (dd0,),
        lambda o: o[0, :1],
    )

    # full match (scan + top-R + gather-rescore) per variant
    def match(scan_kind, rr, approx):
        def fn(q, qpj, g, gp, gqj, gs, sc):
            if scan_kind == "int8":
                dd, ii = tile_min_l2_quant(qpj, gqj, gs, sc)
            else:
                dd, ii = tile_min_l2(
                    qpj, gp, n_valid=n, gsq=gs,
                    precise_scores=(scan_kind == "f32"),
                )
            if approx:
                _, tsel = jax.lax.approx_min_k(dd, rr, recall_target=0.99)
            else:
                _, tsel = jax.lax.top_k(-dd, rr)
            cand = jnp.take_along_axis(ii, tsel, axis=1)
            rows = jnp.take(g, cand, axis=0)
            cross = jnp.einsum(
                "bd,brd->br", q.astype(rows.dtype), rows,
                preferred_element_type=jnp.float32,
            )
            rsq = jnp.einsum(
                "brd,brd->br", rows, rows, preferred_element_type=jnp.float32
            )
            best = jnp.argmin(rsq - 2.0 * cross, axis=1)
            return jnp.take_along_axis(cand, best[:, None], 1)[:, 0]

        return fn

    arrs = (queries, qp, gallery, gal_pca, gq, gal_sq, gsc)
    for kind in ("f32", "bf16", "int8"):
        for rr in (r, 16):
            for approx in (False, True):
                report(
                    f"match pca[{kind}]+rescore{rr}"
                    f"{'+approxk' if approx else ''}",
                    match(kind, rr, approx),
                    arrs,
                    lambda o: o,
                )


if __name__ == "__main__":
    main()
