#!/usr/bin/env python
"""Prototype: early-exit RECOGNITION serving via tap->final-embedding ridge
readouts (design study for serving.CascadeRecognitionService).

Question under test: from an early backbone tap, does an affine readout
(fit on calibration images) predict the final embedding well enough that
the planted-NN match exits early with a confident d1/d2 ratio AND agrees
with the full path? Uses tiny CPU shapes; the production path re-runs this
logic fused at scale.
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import os

os.environ.setdefault("FIR_PLATFORM", "cpu")


def grid_pool(h, g: int):
    """[B, H, W, C] -> [B, g*g*C] adaptive mean pooling."""
    import jax.numpy as jnp

    b, hh, ww, c = h.shape
    gh = min(g, hh)
    gw = min(g, ww)
    # truncate to a multiple (tiny edge loss is fine for a readout)
    h = h[:, : (hh // gh) * gh, : (ww // gw) * gw, :]
    h = h.reshape(b, gh, hh // gh, gw, ww // gw, c)
    return jnp.mean(
        h.astype(jnp.float32), axis=(2, 4)
    ).reshape(b, gh * gw * c)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--resolution", type=int, default=64)
    ap.add_argument("--calib", type=int, default=2048)
    ap.add_argument("--probes", type=int, default=512)
    ap.add_argument("--gallery", type=int, default=8192)
    ap.add_argument("--noise", type=float, default=0.2)
    ap.add_argument("--grid", type=int, default=2)
    ap.add_argument("--ridge", type=float, default=1e-3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from fast_image_recognition_tpu.models import backbone_info, create_backbone
    from fast_image_recognition_tpu.models.efficientnet import default_taps
    from fast_image_recognition_tpu.models.inference import (
        _block,
        fold_backbone,
        fold_preprocess_into_stem,
        folded_head,
        folded_stem_pp,
    )

    info = backbone_info("b0")
    res = args.resolution
    model, variables = create_backbone("b0", 0, resolution=res)
    folded, configs = fold_backbone(model, variables)
    folded = fold_preprocess_into_stem(folded, res)
    taps = default_taps("b0", "early")[:2]  # stage-3 and stage-4 exits
    tapset = set(taps)
    print("taps:", taps)

    def fwd(f, x):
        h = folded_stem_pp(f, x)
        tap_feats = []
        for p, cfg in zip(f["blocks"], configs):
            h = _block(h, p, cfg)
            if cfg["name"] in tapset:
                tap_feats.append(grid_pool(h, args.grid))
        emb = folded_head(f, h)
        return tap_feats, emb

    fwd_j = jax.jit(fwd)
    rng = np.random.default_rng(0)

    def run(n):
        feats = None
        embs = []
        B = 256
        for i in range(0, n, B):
            imgs = jnp.asarray(
                rng.integers(0, 255, (min(B, n - i), res, res, 3), np.int64)
                .astype(np.uint8)
            )
            tf_, e = fwd_j(folded, imgs)
            if feats is None:
                feats = [[] for _ in tf_]
            for j, t in enumerate(tf_):
                feats[j].append(np.asarray(t, np.float32))
            embs.append(np.asarray(e, np.float32))
        feats = [np.concatenate(f) for f in feats]
        emb = np.concatenate(embs)
        emb = emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-30)
        return feats, emb

    calib_f, calib_e = run(args.calib)
    probe_f, probe_e = run(args.probes)

    def sqdist(a, b):
        # gemm-form pairwise squared distances (broadcast form would
        # materialize [Na, Nb, D])
        return np.maximum(
            (a * a).sum(1)[:, None]
            + (b * b).sum(1)[None, :]
            - 2.0 * (a @ b.T),
            0.0,
        )

    # planted gallery: perturbed probe embeddings + same-distribution rows
    d2 = sqdist(probe_e, probe_e)
    np.fill_diagonal(d2, np.inf)
    margin = np.sqrt(d2.min(1))
    noise = rng.standard_normal(probe_e.shape).astype(np.float32)
    noise /= np.linalg.norm(noise, axis=1, keepdims=True)
    planted = probe_e + noise * (args.noise * margin)[:, None]
    planted /= np.linalg.norm(planted, axis=1, keepdims=True)
    others = calib_e[
        rng.integers(0, len(calib_e), args.gallery - len(planted))
    ] + 0.05 * rng.standard_normal(
        (args.gallery - len(planted), probe_e.shape[1])
    ).astype(np.float32)
    others /= np.linalg.norm(others, axis=1, keepdims=True)
    gal = np.concatenate([planted, others])
    true_idx = np.arange(len(planted))

    # full-path NN (the answer to agree with)
    d_full = sqdist(probe_e, gal)
    nn_full = d_full.argmin(1)
    print("full-path error vs planted:", float((nn_full != true_idx).mean()))

    for lvl, (cf, pf) in enumerate(zip(calib_f, probe_f)):
        # ridge affine fit cf -> calib_e
        X = np.concatenate([cf, np.ones((len(cf), 1), np.float32)], 1)
        XtX = X.T @ X + args.ridge * len(cf) * np.eye(X.shape[1], dtype=np.float32)
        A = np.linalg.solve(XtX, X.T @ calib_e)
        Xp = np.concatenate([pf, np.ones((len(pf), 1), np.float32)], 1)
        pred = Xp @ A
        cos = (pred * probe_e).sum(1) / np.maximum(
            np.linalg.norm(pred, axis=1), 1e-30
        )
        # exactly what production does: the predicted embedding is the
        # query for BOTH the candidate scan and the full-D rescore
        d = sqdist(pred, gal)
        srt = np.sort(d, axis=1)
        nn = d.argmin(1)
        ratio = np.sqrt(srt[:, 0] / np.maximum(srt[:, 1], 1e-30))
        agree = nn == nn_full
        print(
            f"level {lvl} ({taps[lvl]}, F={cf.shape[1]}): "
            f"readout cos={cos.mean():.3f}  "
            f"nn-agree={agree.mean():.3f}"
        )
        for tau in (0.5, 0.6, 0.7, 0.8, 0.9):
            fire = ratio < tau
            n = int(fire.sum())
            acc = float(agree[fire].mean()) if n else float("nan")
            print(
                f"   tau={tau:.1f}: exit={n / len(ratio):5.1%}  "
                f"agree-among-exits={acc:.4f}"
            )


if __name__ == "__main__":
    main()
