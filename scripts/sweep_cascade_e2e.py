#!/usr/bin/env python
"""Operating-point sweep for the trained early-exit serving cascade on the
headline 1M-gallery e2e workload (VERDICT r4 next-round #1).

Builds the planted 1M gallery ONCE, then for each (taps, grid) candidate:
fits the tap readouts on held-out-class calibration images, reports a
readout-quality diagnostic (median predicted-vs-true embedding distance,
normalized by the match's typical runner-up distance — the quantity the
d1/d2 exit rule actually compares), calibrates survivor fractions across
a ratio list, and — for configs whose level-0 survivors drop below
--promising — times the fused cascade against the plain service on the
same workload and prints error/agreement/exit fractions.

One JSON line per measurement, appended to --out.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import bench  # noqa: E402  (repo-root bench helpers)


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--variant", default="b0")
    parser.add_argument("--resolution", type=int, default=224)
    parser.add_argument("--gallery", type=int, default=1_000_000)
    parser.add_argument("--batch", type=int, default=1024)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument(
        "--configs",
        default="block3a,block4a:2;block3a,block4a:4;block4a,block5a:2;"
        "block4a,block5a:4;block5a:4;block5a,block6c:2;block4a:4",
        help="semicolon list of tap-list:grid candidates",
    )
    parser.add_argument("--ratios", default="0.5,0.6,0.7,0.8")
    parser.add_argument("--promising", type=float, default=0.7,
                        help="time configs whose min survivor frac < this")
    parser.add_argument("--slack", type=float, default=1.3)
    parser.add_argument("--gallery-classes", type=int, default=4096)
    parser.add_argument("--ckpt", default="auto")
    parser.add_argument("--out", default="benchmarks/cascade_e2e_sweep_r5.jsonl")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from fast_image_recognition_tpu.models import backbone_info, create_backbone
    from fast_image_recognition_tpu.models.fold import make_serving_fn
    from fast_image_recognition_tpu.serving import (
        CascadeRecognitionService,
        RecognitionService,
    )

    info = backbone_info(args.variant)
    res = args.resolution
    model, variables = create_backbone(args.variant, 0, resolution=res)
    ckpt = bench._find_ckpt(args, res)
    assert ckpt, "sweep needs a trained checkpoint (cli/train_serving_backbone.py)"
    variables = bench._load_trained(model, variables, ckpt)
    serve, sparams = make_serving_fn(
        model, variables, info, resolution=res, folded=True
    )

    w = bench._trained_recognition_workload(args, res, serve, sparams)
    images, emb0 = w["images"], w["emb0"]
    calib_images = w["calib_probe"]  # enrolled-identity calibration batch
    gallery, labels, truth = w["gallery"], w["labels"], w["truth"]
    calib_fit = bench._synthetic_probe_images(2048, res, seed=5000, per_class=2)
    n = args.gallery
    idx_exact = bench._exact_fp32_nn(emb0, gallery, n)

    records = []

    def emit(rec):
        records.append(rec)
        print(json.dumps(rec), flush=True)

    # plain baseline timed once on the same gallery/workload
    service = RecognitionService(
        model, variables, info, gallery, n_valid=n, resolution=res,
        pca_scan="packed", pca_dim=124, rescore=48,
        serving_fn=(serve, sparams),
    )
    idx_plain = np.asarray(service.identify_device(images))
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = service.identify_device(images)
    _ = np.asarray(out)
    plain_ips = args.batch * args.iters / (time.perf_counter() - t0)
    emit({
        "config": "plain",
        "img_per_s": round(plain_ips, 1),
        "error_pct": round(bench._truth_error_pct(idx_plain, truth), 3),
        "agreement_pct": round(100.0 * float(np.mean(idx_plain == idx_exact)), 3),
    })
    del service

    ratios = [float(r) for r in args.ratios.split(",")]
    for spec in args.configs.split(";"):
        tap_s, grid_s = spec.split(":")
        taps = tap_s.split(",")
        grid = int(grid_s)
        try:
            svc = CascadeRecognitionService(
                model, variables, info, gallery, n_valid=n, resolution=res,
                taps=taps, grid=grid, pca_dim=124, rescore=48,
                calib_images=calib_fit, labels=labels, d2_rule="class",
            )
        except Exception as e:
            emit({"config": spec, "error": str(e)[:200]})
            continue

        # readout-quality diagnostic on the capacity-calibration batch:
        # per tap, the match-space gap between predicted and true final
        # embedding vs the runner-up distance that d2 will supply
        fwd = svc._tap_forward_jit()
        feats, emb_true = fwd(svc._folded, jnp.asarray(calib_images))
        emb_true = np.asarray(emb_true, np.float32)
        diag = []
        for lvl, A in enumerate(svc._readouts):
            pred = np.asarray(feats[lvl], np.float32) @ np.asarray(A[:-1]) + np.asarray(A[-1])
            pred /= np.maximum(np.linalg.norm(pred, axis=1, keepdims=True), 1e-30)
            gap = np.linalg.norm(pred - emb_true, axis=1)
            diag.append(round(float(np.median(gap)), 4))

        surv = {}
        for ratio in ratios:
            svc.ratio = ratio
            fr = svc.calibrate(jnp.asarray(calib_images), slack=args.slack)
            surv[str(ratio)] = [round(f, 4) for f in fr]
        emit({
            "config": spec,
            "taps": taps,
            "grid": grid,
            "readout_gap_median": diag,
            "survivors_by_ratio": surv,
        })

        # time the fused cascade at the best (lowest survivor) ratio if
        # anything actually exits
        best_ratio = min(ratios, key=lambda r: surv[str(r)][0])
        if surv[str(best_ratio)][0] >= args.promising:
            del svc
            continue
        svc.ratio = best_ratio
        svc._fused_fns = {}
        svc.calibrate(jnp.asarray(calib_images), slack=args.slack)
        packed = np.asarray(svc.identify_device(images))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = svc.identify_device(images)
        packed = np.asarray(out)
        sec = (time.perf_counter() - t0) / args.iters
        b = args.batch
        idx_fast = packed[:b].astype(np.int64)
        exit_level = packed[b : 2 * b]
        emit({
            "config": f"fused:{spec}",
            "ratio": best_ratio,
            "img_per_s": round(b / sec, 1),
            "speedup_vs_plain": round(b / sec / plain_ips, 3),
            "error_pct": round(bench._truth_error_pct(idx_fast, truth), 3),
            "agreement_pct": round(
                100.0 * float(np.mean(idx_fast == idx_exact)), 3
            ),
            "exit_fractions": (
                np.bincount(exit_level, minlength=svc.num_levels) / b
            ).round(4).tolist(),
            "capacities": list(svc.capacities_for(b)),
            "forced_fraction": round(float(packed[2 * b]) / b, 4),
        })
        del svc

    if args.out:
        with open(args.out, "a") as f:
            for rec in records:
                f.write(json.dumps(rec) + "\n")
        print(f"appended {len(records)} lines to {args.out}", flush=True)


if __name__ == "__main__":
    main()
