#!/usr/bin/env python
"""Ratio-sweep of the level-gallery early-exit cascade on the headline
1M-gallery recognition workload — one workload build, one service, the
fused program re-built per ratio (the operating CURVE behind the
bench.py headline point; reference discipline: the TWD threshold sweeps
of qt_cpp/ImageTesting.cpp:533-535 / sequential_inference.py:688-722).

Emits one JSON line per point: img/s, speedup vs the plain exact-path
service on the same gallery, label error vs probe identity, label
agreement with the exact path, exit fractions.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import bench  # noqa: E402


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--variant", default="b0")
    parser.add_argument("--resolution", type=int, default=224)
    parser.add_argument("--gallery", type=int, default=1_000_000)
    parser.add_argument("--gallery-classes", type=int, default=4096)
    parser.add_argument("--batch", type=int, default=1024)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--taps", default="block3a,block4a,block5c")
    parser.add_argument("--ratios", default="0.7,0.8,0.85,0.9,0.95")
    parser.add_argument("--slack", type=float, default=1.3)
    parser.add_argument("--ckpt", default="auto")
    parser.add_argument("--out", default="benchmarks/cascade_level_r5.jsonl")
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
    assert ckpt, "needs a trained checkpoint"
    variables = bench._load_trained(model, variables, ckpt)
    serve, sparams = make_serving_fn(
        model, variables, info, resolution=res, folded=True
    )
    taps = args.taps.split(",")
    w = bench._trained_recognition_workload(
        args, res, serve, sparams, taps=taps, model=model,
        variables=variables,
    )
    images, emb0 = w["images"], w["emb0"]
    gallery, labels, truth = w["gallery"], w["labels"], w["truth"]
    n = args.gallery
    idx_exact = bench._exact_fp32_nn(emb0, gallery, n)
    lab_exact = labels[idx_exact]

    records = []

    def emit(rec):
        records.append(rec)
        print(json.dumps(rec), flush=True)

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
        "agreement_pct": round(
            100.0 * float(np.mean(labels[idx_plain] == lab_exact)), 3
        ),
    })
    del service

    svc = CascadeRecognitionService(
        model, variables, info, gallery, n_valid=n, resolution=res,
        taps=taps, galleries=w["tap_galleries"], labels=labels,
        d2_rule="class", pca_dim=124, rescore=48,
    )
    b = args.batch
    for ratio in [float(r) for r in args.ratios.split(",")]:
        svc.ratio = ratio
        svc._fused_fns = {}
        fracs = svc.calibrate(w["calib_probe"], slack=args.slack)
        packed = np.asarray(svc.identify_device(images))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = svc.identify_device(images)
        packed = np.asarray(out)
        sec = (time.perf_counter() - t0) / args.iters
        idx_fast = packed[:b].astype(np.int64)
        exit_level = packed[b : 2 * b]
        emit({
            "config": "cascade_level",
            "taps": taps,
            "ratio": ratio,
            "img_per_s": round(b / sec, 1),
            "speedup_vs_plain": round(b / sec / plain_ips, 3),
            "error_pct": round(bench._truth_error_pct(idx_fast, truth), 3),
            "agreement_pct": round(
                100.0 * float(np.mean(labels[idx_fast] == lab_exact)), 3
            ),
            "exit_fractions": (
                np.bincount(exit_level, minlength=svc.num_levels) / b
            ).round(4).tolist(),
            "survivor_fractions": [round(f, 4) for f in fracs],
            "capacities": list(svc.capacities_for(b)),
            "forced_fraction": round(float(packed[2 * b]) / b, 4),
        })

    if args.out:
        with open(args.out, "a") as f:
            for rec in records:
                f.write(json.dumps(rec) + "\n")
        print(f"appended {len(records)} lines to {args.out}", flush=True)


if __name__ == "__main__":
    main()
