#!/usr/bin/env python
"""Flagship (InceptionResNetV2, 1536-d — qt_cpp/db.h:79-91) operating
ladder: measured e2e img/s + recognition error at a RESOLUTION ladder on
the 1M class-structured gallery (VERDICT r4 next-round #2).

The r4 finding: exact IRv2@299 runs 3.3k img/s at 44% MFU — and the SoL
accounting here shows why no tuning crosses 10k at 299 (the model is
~13 GFLOP/img; 197 TF/s / FLOPs < 10k even at 100% MFU). The honest way
to a >=10k flagship operating point is the resolution ladder, WITH the
recall delta measured on real (trained-checkpoint) recognition workloads
— this script captures both sides for each rung.

One JSON line per resolution: img/s, MFU, SoL bound at 100% MFU,
recognition error, agreement vs the fp32 exact scan.
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
    parser.add_argument("--variant", default="inception_resnet_v2")
    parser.add_argument("--ckpt", required=True)
    parser.add_argument("--resolutions", default="299,224,192,160")
    parser.add_argument("--gallery", type=int, default=1_000_000)
    parser.add_argument("--gallery-classes", type=int, default=4096)
    parser.add_argument("--batch", type=int, default=1024)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--out", default="benchmarks/flagship_r5.jsonl")
    args = parser.parse_args()

    import jax

    from fast_image_recognition_tpu.models import backbone_info, create_backbone
    from fast_image_recognition_tpu.models.fold import make_serving_fn
    from fast_image_recognition_tpu.serving import RecognitionService
    from fast_image_recognition_tpu.utils.flops import fn_flops

    info = backbone_info(args.variant)
    records = []
    for res in [int(r) for r in args.resolutions.split(",")]:
        model, variables = create_backbone(args.variant, 0, resolution=res)
        variables = bench._load_trained(model, variables, args.ckpt)
        serve, sparams = make_serving_fn(
            model, variables, info, resolution=res, folded=True
        )
        w = bench._trained_recognition_workload(args, res, serve, sparams)
        images, emb0 = w["images"], w["emb0"]
        gallery, truth = w["gallery"], w["truth"]
        n = args.gallery

        svc = RecognitionService(
            model, variables, info, gallery, n_valid=n, resolution=res,
            pca_scan="packed", pca_dim=124, rescore=48,
            serving_fn=(serve, sparams),
        )
        backbone_flops = fn_flops(
            lambda v, im: serve(v, im)["embedding"], sparams, images
        )
        flops = backbone_flops + svc.match_flops(args.batch)
        idx_fast = np.asarray(svc.identify_device(images))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = svc.identify_device(images)
        _ = np.asarray(out)
        sec = (time.perf_counter() - t0) / args.iters
        ips = args.batch / sec
        idx_exact = bench._exact_fp32_nn(emb0, gallery, n)
        tflops = flops / sec / 1e12
        rec = {
            "config": f"flagship_{args.variant}_{res}",
            "resolution": res,
            "img_per_s": round(ips, 1),
            "tflops": round(tflops, 1),
            "mfu": round(tflops / bench.PEAK_TFLOPS, 3),
            "flops_per_img_g": round(flops / args.batch / 1e9, 2),
            "sol_img_per_s_100mfu": round(
                bench.PEAK_TFLOPS * 1e12 * args.batch / flops, 1
            ),
            "error_pct": round(bench._truth_error_pct(idx_fast, truth), 3),
            "agreement_pct": round(
                100.0 * float(np.mean(idx_fast == idx_exact)), 3
            ),
            "gallery": n,
        }
        records.append(rec)
        print(json.dumps(rec), flush=True)
        del svc, gallery, w

    if args.out:
        with open(args.out, "a") as f:
            for rec in records:
                f.write(json.dumps(rec) + "\n")
        print(f"appended {len(records)} lines to {args.out}", flush=True)


if __name__ == "__main__":
    main()
