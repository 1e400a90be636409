#!/usr/bin/env python
"""Trained-weights RECOGNITION serving operating curve: recall vs img/s
for the early-exit CascadeRecognitionService against the exact
RecognitionService.

The round-3 roofline (ARCHITECTURE.md §3) proved the exact bf16 forward
is the e2e bound; the reference's answer to that bound is sequential
early exits on a *trained* backbone (tf_keras/sequential_inference.py:
602-686 evaluates on trained EfficientNet + FAR-tuned thresholds;
qt_cpp/ImageTesting.cpp:533-535 accepts a match when the distance ratio
clears a threshold). This driver measures that answer on the serving
surface with real labels:

1. fine-tune a multi-exit backbone (``MultiExitTrainer``, two-phase) on
   sklearn's bundled ``load_digits`` — the only real-label image dataset
   available offline here,
2. gallery = trained final embeddings of the TRAIN images (recognition
   semantics: every class has many gallery rows, so the cascade uses the
   class-aware d2 rule — nearest other-class candidate),
3. probes = VAL images, pooled to a serving batch; measure macro recall
   (gallery-label-of-1NN vs probe label) and img/s for:
   - the exact service (RecognitionService, packed-PCA match), and
   - the cascade service across a ratio sweep (exit when d1/d2 < ratio).

Each point is one JSON line appended to --out.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])
sys.path.insert(0, __file__.rsplit("/", 1)[0])

from run_trained_cascade import load_dataset, stratified_split  # noqa: E402


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--variant", default="b0")
    parser.add_argument("--resolution", type=int, default=112)
    parser.add_argument("--train-frac", type=float, default=0.7)
    parser.add_argument("--phase1-epochs", type=int, default=4)
    parser.add_argument("--phase2-epochs", type=int, default=4)
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--phase1-lr", type=float, default=1e-3)
    parser.add_argument(
        "--phase2-lr", type=float, default=1e-4,
        help="1e-4 suits fine-tuning; from-scratch many-class runs want "
        "~2e-3",
    )
    parser.add_argument("--pool", type=int, default=4096)
    parser.add_argument("--iters", type=int, default=5)
    parser.add_argument("--grid", type=int, default=2)
    parser.add_argument("--rescore", type=int, default=48)
    parser.add_argument("--pca-dim", type=int, default=124)
    parser.add_argument(
        "--ratio-sweep", default="0.5,0.6,0.7,0.8",
        help="comma-separated d1/d2 exit thresholds (reference 0.7)",
    )
    parser.add_argument("--slack", type=float, default=1.3)
    parser.add_argument("--out", default="benchmarks/cascade_serving_r4.jsonl")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "--ckpt", default="benchmarks/trained_{variant}_{res}_{dtag}_s{seed}.npz",
        help="trained-weights cache — reruns skip the ~11 min fine-tune",
    )
    parser.add_argument("--retrain", action="store_true")
    parser.add_argument(
        "--dataset", default="digits", choices=["digits", "synthetic"],
    )
    parser.add_argument("--classes", type=int, default=128)
    parser.add_argument("--per-class", type=int, default=60)
    args = parser.parse_args()

    import jax.numpy as jnp

    from fast_image_recognition_tpu.evaluation.harness import (
        macro_recall_percent,
    )
    from fast_image_recognition_tpu.models import backbone_info, create_backbone
    from fast_image_recognition_tpu.models.efficientnet import default_taps
    from fast_image_recognition_tpu.models.train import (
        MultiExitTrainer,
        TrainConfig,
    )
    from fast_image_recognition_tpu.serving import (
        CascadeRecognitionService,
        RecognitionService,
    )

    res = args.resolution
    images, labels, dtag = load_dataset(
        args.dataset, res, args.classes, args.per_class, args.seed
    )
    num_classes = int(labels.max()) + 1
    tr_idx, va_idx = stratified_split(labels, args.train_frac, args.seed)
    tr_imgs, tr_y = images[tr_idx], labels[tr_idx]
    va_imgs, va_y = images[va_idx], labels[va_idx]
    print(
        f"{dtag}: train={len(tr_y)} val={len(va_y)} classes={num_classes} "
        f"res={res}", flush=True,
    )

    # ---- 1. two-phase multi-exit fine-tune (supervision at the serving
    # cascade's own taps, so the tapped features are discriminative) ---- #
    info = backbone_info(args.variant)
    model, variables = create_backbone(args.variant, 0, resolution=res)
    train_taps = tuple(default_taps(args.variant, "early"))
    serve_taps = list(train_taps[:2])
    cfg = TrainConfig(
        num_classes=num_classes,
        taps=train_taps,
        resolution=res,
        batch_size=args.batch_size,
        phase1_lr=args.phase1_lr,
        phase2_lr=args.phase2_lr,
        phase1_epochs=args.phase1_epochs,
        phase2_epochs=args.phase2_epochs,
        seed=args.seed,
    )
    trainer = MultiExitTrainer(model, variables, cfg)
    ckpt = args.ckpt.format(
        variant=args.variant, res=res, seed=args.seed, dtag=dtag
    )
    state_tpl = lambda: {  # noqa: E731
        "params": trainer.params,
        "batch_stats": trainer.batch_stats,
        "heads": trainer.heads,
    }
    if os.path.exists(ckpt) and not args.retrain:
        from fast_image_recognition_tpu.utils.checkpoint import load_variables

        state = load_variables(ckpt, state_tpl())
        trainer.params = state["params"]
        trainer.batch_stats = state["batch_stats"]
        trainer.heads = state["heads"]
        acc = trainer.evaluate(va_imgs, va_y)
        print(f"loaded {ckpt}; final-head val acc {acc:.4f}", flush=True)
    else:
        from fast_image_recognition_tpu.utils.checkpoint import save_variables

        t0 = time.perf_counter()
        trainer.fit(tr_imgs, tr_y, va_imgs, va_y, verbose=True)
        acc = trainer.evaluate(va_imgs, va_y)
        print(
            f"trained in {time.perf_counter() - t0:.0f}s; "
            f"final-head val acc {acc:.4f}", flush=True,
        )
        save_variables(ckpt, state_tpl())

    # the folded serving stem consumes RAW 0..255 images — the MBConv fold
    # bakes (x - MEAN_RGB)/STDDEV_RGB into the stem conv
    # (models/inference.py::fold_preprocess_into_stem), while training fed
    # the [-1, 1] digits images directly as already-preprocessed values.
    # Invert the fold's normalization for every serving-surface input so
    # the folded stem reproduces exactly what the trainer saw.
    from fast_image_recognition_tpu.models.efficientnet import (
        MEAN_RGB,
        STDDEV_RGB,
    )

    mean = np.asarray(MEAN_RGB, np.float32)
    std = np.asarray(STDDEV_RGB, np.float32)
    tr_serve = tr_imgs * std + mean
    va_serve = va_imgs * std + mean

    # ---- 2. gallery: trained final embeddings of the train images ----- #
    exact = RecognitionService(
        model, trainer.variables, info, np.eye(8, info["embedding_dim"],
        dtype=np.float32), resolution=res, match="exact",
    )
    gal = np.concatenate([
        exact.embed(jnp.asarray(tr_serve[s : s + 512]))
        for s in range(0, len(tr_serve), 512)
    ])
    print(f"gallery {gal.shape} from trained embeddings", flush=True)

    exact = RecognitionService(
        model, trainer.variables, info, gal, labels=tr_y, resolution=res,
        match="pca", pca_dim=args.pca_dim, rescore=args.rescore,
    )

    pool_idx = np.resize(np.arange(len(va_y)), args.pool)
    pool_imgs = jnp.asarray(va_serve[pool_idx])
    pool_y = va_y[pool_idx]

    def timed(fn):
        out = fn()  # compile + warm
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn()
        packed = np.asarray(out)  # one fetch for the queued dispatches
        return packed, (time.perf_counter() - t0) / args.iters

    results = []

    def emit(rec):
        results.append(rec)
        print(json.dumps(rec), flush=True)

    packed, sec = timed(lambda: exact.identify_device(pool_imgs))
    idx_exact = packed[: args.pool] if packed.ndim == 1 else packed
    base_ips = args.pool / sec
    base_recall = macro_recall_percent(
        pool_y, tr_y[np.asarray(idx_exact, np.int64)], num_classes
    )
    emit({
        "config": "serving_noexit",
        "dataset": dtag,
        "variant": args.variant,
        "resolution": res,
        "val_acc_final_head": round(float(acc), 4),
        "macro_recall_pct": round(base_recall, 2),
        "img_per_s": round(base_ips, 1),
        "vs_noexit": 1.0,
    })

    # ---- 3. the cascade across the ratio sweep ------------------------ #
    svc = CascadeRecognitionService(
        model, trainer.variables, info, gal,
        labels=tr_y, resolution=res, taps=serve_taps, grid=args.grid,
        pca_dim=args.pca_dim, rescore=args.rescore, d2_rule="class",
        calib_images=tr_serve[: (len(tr_serve) // 512) * 512],
        calib_batch=512, seed=args.seed,
    )
    calib_pool = jnp.asarray(
        tr_serve[np.resize(np.arange(len(tr_y)), args.pool)]
    )
    for ratio in [float(r) for r in args.ratio_sweep.split(",")]:
        svc.ratio = ratio
        svc._fused_fns = {}
        fracs = svc.calibrate(calib_pool, slack=args.slack)
        packed, sec = timed(lambda: svc.identify_device(pool_imgs))
        b = args.pool
        idx = packed[:b].astype(np.int64)
        exit_level = packed[b : 2 * b]
        recall = macro_recall_percent(pool_y, tr_y[idx], num_classes)
        agree = float(np.mean(idx == np.asarray(idx_exact, np.int64)))
        emit({
            "config": "serving_cascade",
            "dataset": dtag,
            "variant": args.variant,
            "resolution": res,
            "ratio": ratio,
            "taps": serve_taps,
            "macro_recall_pct": round(recall, 2),
            "img_per_s": round(args.pool / sec, 1),
            "vs_noexit": round(args.pool / sec / base_ips, 3),
            "agreement_pct": round(100.0 * agree, 2),
            "exit_fractions": (
                np.bincount(exit_level, minlength=svc.num_levels) / b
            ).round(4).tolist(),
            "survivor_fractions": [round(f, 4) for f in fracs],
            "capacities": list(svc.capacities_for(args.pool)),
            "forced_fraction": round(float(packed[2 * b]) / b, 4),
        })

    if args.out:
        with open(args.out, "a") as f:
            for rec in results:
                f.write(json.dumps(rec) + "\n")
        print(f"appended {len(results)} lines to {args.out}", flush=True)


if __name__ == "__main__":
    main()
