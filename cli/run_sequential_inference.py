#!/usr/bin/env python
"""sequential_inference.py __main__ equivalent (SURVEY.md §3.4).

Pipeline: build a multi-exit EfficientNet, extract per-level embeddings for
train/val once (cached, sequential_inference.py:780-897), report per-level
latencies (:888-896), then run the exit-policy testers — per-level 1-NN,
sequential kNN exits, FAR-tuned + fixed LinearSVC exits, BranchyNet
entropy/max-prob over trained heads, and the hybrid kNN+SVC — printing
macro recall / ms per image / break distributions like the reference."""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def synth_images(spec: str, seed: int):
    c, per, res = (int(x) for x in spec.split(","))
    rng = np.random.default_rng(seed)
    labels = np.repeat(np.arange(c), per)
    images = rng.normal(size=(c * per, res, res, 3)).astype(np.float32)
    images += labels[:, None, None, None] * 0.8
    perm = rng.permutation(len(labels))
    return images[perm], labels[perm].astype(np.int64), c, res


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--dataset-root", default=None, help="<class>/<img> dirs")
    parser.add_argument("--synthetic", default="6,30,32", metavar="C,PER,RES")
    parser.add_argument("--variant", default="b0",
                    help="b0..b7 | mobilenetv2[_W] | inception_resnet_v2")
    parser.add_argument("--train-count", type=int, default=20, help=":1410 train_count")
    parser.add_argument("--cache-dir", default="/tmp/fir_cache")
    parser.add_argument("--network-name", default=None)
    parser.add_argument("--train-heads-epochs", type=int, default=2)
    parser.add_argument(
        "--fused", action="store_true",
        help="also run the fused one-dispatch serving engine (kNN + SVC "
        "exit heads over real backbone segments)",
    )
    parser.add_argument("--seed", type=int, default=123)
    args = parser.parse_args()

    import jax.numpy as jnp

    from fast_image_recognition_tpu.cascade.exits import (
        LinearExitCascade,
        entropy_exit_cascade,
        knn_exits_with_final_classifier,
        sequential_knn_cascade,
    )
    from fast_image_recognition_tpu.data.pipeline import create_image_lists
    from fast_image_recognition_tpu.evaluation.harness import macro_recall_percent
    from fast_image_recognition_tpu.models import create_backbone, default_taps_for
    from fast_image_recognition_tpu.models.extractor import load_images
    from fast_image_recognition_tpu.models.train import MultiExitTrainer, TrainConfig
    from fast_image_recognition_tpu.utils.checkpoint import EmbeddingCache

    # --- data -------------------------------------------------------------
    if args.dataset_root:
        rng = np.random.default_rng(args.seed)
        lists = create_image_lists(args.dataset_root, rng, train_count=args.train_count)
        res = 224
        tr_imgs, kept = load_images(lists.train_paths, res)
        tr_y = lists.train_labels[kept]
        va_imgs, kept = load_images(lists.val_paths, res)
        va_y = lists.val_labels[kept]
        num_classes = len(lists.class_names)
    else:
        images, labels, num_classes, res = synth_images(args.synthetic, args.seed)
        n_train = args.train_count * num_classes
        tr_imgs, tr_y = images[:n_train], labels[:n_train]
        va_imgs, va_y = images[n_train:], labels[n_train:]
    print(f"train={len(tr_y)} val={len(va_y)} classes={num_classes}")

    # --- model + per-level embeddings (cached, :816-886) -------------------
    model, variables = create_backbone(args.variant, 0, resolution=res)
    taps = tuple(default_taps_for(args.variant))
    network_name = args.network_name or f"{args.variant}_{res}_"
    cache = EmbeddingCache(args.cache_dir, network_name)

    def extract_levels(images_, tag):
        if cache.exists(tag):
            levels, _ = cache.load(tag)
            print(f"loaded cached embeddings '{tag}'")
            return [np.asarray(x) for x in levels]
        levels = [[] for _ in range(len(taps) + 1)]
        t_levels = np.zeros(len(taps) + 1)
        bs = 32
        for s in range(0, len(images_), bs):
            t0 = time.perf_counter()
            out = model.apply(
                variables, jnp.asarray(images_[s : s + bs], jnp.float32), taps=taps
            )
            embs = [np.asarray(out["taps"][t]) for t in taps] + [
                np.asarray(out["embedding"])
            ]
            for i, e in enumerate(embs):
                e = e / np.maximum(np.linalg.norm(e, axis=1, keepdims=True), 1e-12)
                levels[i].append(e)
            t_levels += time.perf_counter() - t0
        levels = [np.concatenate(l) for l in levels]
        cache.save(tag, levels, tr_y if tag == "train" else va_y)
        return levels

    t0 = time.perf_counter()
    x_train = extract_levels(tr_imgs, "train")
    x_val = extract_levels(va_imgs, "val")
    print(f"embedding extraction took {time.perf_counter()-t0:.1f}s; "
          f"level dims: {[x.shape[1] for x in x_train]}")

    def report(name, result, y):
        recall = macro_recall_percent(y, result.predictions, num_classes)
        print(
            f"{name}: recall (macro): {recall/100:.4f} "
            f"average breaks per layer: {np.round(result.break_counts, 3)}"
        )

    # --- kNN exit policies (:462-583) ---------------------------------------
    res_knn = sequential_knn_cascade(x_train, tr_y, x_val, ratio=0.8)
    report("sequential kNN (d_min/0.8)", res_knn, va_y)

    # --- LinearSVC exits, the proposed method (:587-686) --------------------
    cascade = LinearExitCascade.train(x_train, tr_y, num_classes, far=0.01)
    report("LinearSVC exits (FAR<=1%)", cascade.evaluate(x_val), va_y)
    fixed = LinearExitCascade.train(
        x_train, tr_y, num_classes, fixed_threshold=0.06
    )
    report("LinearSVC exits (fixed 0.06)", fixed.evaluate(x_val), va_y)

    # --- hybrid kNN + final SVC (:725-773) ----------------------------------
    res_hybrid = knn_exits_with_final_classifier(
        x_train, tr_y, x_val, num_classes, ratio=0.8
    )
    report("hybrid kNN exits + final SVC", res_hybrid, va_y)

    # --- fused serving engine (one-dispatch cascade over real segments) ----
    if args.fused:
        from fast_image_recognition_tpu.cascade.engine import (
            SequentialInferencePipeline,
        )

        pipe = SequentialInferencePipeline(
            model, variables, taps,
            head_mode="knn",
            galleries=x_train,
            gallery_labels=tr_y,
            ratio=0.8,
        )
        pipe.calibrate(tr_imgs[: min(len(tr_imgs), 128)])
        pipe.predict_fused(va_imgs)  # compile + warm (untimed)
        r = pipe.predict_fused(va_imgs)
        report("fused kNN-exit engine (d_min/0.8)", r, va_y)
        print(
            f"  ms/image {r.ms_per_image:.3f}  forced {r.forced_fraction:.3f}"
        )
        pipe_svc = SequentialInferencePipeline(
            model, variables, taps,
            coefs=cascade.coefs,
            intercepts=cascade.intercepts,
            thresholds=cascade.thresholds[:-1],
        )
        pipe_svc.calibrate(tr_imgs[: min(len(tr_imgs), 128)], tune=False)
        pipe_svc.predict_fused(va_imgs)  # compile + warm (untimed)
        r = pipe_svc.predict_fused(va_imgs)
        report("fused SVC-exit engine (FAR<=1%)", r, va_y)
        print(
            f"  ms/image {r.ms_per_image:.3f}  forced {r.forced_fraction:.3f}"
        )

    # --- BranchyNet heads (:1079-1232) ---------------------------------------
    if args.train_heads_epochs > 0:
        cfg = TrainConfig(
            num_classes=num_classes,
            taps=taps,
            resolution=res,
            batch_size=16,
            phase1_epochs=args.train_heads_epochs,
            phase2_epochs=0,
        )
        trainer = MultiExitTrainer(model, variables, cfg)
        trainer.fit(tr_imgs, tr_y, verbose=False)
        logits = trainer.head_logits(va_imgs)
        probs = [np.asarray(jnp.asarray(l)) for l in logits]
        probs = [np.exp(l - l.max(1, keepdims=True)) for l in probs]
        probs = [p / p.sum(1, keepdims=True) for p in probs]
        for threshold in (0.5, 1.0):
            r = entropy_exit_cascade(probs, threshold, mode="entropy")
            report(f"BranchyNet entropy<={threshold}", r, va_y)
        r = entropy_exit_cascade(probs, 0.7, mode="max_prob")
        report("ConditionalNet max-prob>0.7", r, va_y)


if __name__ == "__main__":
    main()
