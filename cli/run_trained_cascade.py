#!/usr/bin/env python
"""Trained-weights cascade operating curve: recall vs throughput.

The reference evaluates its proposed sequential-inference method on a
*trained* backbone with FAR-tuned LinearSVC exit thresholds and prints
macro recall next to the exit distribution
(tf_keras/sequential_inference.py:602-686, :663-665). This driver is the
measured TPU equivalent on a real labeled dataset:

1. fine-tune a multi-exit backbone with ``MultiExitTrainer`` (two-phase:
   heads-only then full, sequential_inference.py:1210-1231) on sklearn's
   bundled ``load_digits`` (1797 real 8x8 images, 10 classes — the only
   real-label image dataset available offline in this environment),
2. train per-level LinearSVC exit heads on the trained embeddings and
   FAR-tune each threshold on a held-out half (:609-631),
3. sweep FAR to trace the operating curve: macro recall vs img/s for
   ``predict_pooled`` (level-major pooled serving — thresholds are host
   state, so the sweep reuses the compiled segments), plus one
   ``predict_fused`` point at the chosen FAR,
4. against the no-exit baseline: the BN-folded full forward + final SVC
   head, timed the same way (one device fetch per pool).

Each point is emitted as a JSON line (appended to --out) with recall,
img/s, the exit distribution, and the speedup vs no-exit.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def load_digits_images(res: int):
    """sklearn digits upsampled (nearest) to [N, res, res, 3] float32 in
    [-1, 1] with integer labels."""
    from sklearn.datasets import load_digits

    d = load_digits()
    x = d.images.astype(np.float32) / 16.0  # [N, 8, 8] in [0, 1]
    f = res // 8
    x = np.repeat(np.repeat(x, f, axis=1), f, axis=2)
    x = (x[..., None] * 2.0 - 1.0).repeat(3, axis=-1)
    return x, d.target.astype(np.int64)


def load_dataset(
    name: str, res: int, classes: int = 128, per_class: int = 60,
    seed: int = 0,
):
    """(images [-1,1] float32, labels int64, tag) for ``--dataset``:

    - ``digits``: sklearn load_digits (10 classes, 8x8 upscaled) — the
      only REAL-label offline dataset, kept as the small anchor;
    - ``synthetic``: the many-class procedural image dataset
      (data/synthetic_images.py — the Caltech-256 regime of
      tf_keras/sequential_inference.py:231-269: 100+ classes with
      intra-class affine/noise variation)."""
    if name == "digits":
        x, y = load_digits_images(res)
        return x, y, "digits"
    if name == "synthetic":
        from fast_image_recognition_tpu.data.synthetic_images import (
            make_synthetic_image_dataset,
        )

        x, y = make_synthetic_image_dataset(
            classes, per_class, res, seed=seed
        )
        x = x.astype(np.float32) / 255.0 * 2.0 - 1.0
        return x, y, f"synthetic{classes}"
    raise ValueError(f"unknown dataset {name!r}")


def stratified_split(labels: np.ndarray, train_frac: float, seed: int):
    rng = np.random.default_rng(seed)
    tr, va = [], []
    for c in np.unique(labels):
        idx = rng.permutation(np.nonzero(labels == c)[0])
        k = int(round(train_frac * len(idx)))
        tr.append(idx[:k])
        va.append(idx[k:])
    return np.concatenate(tr), np.concatenate(va)


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--variant", default="b0")
    parser.add_argument("--resolution", type=int, default=32)
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
    parser.add_argument("--bucket", type=int, default=1024)
    parser.add_argument(
        "--streams", default="1",
        help="pooled mode: interleaved sub-pools whose per-level fetches "
        "pipeline (hides the device-link RTT; engine.predict_pooled). "
        "Comma list: first value runs the FAR sweep, the rest re-measure "
        "at --fused-far for the pipelining comparison",
    )
    parser.add_argument("--iters", type=int, default=5)
    parser.add_argument(
        "--far-sweep", default="0.1,0.05,0.02,0.01,0.005",
        help="comma-separated FAR targets for the operating curve",
    )
    parser.add_argument("--fused-far", type=float, default=0.01)
    parser.add_argument("--out", default="benchmarks/cascade_trained_r4.jsonl")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "--dataset", default="digits", choices=["digits", "synthetic"],
    )
    parser.add_argument("--classes", type=int, default=128)
    parser.add_argument("--per-class", type=int, default=60)
    args = parser.parse_args()
    streams_list = [int(x) for x in str(args.streams).split(",")]
    args.streams = streams_list[0]

    import jax
    import jax.numpy as jnp

    from fast_image_recognition_tpu.cascade.engine import (
        SequentialInferencePipeline,
    )
    from fast_image_recognition_tpu.cascade.exits import LinearExitCascade
    from fast_image_recognition_tpu.evaluation.harness import (
        macro_recall_percent,
    )
    from fast_image_recognition_tpu.models import (
        create_backbone,
        default_taps_for,
    )
    from fast_image_recognition_tpu.models.train import (
        MultiExitTrainer,
        TrainConfig,
    )

    res = args.resolution
    images, labels, dtag = load_dataset(
        args.dataset, res, args.classes, args.per_class, args.seed
    )
    num_classes = int(labels.max()) + 1
    tr_idx, va_idx = stratified_split(labels, args.train_frac, args.seed)
    tr_imgs, tr_y = images[tr_idx], labels[tr_idx]
    va_imgs, va_y = images[va_idx], labels[va_idx]
    print(f"{dtag}: train={len(tr_y)} val={len(va_y)} classes={num_classes} "
          f"res={res}", flush=True)

    # ---- 1. two-phase multi-exit fine-tune ------------------------------ #
    model, variables = create_backbone(args.variant, 0, resolution=res)
    taps = tuple(default_taps_for(args.variant))
    cfg = TrainConfig(
        num_classes=num_classes,
        taps=taps,
        resolution=res,
        batch_size=args.batch_size,
        phase1_lr=args.phase1_lr,
        phase2_lr=args.phase2_lr,
        phase1_epochs=args.phase1_epochs,
        phase2_epochs=args.phase2_epochs,
        seed=args.seed,
    )
    trainer = MultiExitTrainer(model, variables, cfg)
    t0 = time.perf_counter()
    trainer.fit(tr_imgs, tr_y, va_imgs, va_y, verbose=True)
    final_acc = trainer.evaluate(va_imgs, va_y)
    print(f"trained in {time.perf_counter()-t0:.0f}s; "
          f"final-head val acc {final_acc:.4f}", flush=True)

    # ---- 2. per-level SVC exits on the TRAINED embeddings ---------------- #
    pipe = SequentialInferencePipeline(
        model,
        trainer.variables,
        taps,
        coefs=[np.zeros((num_classes, 1), np.float32)] * (len(taps) + 1),
        intercepts=[np.zeros(num_classes, np.float32)] * (len(taps) + 1),
        engine="folded",
    )
    x_train = pipe.level_embeddings(tr_imgs)
    print(f"level dims: {[x.shape[1] for x in x_train]}", flush=True)

    fars = [float(f) for f in args.far_sweep.split(",")]
    cascades = {
        far: LinearExitCascade.train(
            x_train, tr_y, num_classes, far=far, seed=args.seed
        )
        for far in fars
    }

    # ---- 3. pooled serving measurements ---------------------------------- #
    pool_idx = np.resize(np.arange(len(va_y)), args.pool)
    pool_imgs = jnp.asarray(va_imgs[pool_idx])
    pool_y = va_y[pool_idx]

    # no-exit baseline: folded full forward + final SVC head, one program
    c_last = cascades[fars[0]]

    def full_forward(params, x, coef, intercept):
        from fast_image_recognition_tpu.models.inference import (
            folded_blocks,
            folded_head,
            folded_stem,
        )

        act = pipe._configs[0].get("activation", "swish")
        h = folded_stem(params, x.astype(jnp.bfloat16), activation=act)
        h = folded_blocks(params, pipe._configs, h, 0, len(pipe._configs))
        emb = folded_head(params, h, activation=act).astype(jnp.float32)
        emb = emb / jnp.maximum(
            jnp.linalg.norm(emb, axis=1, keepdims=True), 1e-12
        )
        return jnp.argmax(emb @ coef.T + intercept, axis=1).astype(jnp.int32)

    fwd = jax.jit(full_forward)
    coef_f = jnp.asarray(c_last.coefs[-1])
    int_f = jnp.asarray(c_last.intercepts[-1])
    preds = np.asarray(fwd(pipe._seg_params, pool_imgs, coef_f, int_f))
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = fwd(pipe._seg_params, pool_imgs, coef_f, int_f)
    preds = np.asarray(out)  # one fetch for the queued dispatches
    base_ms = (time.perf_counter() - t0) / args.iters * 1e3
    base_ips = args.pool / base_ms * 1e3
    base_recall = macro_recall_percent(pool_y, preds, num_classes)
    print(f"no-exit folded forward: recall {base_recall:.2f}%  "
          f"{base_ips:,.0f} img/s", flush=True)

    results = []

    def emit(rec):
        rec["vs_noexit"] = rec["img_per_s"] / base_ips
        results.append(rec)
        print(json.dumps(rec), flush=True)

    emit({
        "config": "cascade_trained_noexit",
        "dataset": dtag,
        "variant": args.variant,
        "resolution": res,
        "val_acc_final_head": round(final_acc, 4),
        "macro_recall_pct": round(base_recall, 2),
        "img_per_s": round(base_ips, 1),
    })

    for far in fars:
        c = cascades[far]
        pipe.coefs = [jnp.asarray(w, jnp.float32) for w in c.coefs]
        pipe.intercepts = [jnp.asarray(b, jnp.float32) for b in c.intercepts]
        pipe.thresholds = list(c.thresholds[:-1])
        r = pipe.predict_pooled(
            pool_imgs, bucket=args.bucket, warmup=True,
            streams=args.streams,
        )
        best = None
        for _ in range(args.iters):
            rr = pipe.predict_pooled(
                pool_imgs, bucket=args.bucket, streams=args.streams
            )
            if best is None or rr.ms_per_image < best.ms_per_image:
                best = rr
        recall = macro_recall_percent(pool_y, best.predictions, num_classes)
        emit({
            "config": "cascade_trained_pooled",
            "streams": args.streams,
            "dataset": dtag,
            "variant": args.variant,
            "resolution": res,
            "far": far,
            "macro_recall_pct": round(recall, 2),
            "img_per_s": round(1000.0 / best.ms_per_image, 1),
            "break_counts": [round(float(b), 4) for b in best.break_counts],
        })

    # ---- 3b. pooled stream-pipelining comparison at the chosen FAR ------- #
    for extra_streams in streams_list[1:]:
        c = cascades[args.fused_far]
        pipe.coefs = [jnp.asarray(w, jnp.float32) for w in c.coefs]
        pipe.intercepts = [jnp.asarray(b, jnp.float32) for b in c.intercepts]
        pipe.thresholds = list(c.thresholds[:-1])
        r = pipe.predict_pooled(
            pool_imgs, bucket=args.bucket, warmup=True,
            streams=extra_streams,
        )
        best = None
        for _ in range(args.iters):
            rr = pipe.predict_pooled(
                pool_imgs, bucket=args.bucket, streams=extra_streams
            )
            if best is None or rr.ms_per_image < best.ms_per_image:
                best = rr
        recall = macro_recall_percent(pool_y, best.predictions, num_classes)
        emit({
            "config": "cascade_trained_pooled",
            "streams": extra_streams,
            "dataset": dtag,
            "variant": args.variant,
            "resolution": res,
            "far": args.fused_far,
            "macro_recall_pct": round(recall, 2),
            "img_per_s": round(1000.0 / best.ms_per_image, 1),
            "break_counts": [round(float(b), 4) for b in best.break_counts],
        })

    # ---- 4. one fused single-dispatch point ------------------------------ #
    # Steady-state timing discipline matches the no-exit baseline: queue
    # ``iters`` whole-cascade dispatches, ONE host fetch at the end (the
    # tunnel's block_until_ready is a no-op; per-call fetches would charge
    # one RTT per pool to the cascade but 1/iters RTT to the baseline).
    c = cascades[args.fused_far]
    pipe.coefs = [jnp.asarray(w, jnp.float32) for w in c.coefs]
    pipe.intercepts = [jnp.asarray(b, jnp.float32) for b in c.intercepts]
    pipe.thresholds = list(c.thresholds[:-1])
    pipe.calibrate(tr_imgs[: min(len(tr_imgs), 512)], tune=False)
    rr = pipe.predict_fused(pool_imgs)  # compile + warm + bookkeeping
    fused_fn = pipe._fused_fns[list(pipe._fused_fns)[-1]]  # just compiled
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = fused_fn(pipe._seg_params, pool_imgs)
    packed = np.asarray(out)  # one fetch for the queued dispatches
    fused_ms = (time.perf_counter() - t0) / args.iters * 1e3
    b = args.pool
    preds_f = packed[:b].astype(np.int64)
    recall = macro_recall_percent(pool_y, preds_f, num_classes)
    emit({
        "config": "cascade_trained_fused",
        "dataset": dtag,
        "variant": args.variant,
        "resolution": res,
        "far": args.fused_far,
        "macro_recall_pct": round(recall, 2),
        "img_per_s": round(args.pool / fused_ms * 1e3, 1),
        "break_counts": [round(float(x), 4) for x in rr.break_counts],
        "forced_fraction": round(rr.forced_fraction, 4),
    })

    if args.out:
        with open(args.out, "a") as f:
            for rec in results:
                f.write(json.dumps(rec) + "\n")
        print(f"appended {len(results)} lines to {args.out}", flush=True)


if __name__ == "__main__":
    main()
