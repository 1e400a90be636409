#!/usr/bin/env python
"""Compose the pruning suite into the serving surface (BASELINE config #4,
VERDICT r4 Missing #1 / next-round #3).

The reference's pruning study ends in a latency/size/accuracy comparison
over a pruned-model zoo (tf_keras/prunned/keras_finetune_prune.py:
1051-1074); its serving story (BASELINE.json config #4) is early-exit /
pruned EfficientNets. This script produces the measured composition:

1. load the trained serving backbone (cli/train_serving_backbone.py
   checkpoint, device-rendered many-class dataset);
2. prune conv channels by L1 norm, 25% rounded to x16
   (keras_finetune_prune.py:531,541-542) — one and two rounds;
3. fine-tune each pruned model briefly on the same device-resident
   dataset (the reference's prune -> finetune loop);
4. report params / val-acc / steady-state folded serving latency for
   baseline vs pruned zoo, AND one full e2e serving line per model
   (RecognitionService vs the planted 1M gallery, unseen-class probes —
   the same workload as bench.py's headline config).

One JSON line per model, appended to --out.
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
    parser.add_argument("--classes", type=int, default=128)
    parser.add_argument("--per-class", type=int, default=60)
    parser.add_argument("--train-per-class", type=int, default=48)
    parser.add_argument("--gallery", type=int, default=1_000_000)
    parser.add_argument("--batch", type=int, default=1024)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--rounds", type=int, default=2)
    parser.add_argument("--fraction", type=float, default=0.25)
    parser.add_argument("--metric", default="l1")
    parser.add_argument("--finetune-epochs", type=int, default=8)
    parser.add_argument("--lr", type=float, default=5e-4)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--ckpt", default="auto")
    parser.add_argument("--out", default="benchmarks/prune_r5.jsonl")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from fast_image_recognition_tpu.data.synthetic_device import device_dataset
    from fast_image_recognition_tpu.models import (
        backbone_info,
        create_backbone,
        default_taps,
    )
    from fast_image_recognition_tpu.models.efficientnet import (
        MEAN_RGB,
        STDDEV_RGB,
    )
    from fast_image_recognition_tpu.models.fold import make_serving_fn
    from fast_image_recognition_tpu.models.pruning import (
        parameter_count,
        prune_efficientnet,
    )
    from fast_image_recognition_tpu.models.train import (
        MultiExitTrainer,
        TrainConfig,
    )
    from fast_image_recognition_tpu.serving import RecognitionService

    res = args.resolution
    info = dict(backbone_info(args.variant))
    model, variables = create_backbone(args.variant, 0, resolution=res)
    ckpt = bench._find_ckpt(args, res)
    assert ckpt, "needs the trained checkpoint (cli/train_serving_backbone.py)"
    variables = bench._load_trained(model, variables, ckpt)

    # device-resident dataset for fine-tuning (same classes as training)
    images, labels = device_dataset(
        args.classes, args.per_class, res, seed=args.seed
    )
    rng = np.random.default_rng(args.seed)
    tr, va = [], []
    for c in range(args.classes):
        idx = rng.permutation(np.nonzero(labels == c)[0])
        tr.append(idx[: args.train_per_class])
        va.append(idx[args.train_per_class :])
    tr_idx, va_idx = np.concatenate(tr), np.concatenate(va)
    tr_imgs = jnp.take(images, jnp.asarray(tr_idx, jnp.int32), axis=0)
    va_imgs = jnp.take(images, jnp.asarray(va_idx, jnp.int32), axis=0)
    del images
    mean = jnp.asarray(MEAN_RGB, jnp.float32)
    std = jnp.asarray(STDDEV_RGB, jnp.float32)
    prep = lambda x: (x - mean) / std  # noqa: E731

    probes = bench._synthetic_probe_images(args.batch, res, seed=1000 + args.batch)

    records = []

    def emit(rec):
        records.append(rec)
        print(json.dumps(rec), flush=True)

    taps = tuple(default_taps(args.variant, "early"))

    def finetune(m, v, epochs, heads=None):
        # cosine head matches the checkpoint's training objective
        # (cli/train_serving_backbone.py --head cosine)
        cfg = TrainConfig(
            num_classes=args.classes, taps=taps, resolution=res,
            batch_size=128, phase1_epochs=0, phase2_epochs=epochs,
            phase2_lr=args.lr, patience=4, head="cosine", seed=args.seed,
        )
        t = MultiExitTrainer(m, v, cfg, preprocess=prep)
        if heads is not None:
            # evaluate the unmodified checkpoint with ITS OWN heads —
            # fresh random heads read as ~0 accuracy
            t.heads = heads
        if epochs:
            t.fit(tr_imgs, labels[tr_idx], va_imgs, labels[va_idx],
                  verbose=False)
        return t, t.evaluate(va_imgs, labels[va_idx])

    def serve_line(name, m, v, acc):
        minfo = dict(info)
        serve, sparams = make_serving_fn(
            m, v, minfo, resolution=res, folded=True
        )
        emb_fn = jax.jit(lambda vv, im: serve(vv, im)["embedding"])
        emb0 = bench._normalize(np.asarray(emb_fn(sparams, probes), np.float32))
        minfo["embedding_dim"] = emb0.shape[1]
        gallery, true_idx = bench._planted_gallery_device(args.gallery, emb0)
        svc = RecognitionService(
            m, v, minfo, gallery, n_valid=args.gallery, resolution=res,
            pca_scan="packed", pca_dim=124, rescore=48,
            serving_fn=(serve, sparams),
        )
        idx_fast = np.asarray(svc.identify_device(probes))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = svc.identify_device(probes)
        _ = np.asarray(out)
        sec = (time.perf_counter() - t0) / args.iters
        idx_exact = bench._exact_fp32_nn(emb0, gallery, args.gallery)
        emit({
            "config": name,
            "params_m": round(parameter_count(v) / 1e6, 3),
            "val_acc": round(float(acc), 4),
            "img_per_s_e2e": round(args.batch / sec, 1),
            "error_pct": round(
                100.0 * float(np.mean(idx_fast != true_idx)), 3
            ),
            "agreement_pct": round(
                100.0 * float(np.mean(idx_fast == idx_exact)), 3
            ),
            "gallery": args.gallery,
        })
        del svc, gallery

    # baseline: the trained checkpoint as-is (no extra fine-tune),
    # evaluated with the checkpoint's own heads
    from fast_image_recognition_tpu.utils.checkpoint import load_variables

    ckpt_heads = load_variables(ckpt).get("heads")
    if ckpt_heads is not None:
        import jax.numpy as _jnp

        if isinstance(ckpt_heads, dict):  # msgpack stores lists as dicts
            ckpt_heads = [
                ckpt_heads[str(i)] for i in range(len(ckpt_heads))
            ]
        ckpt_heads = [
            {k: _jnp.asarray(v) for k, v in h.items()} for h in ckpt_heads
        ]
    t0_all = time.perf_counter()
    trainer, acc = finetune(model, variables, 0, heads=ckpt_heads)
    serve_line(f"baseline_{args.variant}", model,
               {"params": trainer.params, "batch_stats": trainer.batch_stats},
               acc)

    m, v = model, {"params": trainer.params, "batch_stats": trainer.batch_stats}
    for r in range(1, args.rounds + 1):
        m, v = prune_efficientnet(
            m, v, fraction=args.fraction, metric=args.metric,
            images=np.asarray(
                prep(jnp.asarray(va_imgs[:64]).astype(jnp.float32))
            ),
            labels=labels[va_idx][:64],
            num_classes=args.classes, seed=args.seed,
        )
        trainer, acc = finetune(m, v, args.finetune_epochs)
        v = {"params": trainer.params, "batch_stats": trainer.batch_stats}
        serve_line(
            f"pruned_x{r}_{args.metric}{int(args.fraction * 100)}", m, v, acc
        )
    print(f"total {time.perf_counter() - t0_all:.0f}s", flush=True)

    if args.out:
        with open(args.out, "a") as f:
            for rec in records:
                f.write(json.dumps(rec) + "\n")
        print(f"appended {len(records)} lines to {args.out}", flush=True)


if __name__ == "__main__":
    main()
