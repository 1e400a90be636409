#!/usr/bin/env python
"""Prune / fine-tune driver (tf_keras/prunned/keras_finetune_prune.py:895-1088
and tf_keras/train_model.ipynb): fine-tune a backbone with multi-exit heads,
prune channels by a chosen importance metric, fine-tune again, and report
the latency / parameter-count / accuracy comparison over the pruned zoo
(:1051-1074)."""

from __future__ import annotations

import argparse
import time

import numpy as np



def synth_images(spec: str, seed: int):
    """C,PER_CLASS,RES synthetic labelled image set (stand-in for the
    dataset dirs the reference hardcodes)."""
    c, per, res = (int(x) for x in spec.split(","))
    rng = np.random.default_rng(seed)
    labels = np.repeat(np.arange(c), per)
    images = rng.normal(size=(c * per, res, res, 3)).astype(np.float32)
    images += labels[:, None, None, None] * 0.8
    perm = rng.permutation(len(labels))
    return images[perm], labels[perm].astype(np.int64), c, res


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--synthetic", default="4,24,32", metavar="C,PER,RES")
    parser.add_argument("--variant", default="b0",
                    help="b0..b7 | mobilenetv2[_W] | inception_resnet_v2")
    parser.add_argument("--metric", default="l1", help="l1|apoz|taylor|class_sep|random")
    parser.add_argument("--fraction", type=float, default=0.25)
    parser.add_argument("--epochs", type=int, default=1)
    parser.add_argument("--seed", type=int, default=13)
    args = parser.parse_args()

    import jax.numpy as jnp

    from fast_image_recognition_tpu.models import create_backbone, default_taps_for
    from fast_image_recognition_tpu.models.pruning import (
        parameter_count,
        prune_efficientnet,
    )
    from fast_image_recognition_tpu.models.train import MultiExitTrainer, TrainConfig

    images, labels, c, res = synth_images(args.synthetic, args.seed)
    n_train = int(len(labels) * 0.8)
    tr_x, tr_y = images[:n_train], labels[:n_train]
    va_x, va_y = images[n_train:], labels[n_train:]

    model, variables = create_backbone(args.variant, 0, resolution=res)
    taps = tuple(default_taps_for(args.variant))
    cfg = TrainConfig(
        num_classes=c, taps=taps, resolution=res, batch_size=16,
        phase1_epochs=args.epochs, phase2_epochs=args.epochs,
    )

    def measure(name, m, v):
        trainer = MultiExitTrainer(m, v, cfg)
        trainer.fit(tr_x, tr_y, va_x, va_y, verbose=False)
        acc = trainer.evaluate(va_x, va_y)
        # latency: steady-state forward (queued dispatches + one transfer)
        x = jnp.asarray(va_x[:16], jnp.float32)
        import jax

        fwd = jax.jit(lambda v_, x_: m.apply(v_, x_)["embedding"])
        _ = np.asarray(fwd(trainer.variables, x))
        t0 = time.perf_counter()
        out = None
        for _ in range(5):
            out = fwd(trainer.variables, x)
        _ = np.asarray(out)
        ms = 1000.0 * (time.perf_counter() - t0) / (5 * 16)
        print(
            f"{name}: params={parameter_count(trainer.variables)/1e6:.2f}M "
            f"val_acc={acc:.3f} latency={ms:.3f} ms/image"
        )
        return trainer.variables

    print(f"== baseline {args.variant} ==")
    trained = measure("baseline", model, variables)

    print(f"== pruned {args.fraction:.0%} by {args.metric} ==")
    pruned_model, pruned_vars = prune_efficientnet(
        model,
        trained,
        fraction=args.fraction,
        metric=args.metric,
        images=tr_x[:32],
        labels=tr_y[:32],
        num_classes=c,
        seed=args.seed,
    )
    measure(f"pruned-{args.metric}", pruned_model, pruned_vars)


if __name__ == "__main__":
    main()
