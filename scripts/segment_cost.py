#!/usr/bin/env python
"""Measure the cumulative wall cost of the folded forward truncated at each
stage boundary (B0 default) — sizes the early-exit placement for
serving.CascadeRecognitionService: the exit tap's prefix cost IS the
cascade's best-case ms/batch."""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--variant", default="b0")
    ap.add_argument("--resolution", type=int, default=None)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from fast_image_recognition_tpu.models import backbone_info, create_backbone
    from fast_image_recognition_tpu.models.inference import (
        fold_backbone,
        fold_preprocess_into_stem,
        folded_blocks,
        folded_head,
        folded_stem_pp,
    )

    info = backbone_info(args.variant)
    res = args.resolution or int(info["resolution"])
    model, variables = create_backbone(args.variant, 0, resolution=res)
    folded, configs = fold_backbone(model, variables)
    folded = fold_preprocess_into_stem(folded, res)
    plan = model.plan_configs()
    # last block index of each stage
    stage_end = {}
    for i, b in enumerate(plan):
        stage_end[b["stage"]] = i + 1
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.integers(0, 255, (args.batch, res, res, 3), np.int64)
        .astype(np.uint8)
    )
    scalar = jax.jit(lambda o: jnp.sum(o.astype(jnp.float32)))

    def timed(fn, label):
        f = jax.jit(fn)
        out = f(folded, images)
        _ = np.asarray(scalar(out))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = f(folded, images)
        _ = np.asarray(scalar(out))
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"{label:24s} {ms:8.2f} ms  ({args.batch / ms * 1e3:8.0f} img/s)",
              flush=True)
        return ms

    def prefix(end):
        def fn(f, x):
            h = folded_stem_pp(f, x)
            h = folded_blocks(f, configs, h, 0, end)
            # pooled tap readout (what the cascade actually consumes)
            return jnp.mean(h.astype(jnp.float32), axis=(1, 2))
        return fn

    def full(f, x):
        h = folded_stem_pp(f, x)
        h = folded_blocks(f, configs, h, 0, len(configs))
        return folded_head(f, h)

    total = timed(full, "full forward")
    for stage in sorted(stage_end):
        end = stage_end[stage]
        ms = timed(prefix(end), f"through stage {stage} (b{end})")
        print(f"    -> prefix fraction {ms / total:.2%}", flush=True)


if __name__ == "__main__":
    main()
