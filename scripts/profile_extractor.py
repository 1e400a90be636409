#!/usr/bin/env python
"""Per-part latency breakdown of the folded extractor on the real chip.

Times stem / per-stage block groups / head / match separately with the
tunnel-safe queued-dispatch pattern (queue N dispatches, one host fetch),
to locate where the e2e budget goes. Usage:

    python scripts/profile_extractor.py [--batch 1024] [--variant b0]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--variant", default="b0")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--gallery", type=int, default=1_000_000)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from fast_image_recognition_tpu.models import create_efficientnet
    from fast_image_recognition_tpu.models.inference import (
        fold_backbone,
        fold_preprocess_into_stem,
        folded_blocks,
        folded_head,
        folded_stem_pp,
        make_infer_fn,
    )
    from fast_image_recognition_tpu.ops.distance_kernel import pad_gallery, topk_l2

    res = {"b0": 224}.get(args.variant, 224)
    model, variables = create_efficientnet(args.variant, 0, resolution=res)
    folded, configs = fold_backbone(model, variables)
    folded = fold_preprocess_into_stem(folded, res)
    rng = np.random.default_rng(0)
    # upload uint8 (4x less tunnel traffic); the pp-folded stem consumes raw
    images = jnp.asarray(rng.integers(0, 255, (args.batch, res, res, 3), dtype=np.uint8))

    # Sync on a 4-byte scalar: fetching full activations (hundreds of MB)
    # over the tunnel would dominate the measurement.
    scalar = jax.jit(lambda o: jnp.sum(jax.tree.leaves(o)[0].astype(jnp.float32)))

    def timed(fn, *xs, label=""):
        f = jax.jit(fn)
        out = f(*xs)
        _ = np.asarray(scalar(out))  # compile + sync
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = f(*xs)
        _ = np.asarray(scalar(out))
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"{label:34s} {ms:8.2f} ms", flush=True)
        return out, ms

    # stage boundaries from the block names ('block{stage}{letter}')
    import re

    stages = {}
    for i, c in enumerate(configs):
        stage = int(re.match(r"block(\d+)", c["name"]).group(1))
        c["stage"] = stage
        stages.setdefault(stage, []).append(i)
    bounds = [(min(v), max(v) + 1) for _, v in sorted(stages.items())]

    total = 0.0
    h, ms = timed(
        lambda f, x: folded_stem_pp(f, x), folded, images, label="stem (pp folded)"
    )
    total += ms
    for s, e in bounds:
        h, ms = timed(
            lambda f, x, s=s, e=e: folded_blocks(f, configs, x, s, e),
            folded,
            h,
            label=f"blocks[{s}:{e}] (stage {configs[s]['stage']})",
        )
        total += ms
    emb, ms = timed(lambda f, x: folded_head(f, x), folded, h, label="head+pool")
    total += ms

    gal = rng.standard_normal((args.gallery, 1280), dtype=np.float32)
    gal /= np.linalg.norm(gal, axis=1, keepdims=True)
    gal_dev = pad_gallery(jnp.asarray(gal, jnp.bfloat16))

    def match(e, g):
        e = e / jnp.linalg.norm(e, axis=1, keepdims=True)
        return topk_l2(e, g, k=1, n_valid=args.gallery)

    _, ms = timed(match, emb, gal_dev, label=f"match ({args.gallery})")
    total += ms
    print(f"{'sum of parts':34s} {total:8.2f} ms")

    infer, folded2 = make_infer_fn(model, variables, resolution=res)

    def full(f, x, g):
        e = infer(f, x)["embedding"]
        e = e / jnp.linalg.norm(e, axis=1, keepdims=True)
        return topk_l2(e, g, k=1, n_valid=args.gallery)

    _, ms = timed(full, folded2, images, gal_dev, label="fused e2e")
    print(f"e2e images/sec: {args.batch / (ms / 1e3):,.0f}")


if __name__ == "__main__":
    main()
