#!/usr/bin/env python
"""End-to-end benchmark: EfficientNet-B0 extract + 1-NN match vs a large
gallery, on one chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "images/sec/chip", "vs_baseline": N}

Baseline target (BASELINE.json): >= 10,000 images/sec/chip end-to-end
(extract + match) against a 1M-row gallery. The pipeline is the round-trip
the reference splits across dnn_feature_extractor.py (extract) and
qt_cpp/db_features.cpp / ann.cpp (match): preprocess -> backbone pooled
embedding -> L2 normalize -> fused top-1 over the HBM-resident gallery.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 1)[0])


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--gallery", type=int, default=1_000_000)
    parser.add_argument("--batch", type=int, default=1024)
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--resolution", type=int, default=224)
    parser.add_argument("--variant", default="b0")
    parser.add_argument("--quick", action="store_true", help="small shapes for smoke runs")
    args = parser.parse_args()
    if args.quick:
        args.gallery = 50_000
        args.iters = 5
        args.batch = 256

    import jax
    import jax.numpy as jnp
    import numpy as np

    from fast_image_recognition_tpu.models import (
        create_efficientnet,
        preprocess_images,
    )
    from fast_image_recognition_tpu.ops.distance_kernel import pad_gallery, topk_l2

    res = args.resolution
    model, variables = create_efficientnet(args.variant, 0, resolution=res)
    emb_dim = 1280 if args.variant == "b0" else None

    # bf16 HBM-resident gallery (1M x 1280 = 2.6 GB)
    rng = np.random.default_rng(0)
    gal_host = rng.standard_normal((args.gallery, 1280), dtype=np.float32)
    gal_host /= np.linalg.norm(gal_host, axis=1, keepdims=True)
    gallery = pad_gallery(jnp.asarray(gal_host, jnp.bfloat16), 512)
    del gal_host

    def extract_and_match(variables, images, gallery):
        x = preprocess_images(images, res)
        emb = model.apply(variables, x, train=False)["embedding"]
        emb = emb / jnp.linalg.norm(emb, axis=1, keepdims=True)
        d, i = topk_l2(emb, gallery, k=1, n_valid=args.gallery)
        return d, i

    fn = jax.jit(extract_and_match)
    images = jnp.asarray(
        rng.integers(0, 255, (args.batch, res, res, 3)).astype(np.float32)
    )

    # warmup/compile. NOTE: on the axon TPU tunnel block_until_ready does
    # NOT synchronize; only a host transfer does. Timing therefore queues
    # `iters` dispatches (serialized on the device stream) and fetches the
    # LAST result — total time = iters * compute + one transfer/sync.
    out = fn(variables, images, gallery)
    _ = np.asarray(out[0])

    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = fn(variables, images, gallery)
    _ = np.asarray(out[0])
    dt = (time.perf_counter() - t0) / args.iters
    ips = args.batch / dt

    print(
        json.dumps(
            {
                "metric": (
                    f"images/sec/chip end-to-end (EfficientNet-{args.variant} "
                    f"extract + 1-NN match vs {args.gallery} gallery)"
                ),
                "value": round(ips, 1),
                "unit": "images/sec/chip",
                "vs_baseline": round(ips / 10_000.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
