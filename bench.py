#!/usr/bin/env python
"""Benchmarks for the five BASELINE.json configs, on one chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Default config ("e2e", what the driver runs) is the baseline target:
>= 10,000 images/sec/chip end-to-end (EfficientNet-B0 extract + fused 1-NN
match) against a 1M-row gallery — the round-trip the reference splits
across dnn_feature_extractor.py (extract) and qt_cpp/db_features.cpp /
ann.cpp (match).

Other configs (--config): 'bf' brute-force 1-NN match only; 'dem' the
directed-enumeration search at a 100k gallery; 'cascade' the sequential
early-exit pipeline over backbone segments; 'video' frame-set recognition
with per-video fusion.

Timing note: on the axon TPU tunnel block_until_ready does NOT synchronize;
every loop queues `iters` dispatches (serialized on the device stream) and
fetches the LAST result — total = iters * compute + one transfer.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 1)[0])


def _emit(metric: str, value: float, unit: str, baseline: float) -> None:
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(value, 1),
                "unit": unit,
                "vs_baseline": round(value / baseline, 3),
            }
        )
    )


def _make_gallery(n: int, dim: int, rng, tile: int = 1024):
    import jax.numpy as jnp

    from fast_image_recognition_tpu.ops.distance_kernel import pad_gallery

    gal = rng.standard_normal((n, dim), dtype=__import__("numpy").float32)
    gal /= __import__("numpy").linalg.norm(gal, axis=1, keepdims=True)
    return pad_gallery(jnp.asarray(gal, jnp.bfloat16), tile), gal


def bench_e2e(args) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fast_image_recognition_tpu.models import create_efficientnet
    from fast_image_recognition_tpu.models.inference import make_infer_fn
    from fast_image_recognition_tpu.ops.distance_kernel import topk_l2

    res = args.resolution
    model, variables = create_efficientnet(args.variant, 0, resolution=res)
    infer, folded = make_infer_fn(model, variables, resolution=res)
    rng = np.random.default_rng(0)
    gallery, _ = _make_gallery(args.gallery, 1280, rng)

    def extract_and_match(folded, images, gallery):
        emb = infer(folded, images)["embedding"]
        emb = emb / jnp.linalg.norm(emb, axis=1, keepdims=True)
        return topk_l2(emb, gallery, k=1, n_valid=args.gallery)

    fn = jax.jit(extract_and_match)
    variables = folded
    images = jnp.asarray(
        rng.integers(0, 255, (args.batch, res, res, 3)).astype(np.float32)
    )
    out = fn(variables, images, gallery)
    _ = np.asarray(out[0])
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = fn(variables, images, gallery)
    _ = np.asarray(out[0])
    ips = args.batch / ((time.perf_counter() - t0) / args.iters)
    _emit(
        f"images/sec/chip end-to-end (EfficientNet-{args.variant} extract + "
        f"1-NN match vs {args.gallery} gallery)",
        ips,
        "images/sec/chip",
        10_000.0,
    )


def bench_bf(args) -> None:
    """Config 1: brute-force 1-NN over precomputed features (match only)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fast_image_recognition_tpu.ops.distance_kernel import topk_l2

    rng = np.random.default_rng(0)
    gallery, gal_host = _make_gallery(args.gallery, 1536, rng)
    queries = jnp.asarray(gal_host[: args.batch] + 1e-3, jnp.float32)
    fn = jax.jit(lambda q, g: topk_l2(q, g, k=1, n_valid=args.gallery))
    out = fn(queries, gallery)
    _ = np.asarray(out[0])
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = fn(queries, gallery)
    _ = np.asarray(out[0])
    qps = args.batch / ((time.perf_counter() - t0) / args.iters)
    _emit(
        f"queries/sec/chip (fused brute-force 1-NN, D=1536, "
        f"{args.gallery} gallery)",
        qps,
        "queries/sec/chip",
        10_000.0,
    )


def bench_dem(args) -> None:
    """Config 3: DEM at a 100k gallery, budget 1%, gather probe mode."""
    import numpy as np

    from fast_image_recognition_tpu.data import make_gallery_and_probes
    from fast_image_recognition_tpu.search.dem import DirectedEnumerationMatcher

    n_classes = 1000
    g, gl, p, _ = make_gallery_and_probes(
        n_classes, max(args.gallery // n_classes, 2), 1, 1536, seed=0
    )
    matcher = DirectedEnumerationMatcher(g, gl, probe_mode="gather", seed=0)
    matcher.set_budget(int(0.01 * g.shape[0]))
    probes = p[: min(args.batch, len(p))]
    matcher.search(probes)  # compile
    t0 = time.perf_counter()
    for _ in range(args.iters):
        r = matcher.search(probes)
    qps = len(probes) * args.iters / (time.perf_counter() - t0)
    _emit(
        f"queries/sec/chip (DEM gather, budget 1%, {g.shape[0]} gallery, "
        f"checked {r.checked_fraction.mean()*100:.2f}%)",
        qps,
        "queries/sec/chip",
        10_000.0,
    )


def bench_cascade(args) -> None:
    """Config 4: sequential early-exit cascade over backbone segments."""
    import jax.numpy as jnp
    import numpy as np

    from fast_image_recognition_tpu.cascade.engine import (
        SequentialInferencePipeline,
    )
    from fast_image_recognition_tpu.models import (
        create_efficientnet,
        default_taps,
    )

    res = args.resolution
    model, variables = create_efficientnet(args.variant, 0, resolution=res)
    taps = tuple(default_taps(args.variant))
    probe = model.apply(variables, jnp.zeros((1, res, res, 3)), taps=taps)
    dims = [int(probe["taps"][t].shape[-1]) for t in taps] + [
        int(probe["embedding"].shape[-1])
    ]
    rng = np.random.default_rng(0)
    coefs = [rng.normal(0, 0.1, (100, d)).astype(np.float32) for d in dims]
    intercepts = [np.zeros(100, np.float32) for _ in dims]
    pipe = SequentialInferencePipeline(
        model, variables, taps, coefs, intercepts,
        thresholds=[0.0] * (len(dims) - 1), buckets=(args.batch,),
    )
    images = rng.normal(size=(args.batch, res, res, 3)).astype(np.float32)
    pipe.predict(images)  # compile all segments
    t0 = time.perf_counter()
    for _ in range(args.iters):
        r = pipe.predict(images)
    ips = args.batch * args.iters / (time.perf_counter() - t0)
    _emit(
        f"images/sec/chip (early-exit cascade, {len(dims)} levels, "
        f"breaks={np.round(r.break_counts, 2).tolist()})",
        ips,
        "images/sec/chip",
        10_000.0,
    )


def bench_video(args) -> None:
    """Config 5: video frame-set recognition with per-video fusion."""
    import numpy as np

    from fast_image_recognition_tpu.data.video_io import VideoDB
    from fast_image_recognition_tpu.data import make_gallery_and_probes
    from fast_image_recognition_tpu.evaluation.video import (
        video_log_posterior_fusion,
    )

    n_classes = 100
    g, gl, p, pl = make_gallery_and_probes(n_classes, 20, 20, 1536, seed=0)
    frame_video = pl.copy()
    num_videos = n_classes
    video_log_posterior_fusion(p, g, gl, frame_video, n_classes, num_videos)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        preds = video_log_posterior_fusion(
            p, g, gl, frame_video, n_classes, num_videos
        )
    fps = len(p) * args.iters / (time.perf_counter() - t0)
    _emit(
        f"frames/sec/chip (video frame-set recognition + log-posterior "
        f"fusion, {g.shape[0]} gallery, {num_videos} videos)",
        fps,
        "frames/sec/chip",
        10_000.0,
    )


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--config",
        default="e2e",
        choices=["e2e", "bf", "dem", "cascade", "video"],
        help="which BASELINE.json benchmark config to run",
    )
    parser.add_argument("--gallery", type=int, default=None)
    parser.add_argument("--batch", type=int, default=None)
    parser.add_argument("--iters", type=int, default=None)
    parser.add_argument("--resolution", type=int, default=224)
    parser.add_argument("--variant", default="b0")
    parser.add_argument("--quick", action="store_true", help="small shapes for smoke runs")
    args = parser.parse_args()

    defaults = {
        "e2e": dict(gallery=1_000_000, batch=1024, iters=20),
        "bf": dict(gallery=1_000_000, batch=1024, iters=20),
        "dem": dict(gallery=100_000, batch=128, iters=10),
        "cascade": dict(gallery=0, batch=256, iters=5),
        "video": dict(gallery=0, batch=0, iters=5),
    }[args.config]
    for k, v in defaults.items():
        if getattr(args, k) is None:
            setattr(args, k, v)
    if args.quick:
        args.gallery = min(args.gallery or 0, 50_000) or 0
        args.iters = max(2, args.iters // 4)
        if args.config in ("e2e", "bf"):
            args.batch = 256
        if args.config == "cascade":
            args.batch = 32
            args.resolution = 64

    {
        "e2e": bench_e2e,
        "bf": bench_bf,
        "dem": bench_dem,
        "cascade": bench_cascade,
        "video": bench_video,
    }[args.config](args)


if __name__ == "__main__":
    main()
