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
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 1)[0])

# bf16 peak of the target part (v5e ~197 TF/s); override for other chips.
PEAK_TFLOPS = float(os.environ.get("FIR_PEAK_TFLOPS", "197"))


def _emit(
    metric: str,
    value: float,
    unit: str,
    baseline: float,
    flops_per_iter: float = 0.0,
    sec_per_iter: float = 0.0,
) -> None:
    rec = {
        "metric": metric,
        "value": round(value, 1),
        "unit": unit,
        "vs_baseline": round(value / baseline, 3),
    }
    if flops_per_iter and sec_per_iter:
        tflops = flops_per_iter / sec_per_iter / 1e12
        rec["tflops"] = round(tflops, 1)
        rec["mfu"] = round(tflops / PEAK_TFLOPS, 3)
    print(json.dumps(rec))


def _backbone_flops(configs, folded, resolution: int, batch: int) -> float:
    """Exact conv/matmul FLOPs of one folded-forward dispatch, computed from
    the folded weight shapes (an XLA cost_analysis would need a second AOT
    compile, which stalls on the axon tunnel). Elementwise ops are excluded
    (lower-order terms)."""
    import numpy as np

    def conv_flops(h, w, kshape, stride, groups=1):
        kh, kw, cin, cout = kshape
        ho, wo = -(-h // stride), -(-w // stride)
        return 2.0 * ho * wo * kh * kw * cin * cout, ho, wo

    total = 0.0
    h = w = resolution
    stem_w = folded.get("stem_pp_w", folded["stem_w"])
    f, h, w = conv_flops(h, w, np.shape(stem_w), 2)
    total += f
    for p, cfg in zip(folded["blocks"], configs):
        if cfg["has_expand"]:
            f, _, _ = conv_flops(h, w, np.shape(p["w_exp"]), 1)
            total += f
        # depthwise kernel is [k, k, 1, Ce] (cin/groups = 1), so the plain
        # product is already the grouped count
        f, h, w = conv_flops(h, w, np.shape(p["w_dw"]), cfg["stride"])
        total += f
        if cfg["has_se"]:
            total += 2.0 * (
                np.prod(np.shape(p["w_se1"])) + np.prod(np.shape(p["w_se2"]))
            )
        f, _, _ = conv_flops(h, w, np.shape(p["w_proj"]), 1)
        total += f
    f, _, _ = conv_flops(h, w, np.shape(folded["head_w"]), 1)
    total += f
    return total * batch


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

    from fast_image_recognition_tpu.models import backbone_info, create_backbone
    from fast_image_recognition_tpu.models.inference import make_infer_fn
    from fast_image_recognition_tpu.ops.distance_kernel import topk_l2

    info = backbone_info(args.variant)
    res = args.resolution or int(info["resolution"])
    model, variables = create_backbone(args.variant, 0, resolution=res)
    if info["family"] == "inception_resnet_v2":
        # no BN-fold path for the inception family: plain module apply
        from fast_image_recognition_tpu.models.efficientnet import (
            TF_MODE_MEAN,
            TF_MODE_STD,
            preprocess_images,
        )

        def infer(variables, images):
            x = preprocess_images(images, res, TF_MODE_MEAN, TF_MODE_STD)
            return model.apply(variables, x, train=False)

        folded = variables
    else:
        infer, folded = make_infer_fn(model, variables, resolution=res)
    rng = np.random.default_rng(0)
    gallery, _ = _make_gallery(args.gallery, int(info["embedding_dim"]), rng)

    def extract_and_match(folded, images, gallery):
        emb = infer(folded, images)["embedding"]
        emb = emb / jnp.linalg.norm(emb, axis=1, keepdims=True)
        return topk_l2(emb, gallery, k=1, n_valid=args.gallery)

    fn = jax.jit(extract_and_match)
    # extractor convs (analytic, from folded shapes; MBConv families only)
    # + the match kernel's dominant matmul term (2*B*N*D). For the
    # inception family the backbone FLOPs aren't counted, so suppress the
    # tflops/mfu fields rather than report a misleading match-only figure.
    if info["family"] != "inception_resnet_v2":
        from fast_image_recognition_tpu.models.inference import fold_backbone

        _, configs = fold_backbone(model, variables)
        flops = _backbone_flops(configs, folded, res, args.batch) + (
            2.0 * args.batch * args.gallery * info["embedding_dim"]
        )
    else:
        flops = 0.0
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
    sec = (time.perf_counter() - t0) / args.iters
    ips = args.batch / sec
    _emit(
        f"images/sec/chip end-to-end ({args.variant} extract + "
        f"1-NN match vs {args.gallery} gallery)",
        ips,
        "images/sec/chip",
        10_000.0,
        flops_per_iter=flops,
        sec_per_iter=sec,
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
    # Pallas kernels are opaque to XLA's cost model; the distance matmul is
    # the dominant term: 2*B*N*D FLOPs (plus norms, a lower-order term).
    flops = 2.0 * args.batch * args.gallery * 1536
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = fn(queries, gallery)
    _ = np.asarray(out[0])
    sec = (time.perf_counter() - t0) / args.iters
    qps = args.batch / sec
    _emit(
        f"queries/sec/chip (fused brute-force 1-NN, D=1536, "
        f"{args.gallery} gallery)",
        qps,
        "queries/sec/chip",
        10_000.0,
        flops_per_iter=flops,
        sec_per_iter=sec,
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

    res = args.resolution or 224
    model, variables = create_efficientnet(args.variant, 0, resolution=res)
    taps = tuple(default_taps(args.variant))
    probe = model.apply(variables, jnp.zeros((1, res, res, 3)), taps=taps)
    dims = [int(probe["taps"][t].shape[-1]) for t in taps] + [
        int(probe["embedding"].shape[-1])
    ]
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    coefs = [rng.normal(0, 0.1, (100, d)).astype(np.float32) for d in dims]
    intercepts = [np.zeros(100, np.float32) for _ in dims]
    buckets = sorted({max(1, args.batch // 8), max(1, args.batch // 4),
                      max(1, args.batch // 2), args.batch})
    pipe = SequentialInferencePipeline(
        model, variables, taps, coefs, intercepts,
        thresholds=[3.4e38] * (len(dims) - 1), buckets=buckets,
    )
    # upload once — the serving loop predicts many batches per upload
    images = jnp.asarray(
        rng.normal(size=(args.batch, res, res, 3)).astype(np.float32)
    )
    # Calibrate each level's threshold to the median surviving max-score so
    # the measured run exercises a realistic cascading break distribution
    # (the reference FAR-tunes per level, sequential_inference.py:609-631).
    probe_scores = []
    carry = images
    for lvl in range(pipe.num_levels - 1):
        h, sc = pipe._get_seg(lvl)(pipe.variables, carry)
        probe_scores.append(float(np.median(np.asarray(sc).max(axis=1))))
        carry = h
    pipe.thresholds = probe_scores
    pipe.predict(images)  # compile all segments/buckets
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


_DEFAULTS = {
    "e2e": dict(gallery=1_000_000, batch=1024, iters=20),
    "bf": dict(gallery=1_000_000, batch=1024, iters=20),
    "dem": dict(gallery=100_000, batch=128, iters=10),
    "cascade": dict(gallery=0, batch=256, iters=5),
    "video": dict(gallery=0, batch=0, iters=5),
}

_RUNNERS = {
    "e2e": lambda a: bench_e2e(a),
    "bf": lambda a: bench_bf(a),
    "dem": lambda a: bench_dem(a),
    "cascade": lambda a: bench_cascade(a),
    "video": lambda a: bench_video(a),
}


def _apply_defaults(args, config: str):
    import copy

    a = copy.copy(args)
    a.config = config
    for k, v in _DEFAULTS[config].items():
        if getattr(a, k) is None:
            setattr(a, k, v)
    if a.quick:
        a.gallery = min(a.gallery or 0, 50_000) or 0
        a.iters = max(2, a.iters // 4)
        if config in ("e2e", "bf"):
            a.batch = 256
        if config == "cascade":
            a.batch = 32
            a.resolution = 64
    return a


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--config",
        default="e2e",
        choices=["e2e", "bf", "dem", "cascade", "video"],
        help="which BASELINE.json benchmark config to run",
    )
    parser.add_argument(
        "--all",
        action="store_true",
        help="run every config, one JSON line each (e2e last)",
    )
    parser.add_argument("--gallery", type=int, default=None)
    parser.add_argument("--batch", type=int, default=None)
    parser.add_argument("--iters", type=int, default=None)
    parser.add_argument("--resolution", type=int, default=None, help="default: the backbone family's native resolution")
    parser.add_argument("--variant", default="b0")
    parser.add_argument("--quick", action="store_true", help="small shapes for smoke runs")
    args = parser.parse_args()

    if args.all:
        for config in ("bf", "dem", "cascade", "video", "e2e"):
            _RUNNERS[config](_apply_defaults(args, config))
            sys.stdout.flush()
    else:
        _RUNNERS[args.config](_apply_defaults(args, args.config))


if __name__ == "__main__":
    main()
