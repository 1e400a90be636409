#!/usr/bin/env python
"""Benchmarks for the five BASELINE.json configs, on one chip.

Prints ONE JSON line per config:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N, ...}
with accuracy fields alongside throughput — the reference never prints a
latency without an error rate (qt_cpp/ann.cpp:106-107):
  error_pct      — top-1 retrieval/recognition error on the synthetic
                   labeled workload (planted near-matches)
  agreement_pct  — exact-prediction agreement between the shipped fast
                   path and the fp32 exact/sequential oracle path
  checked_pct / break_counts / forced_pct where applicable.

Default config ("e2e", what the driver runs) is the baseline target:
>= 10,000 images/sec/chip end-to-end (EfficientNet-B0 extract + 1-NN
match) against a 1M-row gallery — the round-trip the reference splits
across dnn_feature_extractor.py (extract) and qt_cpp/db_features.cpp /
ann.cpp (match). The default match path is PCA-256 candidate generation
(ops/pca.py — the reference's own loader-side PCA, db_features.cpp:164)
with full-D bf16 rescoring of the top candidates; --match exact keeps the
full-D brute-force kernel. Both report agreement vs the fp32 exact path.

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
    **extra,
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
    for k, v in extra.items():
        if v is not None:
            rec[k] = round(v, 3) if isinstance(v, float) else v
    print(json.dumps(rec))


def _normalize(x):
    import numpy as np

    return x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-30)


def _perturbed_copies(emb: "np.ndarray", rng, noise_frac: float):
    """Perturbed copy of each query embedding, to plant at a known gallery
    row — the true 1-NN is then well-defined (recognition semantics: the
    gallery contains the identity) so ``error_pct`` is measurable. The
    perturbation is scaled PER QUERY to ``noise_frac`` of that query's
    distance to its nearest other query: untrained-backbone embeddings
    nearly collapse to one direction, so a fixed noise would swamp the
    inter-query separation and make the "true" row not actually the
    nearest — this keeps each planted row the unambiguous NN while still
    not being a bitwise duplicate."""
    import numpy as np

    d2 = (
        np.sum(emb * emb, 1)[:, None]
        + np.sum(emb * emb, 1)[None, :]
        - 2.0 * emb @ emb.T
    )
    np.fill_diagonal(d2, np.inf)
    r = np.sqrt(np.maximum(d2.min(axis=1), 1e-20))  # nearest-other-query
    return _normalize(
        emb
        + (noise_frac * r)[:, None]
        * _normalize(rng.standard_normal(emb.shape).astype(np.float32))
    )


def _planted_gallery_device(
    n: int, emb: "np.ndarray", seed: int = 1, noise_frac: float = 0.2
):
    """Device-built planted gallery (the [N, D] rows never exist on the
    host) — a multi-GB gallery upload over the tunneled device costs
    minutes; building on device is one dispatch. Returns (bf16 gallery
    [n_pad, D] device array, true_idx). Rows are generated directly in
    bf16 and row-normalized with fp32 accumulation; planted rows come from
    ``_perturbed_copies`` in fp32. n_pad rounds up to the kernel tile (pad
    rows are masked by n_valid everywhere).

    When query embeddings are given, the non-planted rows are drawn from
    the SAME distribution as the queries — ``normalize(c + s*noise)`` with
    ``c`` the query mean and ``s`` the query spread — matching recognition
    semantics (the gallery IS the same extractor's output,
    db_features.cpp:44-116 loads one feature file for both sides). This is
    load-bearing for the fast match paths: untrained backbones emit
    near-collapsed embeddings (IRv2: inter-query dist^2 ~2e-4 around a
    unit-norm mean), and an isotropic random gallery hides that common
    direction from the service's PCA mean — the bf16 candidate scan then
    rounds away the entire planted margin (measured: 16% agreement). A
    same-distribution gallery lets mean-centering remove the collapse,
    exactly as it does on real galleries."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    b, dim = emb.shape
    n_pad = -(-n // 1024) * 1024
    rng = np.random.default_rng(seed)
    true_idx = rng.choice(n, size=b, replace=False)

    if b:
        planted = _perturbed_copies(emb, rng, noise_frac)
        center = emb.mean(axis=0).astype(np.float32)
        # RMS query-to-center distance = the cluster scale s
        spread = float(
            np.sqrt(np.mean(np.sum((emb - center) ** 2, axis=1)))
        )
        spread = max(spread, 1e-20)
    else:  # plain gallery, nothing to plant (bf config makes its own queries)
        planted = emb
        center = np.zeros((dim,), np.float32)
        spread = 1.0

    # fp32 row generation chunked so the intermediate stays ~100s of MB
    # (a full fp32 [1M, 1536] draw would hold 6 GB next to the 3 GB output)
    chunk = 1024
    while chunk * 2 <= 65536 and n_pad % (chunk * 2) == 0:
        chunk *= 2
    n_chunks = n_pad // chunk

    @jax.jit
    def build(key, planted, rows, center, spread):
        keys = jax.random.split(key, n_chunks)

        def mk(k):
            noise = jax.random.normal(k, (chunk, dim), jnp.float32)
            rowsf = center[None, :] + spread * noise
            inv = jax.lax.rsqrt(
                jnp.maximum(
                    jnp.einsum(
                        "nd,nd->n", rowsf, rowsf,
                        preferred_element_type=jnp.float32,
                    ),
                    1e-30,
                )
            )
            return (rowsf * inv[:, None]).astype(jnp.bfloat16)

        g = jax.lax.map(mk, keys).reshape(n_pad, dim)
        return g.at[rows].set(planted.astype(jnp.bfloat16))

    gal = build(
        jax.random.PRNGKey(seed),
        jnp.asarray(planted),
        jnp.asarray(true_idx, jnp.int32),
        jnp.asarray(center),
        jnp.float32(spread),
    )
    return gal, true_idx


def _class_structured_gallery_device(
    n: int, class_embs: "np.ndarray", sigma: float, seed: int = 1
):
    """Device-built gallery with CLASS STRUCTURE: ``K`` enrolled
    identities (real extractor embeddings of unseen synthetic classes),
    each with ~n/K rows = normalize(e_c + sigma * noise) — the
    many-images-per-identity regime of the reference's LFW/CASIA galleries
    (qt_cpp/db.h:13-69), with sigma the MEASURED intra-class embedding
    spread of the same generator. Returns (bf16 gallery [n_pad, D],
    labels [n_pad] int32 host; pad rows labeled -1).

    This replaces the isotropic planted gallery for trained checkpoints:
    isotropic rows at probe-cloud spread have a heavy cosine tail (among
    1M draws some land close to ANY query), which collapses the 1-NN
    runner-up margin (d2 ~ d1) and forbids any ratio-rule early exit —
    a workload artifact real galleries don't have (real rows cluster
    around identity directions)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    k, dim = class_embs.shape
    n_pad = -(-n // 1024) * 1024
    # CONTIGUOUS class layout (class c owns rows [c*m, (c+1)*m)): the
    # match's candidate set is one argmin per gallery tile, so a class
    # confined to <=ceil(m/tile)+1 tiles can occupy at most that many
    # candidate slots — the class-aware ratio rule always sees a real
    # nearest-other-class runner-up. (An interleaved layout lets the
    # top-1 class win EVERY selected tile — measured: d2=inf floods,
    # ratio-insensitive overconfident exits at +10pts error.)
    m = -(-n_pad // k)  # rows per class (last class padded short)
    labels = np.repeat(np.arange(k, dtype=np.int32), m)[:n_pad]
    labels[n:] = -1
    chunk = 1024
    while chunk * 2 <= 65536 and n_pad % (chunk * 2) == 0:
        chunk *= 2
    n_chunks = n_pad // chunk

    @jax.jit
    def build(key, embs, labs):
        keys = jax.random.split(key, n_chunks)
        labs2 = labs.reshape(n_chunks, chunk)

        def mk(args):
            lab_row, kk = args
            e = jnp.take(embs, lab_row, axis=0)
            # per-coordinate scale sigma/sqrt(D): a D-dim standard normal
            # has norm ~sqrt(D), so an unscaled sigma*n would displace
            # rows by sigma*sqrt(D) (~17 at D=1280) and drown the
            # identity direction entirely
            rows = e + (sigma / float(np.sqrt(dim))) * jax.random.normal(
                kk, (chunk, dim), jnp.float32
            )
            inv = jax.lax.rsqrt(
                jnp.maximum(
                    jnp.einsum(
                        "nd,nd->n", rows, rows,
                        preferred_element_type=jnp.float32,
                    ),
                    1e-30,
                )
            )
            return (rows * inv[:, None]).astype(jnp.bfloat16)

        return jax.lax.map(mk, (labs2, keys)).reshape(n_pad, dim)

    gal = build(
        jax.random.PRNGKey(seed),
        jnp.asarray(class_embs, jnp.float32),
        jnp.asarray(np.maximum(labels, 0)),
    )
    return gal, labels


def _exact_fp32_nn(queries, gal, n_valid: int):
    """fp32 `precise` Pallas path over the (device, bf16-stored) gallery —
    the math-precision oracle, computed once outside the timing loop. The
    fp32 cast lives on device only and is freed afterwards."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fast_image_recognition_tpu.ops.distance_kernel import (
        pad_gallery,
        topk_l2,
    )

    if isinstance(gal, jax.Array) and gal.dtype == jnp.bfloat16:
        gal32 = jax.jit(lambda g: g.astype(jnp.float32))(gal)
    else:
        gal32 = pad_gallery(jnp.asarray(gal, jnp.float32))
    out = []
    q = jnp.asarray(queries, jnp.float32)
    for s in range(0, q.shape[0], 256):
        _, idx = topk_l2(q[s : s + 256], gal32, k=1, n_valid=n_valid, precise=True)
        out.append(np.asarray(idx)[:, 0])
    del gal32
    return np.concatenate(out)


def _find_ckpt(args, res: int):
    """Resolve --ckpt: a path, 'none', or 'auto' (newest trained checkpoint
    for this variant/resolution under benchmarks/)."""
    import glob
    import os

    if args.ckpt == "none":
        return None
    if args.ckpt != "auto":
        return args.ckpt
    pat = f"benchmarks/trained_{args.variant}_{res}_synthetic*.npz"
    hits = sorted(glob.glob(pat), key=os.path.getmtime)
    return hits[-1] if hits else None


def _load_trained(model, variables, ckpt: str):
    """Restore a MultiExitTrainer checkpoint (params/batch_stats/heads)
    into backbone variables (heads are classifier-side, not needed for
    the embedding serving surface)."""
    from fast_image_recognition_tpu.utils.checkpoint import load_variables

    state = load_variables(ckpt)
    return {"params": state["params"], "batch_stats": state["batch_stats"]}


def _synthetic_probe_images(batch: int, res: int, seed: int, per_class=1):
    """uint8 probe batch rendered ON DEVICE from ``batch``/per_class UNSEEN
    texture classes (class seed disjoint from the training driver's seed 0)
    — recognition semantics: the gallery enrolls identities the extractor
    was not trained on (the reference trains on one dataset and serves
    LFW/CASIA galleries, qt_cpp/db.h:4-11)."""
    from fast_image_recognition_tpu.data.synthetic_device import (
        device_dataset,
    )

    classes = -(-batch // per_class)
    imgs, _ = device_dataset(
        classes, per_class, res, seed=seed, class_seed=seed, chunk=256
    )
    return imgs[:batch]


def bench_e2e(args) -> None:
    """Config 2: the RecognitionService product surface — folded extract +
    fused 1-NN match (PCA candidates + full-D rescore, or exact) in one
    jitted program per batch. With a trained checkpoint present
    (cli/train_serving_backbone.py), probes are device-rendered images of
    UNSEEN synthetic classes and ``--extract auto`` also runs the
    early-exit cascade against the plain path on the same workload."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fast_image_recognition_tpu.models import backbone_info, create_backbone
    from fast_image_recognition_tpu.models.fold import make_serving_fn
    from fast_image_recognition_tpu.serving import RecognitionService
    from fast_image_recognition_tpu.utils.flops import fn_flops

    info = backbone_info(args.variant)
    res = args.resolution or int(info["resolution"])
    model, variables = create_backbone(args.variant, 0, resolution=res)
    ckpt = _find_ckpt(args, res)
    trained = ckpt is not None
    if trained:
        variables = _load_trained(model, variables, ckpt)
    serve, sparams = make_serving_fn(
        model, variables, info, resolution=res, folded=True
    )
    rng = np.random.default_rng(0)
    n = args.gallery
    gal_labels = None
    tap_galleries = None
    extract = args.extract
    if extract == "auto":
        extract = "both" if trained else "exact"
    if trained:
        # exit taps resolved up front: the workload builder extracts
        # per-level tap embeddings in the same pass when the cascade runs
        cascade_taps = (
            args.exit_taps.split(",")
            if args.exit_taps
            else ["block3a", "block4a", "block5c"]
        )
        need_taps = cascade_taps if extract in ("cascade", "both") else None
        w = _trained_recognition_workload(
            args, res, serve, sparams, taps=need_taps,
            model=model, variables=variables,
        )
        images, emb0, calib_probe = w["images"], w["emb0"], w["calib_probe"]
        gallery, gal_labels, truth = w["gallery"], w["labels"], w["truth"]
        tap_galleries = w.get("tap_galleries")
    else:
        # serving-realistic uint8 input: 4x less HBM read in the
        # (preprocess-folded) stem than an fp32 image batch, identical math
        images = jnp.asarray(
            rng.integers(0, 255, (args.batch, res, res, 3), dtype=np.int64)
            .astype(np.uint8)
        )
        emb_fn = jax.jit(lambda v, im: serve(v, im)["embedding"])
        emb0 = _normalize(np.asarray(emb_fn(sparams, images), np.float32))
        gallery, true_idx = _planted_gallery_device(args.gallery, emb0)
        truth = ("row", None, true_idx)

    if extract in ("cascade", "both"):
        plain_ips = None
        if extract == "both":
            plain_ips = _bench_e2e_plain(
                args, model, variables, info, serve, sparams, gallery,
                images, emb0, truth, res, n
            )
        _bench_e2e_cascade(args, model, variables, info, gallery, images,
                           emb0, truth, res, n, ckpt=ckpt,
                           plain_ips=plain_ips, gal_labels=gal_labels,
                           calib_probe=calib_probe if trained else None,
                           tap_galleries=tap_galleries)
        return
    _bench_e2e_plain(args, model, variables, info, serve, sparams, gallery,
                     images, emb0, truth, res, n)


def _trained_recognition_workload(
    args, res: int, serve, sparams, taps=None, model=None, variables=None,
) -> dict:
    """RECOGNITION workload for trained checkpoints: K unseen identities
    rendered at 2 instances each — instance 0 enrolls (its embedding
    seeds ~n/K class-clustered gallery rows at the MEASURED intra-class
    spread), instance 1 probes. Error = gallery label of the 1-NN vs the
    probe's identity (the reference's recognition error,
    qt_cpp/ann.cpp:106), not row identity. Also returns a
    capacity-calibration batch of fresh instances of ENROLLED identities
    disjoint from the probe identities (classes [batch, 2*batch)) —
    calibrating on un-enrolled identities would measure all-survive and
    size the cascade useless."""
    import jax
    import numpy as np

    from fast_image_recognition_tpu.data.synthetic_device import (
        device_dataset,
    )

    n = args.gallery
    k = args.gallery_classes
    assert k >= 2 * args.batch, "need >= 2*batch enrolled identities"
    pair_imgs, _ = device_dataset(
        k, 2, res, seed=11000, class_seed=3000, chunk=256
    )
    if taps:
        # one pass extracts final embeddings AND per-tap GAP embeddings —
        # the per-level galleries of the level-gallery cascade (the
        # reference's x_train_all[level], sequential_inference.py:816-850)
        from fast_image_recognition_tpu.serving import make_tap_embed_fn

        fwd = make_tap_embed_fn(model, variables, res, taps)
        feat_chunks = None
        emb_chunks = []
        for s in range(0, 2 * k, 1024):
            f, e = fwd(pair_imgs[s : s + 1024])
            if feat_chunks is None:
                feat_chunks = [[] for _ in f]
            for j, t in enumerate(f):
                feat_chunks[j].append(np.asarray(t, np.float32))
            emb_chunks.append(np.asarray(e, np.float32))
        embs = _normalize(np.concatenate(emb_chunks))
        tap_embs = [
            _normalize(np.concatenate(c)) for c in feat_chunks
        ]
    else:
        emb_fn = jax.jit(lambda v, im: serve(v, im)["embedding"])
        embs = _normalize(np.concatenate([
            np.asarray(emb_fn(sparams, pair_imgs[s : s + 1024]), np.float32)
            for s in range(0, 2 * k, 1024)
        ]))
        tap_embs = None
    enroll, probe_emb = embs[0::2], embs[1::2]
    sigma = float(
        np.median(np.linalg.norm(enroll - probe_emb, axis=1))
    ) / np.sqrt(2.0)
    images = pair_imgs[1 : 2 * args.batch : 2]  # instance-1 rows
    calib_probe = pair_imgs[2 * args.batch + 1 : 4 * args.batch : 2]
    del pair_imgs
    gallery, gal_labels = _class_structured_gallery_device(n, enroll, sigma)
    tap_galleries = None
    tap_sigmas = None
    if tap_embs is not None:
        tap_galleries = []
        tap_sigmas = []
        for te in tap_embs:
            s_l = float(
                np.median(np.linalg.norm(te[0::2] - te[1::2], axis=1))
            ) / np.sqrt(2.0)
            g_l, lab_l = _class_structured_gallery_device(n, te[0::2], s_l)
            assert np.array_equal(lab_l, gal_labels)
            tap_galleries.append(g_l)
            tap_sigmas.append(round(s_l, 4))
    print(json.dumps({
        "workload": "class-structured gallery",
        "identities": k,
        "rows_per_identity": -(-n // k),
        "intra_sigma": round(sigma, 4),
        "taps": taps,
        "tap_sigmas": tap_sigmas,
    }), file=sys.stderr)
    return {
        "images": images,
        "emb0": probe_emb[: args.batch],
        "calib_probe": calib_probe,
        "gallery": gallery,
        "labels": gal_labels,
        "truth": ("label", gal_labels, np.arange(args.batch)),
        "sigma": sigma,
        "enroll": enroll,
        "tap_galleries": tap_galleries,
    }


def _truth_error_pct(idx_fast, truth) -> float:
    """Workload error: row identity for planted galleries, gallery LABEL
    for class-structured ones (recognition semantics)."""
    import numpy as np

    kind, gal_labels, target = truth
    if kind == "label":
        return 100.0 * float(np.mean(gal_labels[idx_fast] != target))
    return 100.0 * float(np.mean(idx_fast != target))


def _bench_e2e_plain(
    args, model, variables, info, serve, sparams, gallery, images, emb0,
    truth, res: int, n: int,
) -> float:
    import numpy as np

    from fast_image_recognition_tpu.serving import RecognitionService
    from fast_image_recognition_tpu.utils.flops import fn_flops

    service = RecognitionService(
        model, variables, info, gallery,
        n_valid=n, resolution=res, match=args.match,
        pca_dim=args.pca_dim, rescore=args.rescore,
        pca_scan=args.pca_scan, select=args.select,
        serving_fn=(serve, sparams),
    )
    match_desc = {
        "pca": f"pca{args.pca_dim}[{args.pca_scan}]+rescore{args.rescore}"
        + ("+approxk" if args.select == "approx" else ""),
        "exact": "exact bf16",
        "int8": "int8 scan+rescore",
    }[args.match]
    backbone_flops = fn_flops(
        lambda v, im: serve(v, im)["embedding"], sparams, images
    )
    flops = backbone_flops + service.match_flops(args.batch)

    idx_fast = np.asarray(service.identify_device(images))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = service.identify_device(images)
    _ = np.asarray(out)
    sec = (time.perf_counter() - t0) / args.iters
    ips = args.batch / sec

    idx_exact = _exact_fp32_nn(emb0, gallery, n)
    error_pct = _truth_error_pct(idx_fast, truth)
    agreement_pct = 100.0 * float(np.mean(idx_fast == idx_exact))
    _emit(
        f"images/sec/chip end-to-end ({args.variant} extract + 1-NN "
        f"{match_desc} vs {n} gallery)",
        ips,
        "images/sec/chip",
        10_000.0,
        flops_per_iter=flops,
        sec_per_iter=sec,
        error_pct=error_pct,
        agreement_pct=agreement_pct,
    )
    return ips


def _bench_e2e_cascade(
    args, model, variables, info, gallery, images, emb0, truth,
    res: int, n: int, ckpt=None, plain_ips=None, gal_labels=None,
    calib_probe=None, tap_galleries=None,
) -> None:
    """--extract cascade: the early-exit serving path
    (serving.CascadeRecognitionService) on the same planted workload as
    the exact e2e — ratio-rule exits on readout-predicted embeddings, one
    dispatch per batch. Audited exactly like the exact path: error vs the
    planted truth, agreement vs the fp32 exact scan of the FULL path.
    With a trained checkpoint, readouts fit and capacities calibrate on
    device-rendered images of held-out classes (disjoint from both the
    training classes and the probe classes)."""
    import numpy as np

    from fast_image_recognition_tpu.serving import CascadeRecognitionService

    taps = args.exit_taps.split(",") if args.exit_taps else None
    if ckpt is not None and tap_galleries is not None:
        # LEVEL-GALLERY mode: each exit level matches its own tap
        # embedding against a gallery built in that tap's space — no
        # readout error; level confidence is the tap's own 1-NN margin
        taps = taps or ["block3a", "block4a", "block5c"]
        calib_fit = None
        calib_images = calib_probe
    elif ckpt is not None:
        # readout-fit pool: unseen classes, disjoint from probe classes
        # (the readout is a class-agnostic tap->embedding regression)
        calib_fit = _synthetic_probe_images(
            min(2048, 2 * args.batch), res, seed=5000, per_class=2
        )
        calib_images = calib_probe
    else:
        rng = np.random.default_rng(1)
        calib_fit = None
        calib_images = rng.integers(
            0, 255, images.shape, dtype=np.int64
        ).astype(np.uint8)
    svc = CascadeRecognitionService(
        model, variables, info, gallery,
        n_valid=n, resolution=res, taps=taps, grid=args.grid,
        pca_dim=args.pca_dim, rescore=args.rescore,
        ratio=args.cascade_ratio, calib_images=calib_fit,
        galleries=tap_galleries,
        # class-structured galleries: the ratio rule must compare against
        # the nearest OTHER-IDENTITY candidate (d2_rule='class'), since
        # the runner-up row usually shares the top-1's class
        labels=gal_labels, d2_rule="row" if gal_labels is None else "class",
    )
    # calibrate capacities on a HELD-OUT draw (ADVICE r4): fitting them to
    # the measured batch guarantees forced_fraction ~ 0 by construction
    fracs = svc.calibrate(calib_images, slack=args.slack)
    caps = svc.capacities_for(args.batch)

    out = svc.identify_device(images)  # compile + warm
    packed = np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = svc.identify_device(images)
    packed = np.asarray(out)
    sec = (time.perf_counter() - t0) / args.iters
    ips = args.batch / sec

    b = args.batch
    idx_fast = packed[:b].astype(np.int64)
    exit_level = packed[b : 2 * b]
    idx_exact = _exact_fp32_nn(emb0, gallery, n)
    if truth[0] == "label":
        # early-exited probes return a LEVEL-gallery row; rows align only
        # through their identity label, so agreement with the exact path
        # is label agreement (the recognition answer)
        agreement = 100.0 * float(
            np.mean(gal_labels[idx_fast] == gal_labels[idx_exact])
        )
    else:
        agreement = 100.0 * float(np.mean(idx_fast == idx_exact))
    extra = {}
    if plain_ips:
        extra["speedup_vs_plain"] = round(ips / plain_ips, 3)
    if ckpt:
        extra["ckpt"] = ckpt.rsplit("/", 1)[-1]
    _emit(
        f"images/sec/chip end-to-end ({args.variant} cascade-extract "
        f"taps={'/'.join(svc.taps)} ratio={svc.ratio} + 1-NN "
        f"pca{svc.pca_dim}[packed]+rescore{svc.rescore} vs {n} gallery)",
        ips,
        "images/sec/chip",
        10_000.0,
        sec_per_iter=sec,
        error_pct=_truth_error_pct(idx_fast, truth),
        agreement_pct=agreement,
        exit_fractions=(
            np.bincount(exit_level, minlength=svc.num_levels) / b
        ).round(4).tolist(),
        survivor_fractions=[round(f, 4) for f in fracs],
        capacities=list(caps),
        forced_fraction=round(float(packed[2 * b]) / b, 4),
        **extra,
    )


def bench_noise_sweep(args) -> None:
    """Accuracy-margin audit (VERDICT r3 #6): sweep the planted-NN noise
    from easy (0.2x the nearest-other-query distance) to near-ambiguous
    (0.95x) and print error/agreement for each shipped fast match path —
    the margin CURVE, not a single easy operating point. The reference
    prints error next to every latency (qt_cpp/ann.cpp:106-107); this is
    the stress-test version of that discipline.

    Only the match path is under audit (extract is deterministic), so the
    backbone is bypassed: embeddings are computed once and fed through a
    pass-through serving fn, exercising the exact production match code of
    ``RecognitionService`` with zero backbone compiles."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fast_image_recognition_tpu.models import backbone_info, create_backbone
    from fast_image_recognition_tpu.models.fold import make_serving_fn
    from fast_image_recognition_tpu.serving import RecognitionService

    info = backbone_info(args.variant)
    res = args.resolution or int(info["resolution"])
    model, variables = create_backbone(args.variant, 0, resolution=res)
    ckpt = _find_ckpt(args, res)
    if ckpt is not None:
        variables = _load_trained(model, variables, ckpt)
    serve, sparams = make_serving_fn(
        model, variables, info, resolution=res, folded=True
    )
    rng = np.random.default_rng(0)
    if ckpt is not None:
        images = _synthetic_probe_images(
            args.batch, res, seed=1000 + args.batch
        )
    else:
        images = jnp.asarray(
            rng.integers(0, 255, (args.batch, res, res, 3), dtype=np.int64)
            .astype(np.uint8)
        )
    emb_fn = jax.jit(lambda v, im: serve(v, im)["embedding"])
    emb0 = _normalize(np.asarray(emb_fn(sparams, images), np.float32))
    n = args.gallery

    # pass-through "backbone": images ARE the embeddings
    passthrough = (lambda v, im: {"embedding": im}, None)
    modes = [
        # default path: packed scan + second-min certificate + lax.cond
        # escalation to the exact scan on uncertified probes (r5)
        ("e2e-packed", dict(match="pca", pca_scan="packed", select="exact")),
        ("packed-noesc", dict(match="pca", pca_scan="packed",
                              select="exact", escalate=None)),
        ("approx-select", dict(match="pca", pca_scan="packed",
                               select="approx")),
        ("int8", dict(match="int8")),
    ]
    noises = [float(x) for x in args.noise_sweep.split(",")]
    gallery = None
    for noise in noises:
        del gallery  # free the previous point's 2.6 GB BEFORE the rebuild
        gallery, true_idx = _planted_gallery_device(
            n, emb0, noise_frac=noise
        )
        idx_exact = _exact_fp32_nn(emb0, gallery, n)
        # how hard is this point? fp32 oracle error vs the planted truth
        oracle_err = 100.0 * float(np.mean(idx_exact != true_idx))
        for name, kw in modes:
            svc = RecognitionService(
                None, None, info, gallery, n_valid=n, resolution=res,
                pca_dim=args.pca_dim, rescore=args.rescore,
                pca_sample=2048, serving_fn=passthrough, **kw,
            )
            idx_fast = np.asarray(svc.identify_device(jnp.asarray(emb0)))
            # free the derived match assets (int8/packed copies) before
            # the next mode builds its own — HBM holds ONE mode at a time
            del svc
            print(json.dumps({
                "metric": f"noise-margin audit ({name})",
                "noise_frac": noise,
                "gallery": n,
                "error_pct": round(
                    100.0 * float(np.mean(idx_fast != true_idx)), 3
                ),
                "agreement_pct": round(
                    100.0 * float(np.mean(idx_fast == idx_exact)), 3
                ),
                "oracle_error_pct": round(oracle_err, 3),
            }))
            sys.stdout.flush()


def bench_bf(args) -> None:
    """Config 1: brute-force 1-NN over precomputed features (match only)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fast_image_recognition_tpu.ops.distance_kernel import topk_l2

    dim = 1536
    # device-built workload: queries are noisy copies of the first `batch`
    # gallery rows, so the true NN of query i is row i
    gallery, _ = _planted_gallery_device(args.gallery, np.zeros((0, dim), np.float32))

    @jax.jit
    def mkq(g, key):
        q = g[: args.batch].astype(jnp.float32) + 1e-2 * jax.random.normal(
            key, (args.batch, dim), jnp.float32
        )
        return q / jnp.linalg.norm(q, axis=1, keepdims=True)

    queries = mkq(gallery, jax.random.PRNGKey(7))
    if args.quant:
        # int8 scan + exact bf16 rescore: half the HBM stream, 2x MXU peak
        from fast_image_recognition_tpu.ops.distance_kernel import (
            gallery_sq_norms,
            quant_gallery_scales,
            topk_l2_quant,
        )
        from fast_image_recognition_tpu.ops.quant import quantize_rows

        gal_q, scales = jax.jit(quantize_rows)(gallery)
        gsq = jax.jit(
            lambda g: gallery_sq_norms(g, args.gallery)
        )(gallery)
        gsc = jax.jit(
            lambda s: quant_gallery_scales(s, args.gallery)
        )(scales)
        fn = jax.jit(
            lambda q, gq, g: topk_l2_quant(
                q, gq, gsq, gsc, g, k=1, r=16, compute=args.quant_compute
            )
        )
        run = lambda: fn(queries, gal_q, gallery)  # noqa: E731
        desc = f"int8-scan+rescore ({args.quant_compute})"
    else:
        fn = jax.jit(lambda q, g: topk_l2(q, g, k=1, n_valid=args.gallery))
        run = lambda: fn(queries, gallery)  # noqa: E731
        desc = "fused brute-force"
    out = run()
    idx_fast = np.asarray(out[1])[:, 0]
    # Pallas kernels are opaque to XLA's cost model; the distance matmul is
    # the dominant term: 2*B*N*D FLOPs (plus norms, a lower-order term).
    flops = 2.0 * args.batch * args.gallery * dim
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = run()
    _ = np.asarray(out[0])
    sec = (time.perf_counter() - t0) / args.iters
    qps = args.batch / sec
    idx_exact = _exact_fp32_nn(queries, gallery, args.gallery)
    _emit(
        f"queries/sec/chip ({desc} 1-NN, D=1536, "
        f"{args.gallery} gallery)",
        qps,
        "queries/sec/chip",
        10_000.0,
        flops_per_iter=flops,
        sec_per_iter=sec,
        error_pct=100.0 * float(np.mean(idx_fast != np.arange(args.batch))),
        agreement_pct=100.0 * float(np.mean(idx_fast == idx_exact)),
    )


def bench_dem(args) -> None:
    """Config 3: DEM at a 100k gallery, budget 1%, gather probe mode."""
    import jax.numpy as jnp
    import numpy as np

    from fast_image_recognition_tpu.data import make_gallery_and_probes
    from fast_image_recognition_tpu.search.dem import DirectedEnumerationMatcher

    n_classes = 1000
    g, gl, p, pl = make_gallery_and_probes(
        n_classes, max(args.gallery // n_classes, 2), 1, 1536, seed=0
    )
    matcher = DirectedEnumerationMatcher(g, gl, probe_mode="gather", seed=0)
    matcher.set_budget(int(0.01 * g.shape[0]))
    probes = jnp.asarray(p[: min(args.batch, len(p))], jnp.float32)
    b = int(probes.shape[0])
    # accuracy once (includes a host sync), then tunnel-safe queued timing
    idx, _, checked = (np.asarray(x) for x in matcher.search_device(probes))
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = matcher.search_device(probes)
    _ = np.asarray(out[0])
    qps = b * args.iters / (time.perf_counter() - t0)
    _emit(
        f"queries/sec/chip (DEM gather, budget 1%, {g.shape[0]} gallery)",
        qps,
        "queries/sec/chip",
        10_000.0,
        error_pct=100.0 * float(np.mean(gl[idx] != pl[:b])),
        checked_pct=100.0 * float(checked.mean()) / g.shape[0],
    )


def bench_cascade(args) -> None:
    """Config 4: sequential early-exit cascade over backbone segments —
    the fused one-dispatch engine on BN-folded segments, measured against
    the same plain folded forward it claims to beat."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fast_image_recognition_tpu.cascade.engine import (
        SequentialInferencePipeline,
    )
    from fast_image_recognition_tpu.models import (
        backbone_info,
        create_efficientnet,
        default_taps,
    )
    from fast_image_recognition_tpu.models.fold import make_serving_fn

    res = args.resolution or 224
    model, variables = create_efficientnet(args.variant, 0, resolution=res)
    taps = tuple(default_taps(args.variant, preset=args.exits))
    probe = model.apply(variables, jnp.zeros((1, res, res, 3)), taps=taps)
    dims = [int(probe["taps"][t].shape[-1]) for t in taps] + [
        int(probe["embedding"].shape[-1])
    ]
    rng = np.random.default_rng(0)
    coefs = [rng.normal(0, 0.1, (100, d)).astype(np.float32) for d in dims]
    intercepts = [np.zeros(100, np.float32) for _ in dims]
    pipe = SequentialInferencePipeline(
        model, variables, taps, coefs, intercepts,
        thresholds=[0.0] * (len(dims) - 1), engine="folded",
    )
    images = rng.normal(size=(args.batch, res, res, 3)).astype(np.float32)
    if args.head == "knn":
        # the reference's proposed sequential kNN rule
        # (sequential_inference.py:483-508) as the fused exit head: the
        # per-level galleries are the level embeddings of an enrolled set
        # (100 identities x 4 images, extracted once with the same
        # segments), and the ratio-margin confidence feeds the same
        # threshold/compaction machinery as the SVC head.
        n_id, per = 100, 4
        gal_images = rng.normal(size=(n_id * per, res, res, 3)).astype(
            np.float32
        )
        gal_labels = np.repeat(np.arange(n_id, dtype=np.int32), per)
        gal_images += gal_labels[:, None, None, None].astype(np.float32) * 0.05
        galleries = pipe.level_embeddings(gal_images)
        pipe = SequentialInferencePipeline(
            model, variables, taps,
            head_mode="knn", galleries=galleries, gallery_labels=gal_labels,
            ratio=0.8, engine="folded",
        )
        # quantile-calibrated margins give the same spread operating point
        # as the linear bench (the raw margin-0 rule is degenerate on a
        # synthetic workload: all-exit or none-exit)
        pipe.calibrate(images[: min(args.batch, 256)], tune=True)
    else:
        # Calibrate thresholds to the median surviving max-score (the
        # reference FAR-tunes per level, sequential_inference.py:609-631) —
        # sizes the fused engine's per-level capacities from the survivor
        # fractions.
        pipe.calibrate(images[: min(args.batch, 256)])
    x = jnp.asarray(images)
    if args.cascade_mode == "pooled":
        # level-major cross-batch compaction: always-full buckets, exact
        # sequential semantics, one [2, n_alive] fetch per level per pool
        bucket = min(1024, args.batch)
        r = pipe.predict_pooled(x, bucket=bucket, warmup=True)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            r = pipe.predict_pooled(x, bucket=bucket)
        ips = args.batch * args.iters / (time.perf_counter() - t0)
    else:
        r = pipe.predict_fused(x, slack=args.slack)  # compile + warm
        key = next(iter(pipe._fused_fns))
        fused = pipe._fused_fns[key]
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fused(pipe._seg_params, x)
        _ = np.asarray(out[0])
        ips = args.batch * args.iters / (time.perf_counter() - t0)

    # accuracy vs exact sequential semantics (host-compaction path) and vs
    # the plain full forward — computed once, not timed
    exact = pipe.predict(images)
    agreement = 100.0 * float(np.mean(r.predictions == exact.predictions))

    # the plain folded forward at the same batch — the baseline to beat
    info = backbone_info(args.variant)
    serve, sparams = make_serving_fn(
        model, variables, info, resolution=res, folded=True
    )
    # fetch only a tiny slice so the tunnel transfer doesn't penalize the
    # plain path relative to the cascade's small predictions fetch
    plain = jax.jit(lambda v, im: serve(v, im)["embedding"][0, :8])
    _ = np.asarray(plain(sparams, x))
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = plain(sparams, x)
    _ = np.asarray(out)
    plain_ips = args.batch * args.iters / (time.perf_counter() - t0)

    head_desc = "kNN d_min/0.8 exits" if args.head == "knn" else "SVC exits"
    mode_desc = "pooled" if args.cascade_mode == "pooled" else "fused"
    _emit(
        f"images/sec/chip ({mode_desc} early-exit cascade, {head_desc}, "
        f"{len(dims)} levels [{args.exits} taps], "
        f"breaks={np.round(r.break_counts, 2).tolist()}, plain forward "
        f"{plain_ips:.0f} img/s)",
        ips,
        "images/sec/chip",
        10_000.0,
        agreement_pct=agreement,
        forced_pct=100.0 * r.forced_fraction,
        speedup_vs_plain=ips / plain_ips,
    )


def bench_video(args) -> None:
    """Config 5: video frame-set recognition with per-video fusion."""
    import jax.numpy as jnp
    import numpy as np

    from fast_image_recognition_tpu.data import make_gallery_and_probes
    from fast_image_recognition_tpu.evaluation.video import make_video_fusion_fn

    n_classes = 100
    g, gl, p, pl = make_gallery_and_probes(n_classes, 20, 20, 1536, seed=0)
    frame_video = pl.copy()  # 20 frames per video, one video per class
    video_label = np.arange(n_classes)
    num_videos = n_classes
    fuse = make_video_fusion_fn(g, gl, n_classes, num_videos)
    probes = jnp.asarray(p, jnp.float32)
    fv = jnp.asarray(frame_video)
    preds = np.asarray(fuse(probes, fv))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = fuse(probes, fv)
    _ = np.asarray(out)
    fps = len(p) * args.iters / (time.perf_counter() - t0)
    _emit(
        f"frames/sec/chip (video frame-set recognition + log-posterior "
        f"fusion, {g.shape[0]} gallery, {num_videos} videos)",
        fps,
        "frames/sec/chip",
        10_000.0,
        error_pct=100.0 * float(np.mean(preds != video_label)),
    )


_DEFAULTS = {
    "e2e": dict(gallery=1_000_000, batch=1024, iters=20),
    "bf": dict(gallery=1_000_000, batch=1024, iters=20),
    "dem": dict(gallery=100_000, batch=128, iters=10),
    "cascade": dict(gallery=0, batch=1024, iters=10),
    "video": dict(gallery=0, batch=0, iters=20),
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
    parser.add_argument("--variant", default="b0", help="any zoo backbone (see models/__init__.py)")
    parser.add_argument(
        "--match",
        default="pca",
        choices=["pca", "exact", "int8"],
        help="e2e match path: pca candidates + full-D rescore, exact, or "
        "int8 quantized scan + exact rescore",
    )
    parser.add_argument(
        "--extract", default="auto",
        choices=["auto", "exact", "cascade", "both"],
        help="e2e extract path: the full folded forward ('exact'), the "
        "early-exit serving cascade (readout-predicted embeddings + d1/d2 "
        "ratio-rule exits, serving.CascadeRecognitionService), 'both' "
        "(plain line then cascade line, same gallery/workload), or 'auto' "
        "(= both when a trained checkpoint exists, else exact)",
    )
    parser.add_argument(
        "--ckpt", default="auto",
        help="trained backbone checkpoint for the e2e config: a path, "
        "'none' (random weights + noise probes, the pre-r5 workload), or "
        "'auto' (newest benchmarks/trained_<variant>_<res>_synthetic*.npz; "
        "probes become device-rendered unseen-class images)",
    )
    parser.add_argument(
        "--grid", type=int, default=2,
        help="--extract cascade: readout grid-pool size (g*g*C tap feats)",
    )
    parser.add_argument(
        "--gallery-classes", type=int, default=4096,
        help="trained-checkpoint e2e: enrolled identities in the "
        "class-structured gallery (~gallery/this rows per identity)",
    )
    parser.add_argument(
        "--cascade-ratio", type=float, default=0.85,
        help="--extract cascade: exit when the rescored 1-NN distance "
        "ratio d1/d2 < this (reference 0.7, ImageTesting.cpp:533; 0.85 "
        "is the measured error-minimum of the r5 level-gallery curve, "
        "benchmarks/cascade_level_r5.jsonl)",
    )
    parser.add_argument(
        "--exit-taps", default=None, metavar="block5c,block6a",
        help="--extract cascade: comma-separated tap block names "
        "(default: the family's 'early' preset, first two)",
    )
    # 124-d candidate projection + packed scan + 48-tile full-D rescore:
    # measured best e2e operating point (the candidate scan is VPU-epilogue
    # bound, so the packed single-reduce kernel wins ~1.8x; 124 + the 4
    # augmented norm columns land exactly on 128 lanes; the full-D rescore
    # restores exactness and agreement_pct audits it)
    parser.add_argument("--pca-dim", type=int, default=124)
    parser.add_argument("--rescore", type=int, default=48)
    parser.add_argument(
        "--pca-scan", default="packed",
        choices=["packed", "f32", "bf16", "int8"],
        help="e2e pca candidate-scan kernel (packed = single-reduce "
        "MXU-assembled distance, the measured-fastest)",
    )
    parser.add_argument(
        "--select", default="exact", choices=["exact", "approx"],
        help="tile-selection op for pca candidates (approx = "
        "lax.approx_min_k)",
    )
    parser.add_argument("--quick", action="store_true", help="small shapes for smoke runs")
    parser.add_argument(
        "--noise-sweep", default=None, metavar="F0,F1,...",
        help="accuracy-margin audit: sweep the planted-NN noise fraction "
        "and print error/agreement for e2e-packed, approx-select and int8 "
        "match paths (e.g. 0.2,0.4,0.6,0.8,0.9,0.95)",
    )
    parser.add_argument(
        "--quant", action="store_true",
        help="bf config: int8-quantized gallery scan + exact bf16 rescore",
    )
    parser.add_argument(
        "--quant-compute", default="int8", choices=["int8", "bf16"],
        help="int8 scan contraction dtype (bf16 = upcast-in-VMEM fallback)",
    )
    parser.add_argument(
        "--head", default="linear", choices=["linear", "knn"],
        help="cascade config: exit-head rule (baked LinearSVC scores, or "
        "the sequential kNN d_min/0.8 ratio rule)",
    )
    parser.add_argument(
        "--slack", type=float, default=1.3,
        help="cascade config: per-level capacity slack over the calibrated "
        "survivor fractions (lower = fewer wasted lanes, more forced exits)",
    )
    parser.add_argument(
        "--exits", default="deep", choices=["deep", "early"],
        help="cascade config: tap preset — 'deep' mirrors the reference's "
        "B7 tap depths (first exit ~60%% of full FLOPs), 'early' adds "
        "stage-3/4 exits (first exit ~25%%) so the cascade can bank more",
    )
    parser.add_argument(
        "--cascade-mode", default="fused", choices=["fused", "pooled"],
        help="cascade config: one-dispatch fused program (per-batch "
        "capacities) or level-major pooled compaction (always-full "
        "buckets, one fetch per level per pool)",
    )
    args = parser.parse_args()

    if args.noise_sweep:
        bench_noise_sweep(_apply_defaults(args, "e2e"))
        return
    if args.all:
        for config in ("bf", "dem", "cascade", "video", "e2e"):
            try:
                _RUNNERS[config](_apply_defaults(args, config))
            except Exception as e:  # keep the remaining configs running
                print(
                    json.dumps({"metric": config, "error": str(e)[:300]}),
                    file=sys.stderr,
                )
            sys.stdout.flush()
    else:
        _RUNNERS[args.config](_apply_defaults(args, args.config))


if __name__ == "__main__":
    main()
