#!/usr/bin/env python
"""Prototype timing of w8a8 variants of the folded B0 forward (pure XLA).

The roofline ablation (scripts/roofline_extract.py, ARCHITECTURE.md) puts
the folded bf16 forward at ~51 ms / B=1024 on v5e: ~23 ms serial VPU
(depthwise taps + swish), ~25 ms streaming the 1x1-conv activations
through HBM, MXU ~3.6 ms. int8 therefore buys nothing on the VPU side —
the lever is HALVING THE HBM STREAM of the expanded tensors (and 2x-ing
the MXU rate as a side effect). This script measures, on the real chip:

  variant 'bf16'   — the shipped folded forward (baseline);
  variant 'dots8'  — expand/project 1x1 convs as int8 dot_general
                     (quantize fused into the producer epilogue, dequant
                     into the consumer), dw/stem/head/SE unchanged;
  variant 'bound8' — 'dots8' plus int8 block-boundary tensors (residuals
                     carried in int8).

Scales are fixed constants here (timing only — the real path calibrates
per-tensor scales; see models/quant_inference.py).
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
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from fast_image_recognition_tpu.models import backbone_info, create_backbone
    from fast_image_recognition_tpu.models.inference import (
        _act,
        _conv,
        fold_backbone,
        fold_preprocess_into_stem,
        folded_head,
        folded_stem_pp,
    )

    info = backbone_info(args.variant)
    res = int(info["resolution"])
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
        print(f"{label:28s} {ms:8.2f} ms   ({args.batch / ms * 1e3:8.0f} img/s)",
              flush=True)
        return ms

    # static per-tensor activation scale (timing-only constant)
    A = 4.0 / 127.0

    def q8(x):  # bf16/f32 -> int8, fuses into the producer's epilogue
        return jnp.clip(
            jnp.round(x.astype(jnp.float32) * (1.0 / A)), -127, 127
        ).astype(jnp.int8)

    def prep_w(w):  # [1,1,ci,co] -> (int8 [ci,co], per-co scale f32)
        w = np.asarray(w, np.float32).reshape(w.shape[2], w.shape[3])
        s = np.maximum(np.abs(w).max(axis=0), 1e-8) / 127.0
        return (
            jnp.asarray(np.clip(np.round(w / s), -127, 127), jnp.int8),
            jnp.asarray(s * A, jnp.float32),
        )

    def dot8(x_i8, w_i8, ws, b, shape):
        m = x_i8.reshape(-1, x_i8.shape[-1])
        acc = jax.lax.dot(m, w_i8, preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * ws[None, :] + b.astype(jnp.float32)
        return y.reshape(shape)

    # pre-quantized weights per block
    qw = []
    for p, cfg in zip(folded["blocks"], configs):
        entry = {}
        if cfg["has_expand"]:
            entry["exp"] = prep_w(p["w_exp"])
        entry["proj"] = prep_w(p["w_proj"])
        qw.append(entry)

    def block_q(x, p, w8, cfg, int8_boundary):
        act = _act(cfg.get("activation", "swish"))
        h = x
        if cfg["has_expand"]:
            hi8 = h if (int8_boundary and h.dtype == jnp.int8) else q8(h)
            ci = hi8.shape[-1]
            wi8, ws = w8["exp"]
            ce = wi8.shape[1]
            hq = dot8(hi8, wi8, ws, p["b_exp"],
                      hi8.shape[:-1] + (ce,))
            h = act(hq).astype(jnp.bfloat16)
        elif int8_boundary and h.dtype == jnp.int8:
            h = (h.astype(jnp.float32) * A).astype(jnp.bfloat16)
        ce = h.shape[-1]
        h = act(_conv(h, p["w_dw"], p["b_dw"], stride=cfg["stride"], groups=ce))
        if cfg["has_se"]:
            sv = jnp.mean(h, axis=(1, 2), dtype=jnp.float32)
            sv = jax.nn.swish(sv @ p["w_se1"] + p["b_se1"])
            sv = jax.nn.sigmoid(sv @ p["w_se2"] + p["b_se2"])
            h = h * sv[:, None, None, :].astype(h.dtype)
        wi8, ws = w8["proj"]
        co = wi8.shape[1]
        y = dot8(q8(h), wi8, ws, p["b_proj"], h.shape[:-1] + (co,))
        if cfg["residual"]:
            if int8_boundary and x.dtype == jnp.int8:
                y = y + x.astype(jnp.float32) * A
            else:
                y = y + x.astype(jnp.float32)
        return q8(y) if int8_boundary else y.astype(jnp.bfloat16)

    def fwd_bf16(f, x):
        h = folded_stem_pp(f, x)
        from fast_image_recognition_tpu.models.inference import _block
        for p, cfg in zip(f["blocks"], configs):
            h = _block(h, p, cfg)
        return folded_head(f, h)

    def fwd_q(f, x, int8_boundary):
        h = folded_stem_pp(f, x)
        for p, w8, cfg in zip(f["blocks"], qw, configs):
            h = block_q(h, p, w8, cfg, int8_boundary)
        if h.dtype == jnp.int8:
            h = (h.astype(jnp.float32) * A).astype(jnp.bfloat16)
        return folded_head(f, h)

    timed(fwd_bf16, folded, images, label="bf16 folded (baseline)")
    timed(lambda f, x: fwd_q(f, x, False), folded, images, label="dots8")
    timed(lambda f, x: fwd_q(f, x, True), folded, images, label="bound8")


if __name__ == "__main__":
    main()
