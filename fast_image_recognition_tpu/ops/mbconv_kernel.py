"""Fused MBConv Pallas kernel — one inverted-residual block per dispatch.

STATUS: EXPERIMENTAL, off by default (``make_infer_fn(fused=False)``).
Measured on a real v5e chip (B=1024, per-block, 2026-08-17): XLA's per-op
path beats this kernel at every B0 block shape — 7.4 vs 58.8 ms at
112x112/Ce=32, 4.7 vs 8.1 ms at 7x7/Ce=1152. The working hypothesis that
inter-op HBM traffic dominates was wrong: the measured budget is VPU
compute (depthwise taps + swish transcendentals), where XLA's conv
emitters pick better internal layouts (especially for narrow channel
counts, where an NHWC lane layout wastes most of the vector unit). The
kernel is kept as a correct, tested reference for VMEM-resident block
fusion; revisit if a layout-transposing variant (C on sublanes, W on
lanes) is worth the complexity.

Original motivation: the folded XLA path materializes the 6x-expanded
hidden tensor in HBM twice per block (expand-conv write, depthwise
read/write, SE read, project read). This kernel keeps the entire block in
VMEM: the only HBM traffic is the block input, the block output, and the
(small) weights.

Replaces the per-op serving path of models/inference.py::_block for
stride-1 blocks (reference semantics: the MBConv structure of the tf_keras
zoo backbones, dnn_feature_extractor.py:19-56; BN already folded into conv
weights by models/inference.py::fold_backbone). Stride-2 blocks stay on
XLA: Mosaic's strided load requires an exactly-128-lane memref, which no
EfficientNet/MobileNetV2 hidden width has.

Design notes (see /opt/skills/guides/pallas_guide.md):
- grid over batch tiles only; the full spatial plane of one image fits
  VMEM for every B0..B2-class stride-1 shape (largest: 112x112x96 hidden
  = 2.4 MB), so there is no halo exchange.
- Mosaic layout rules drive the data layout: the W axis (sublane) must be
  a 16-multiple for the [bt*H*W, C] reshape feeding the MXU, and writes
  must land at sublane offset 0. So the HOST pre-pads the input plane to
  [B, H, WP, Cin] with the SAME-conv left padding included (pl zeros,
  then x, then zeros to WP = roundup(WOA + k - 1, 16)); the kernel then
  runs a VALID depthwise conv whose output columns [0, wo) are exactly
  the SAME-conv outputs, computes an aligned WOA = roundup(wo, 16)-wide
  plane, and the host slices [:, :, :wo, :] off the result (both pads
  fuse into neighbor XLA ops).
- expand / project are jnp.dot on aligned [bt*H*WP, C] views — MXU, f32
  accumulate. Zero pad columns flow zeros through both matmuls.
- depthwise conv = k^2 shifted multiply-accumulates into an f32 VMEM
  scratch accumulator — VPU, fp32 (the VPU is fp32 hardware), accumulated
  IN PLACE so Mosaic reuses one temporary slot per tap instead of keeping
  all k^2 slices live (which blows the VMEM stack at 112x112).
- SE pools over the full plane with a column mask (alignment columns
  right of wo hold garbage taps and must not enter the spatial mean).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_W_ALIGN = 16  # sublane alignment that keeps bf16 reshapes legal


def _same_pads(h: int, k: int, stride: int) -> Tuple[int, int, int]:
    """(out, pad_low, pad_high) of XLA SAME padding along one spatial dim."""
    out = -(-h // stride)
    total = max((out - 1) * stride + k - h, 0)
    low = total // 2
    return out, low, total - low


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _act(name: str, x):
    if name == "relu6":
        return jnp.minimum(jax.nn.relu(x), 6.0)
    return jax.nn.swish(x)


def _mbconv_kernel(
    *refs,
    cfg: Dict[str, Any],
):
    """refs order: x, [w_exp, b_exp,] w_dw, b_dw, [w_se1, b_se1, w_se2,
    b_se2,] w_proj, b_proj, out, pad_scratch, acc_scratch.

    x: [bt, H, WP, Cin] — host-pre-padded (left SAME pad + alignment).
    out: [bt, H, WOA, Cout] — columns >= wo are garbage, host slices."""
    it = iter(refs)
    x_ref = next(it)
    w_exp = b_exp = None
    if cfg["has_expand"]:
        w_exp, b_exp = next(it), next(it)
    w_dw, b_dw = next(it), next(it)
    w_se1 = b_se1 = w_se2 = b_se2 = None
    if cfg["has_se"]:
        w_se1, b_se1, w_se2, b_se2 = next(it), next(it), next(it), next(it)
    w_proj, b_proj = next(it), next(it)
    out_ref = next(it)
    pad_ref = next(it)  # [bt, Hp, WP, Ce] bf16, zero rows outside interior
    acc_ref = next(it)  # [bt, H, WOA, Ce] f32 depthwise accumulator

    k = cfg["kernel"]
    bt, h, wp, cin = x_ref.shape
    woa = out_ref.shape[2]
    ce = w_dw.shape[-1]
    pl_h = cfg["pad_low_h"]
    wo = cfg["wo"]
    act = functools.partial(_act, cfg["activation"])

    # Zero the vertical padding rows once; the interior rows are fully
    # overwritten every grid step (the horizontal pad comes in with x).
    @pl.when(pl.program_id(0) == 0)
    def _():
        pad_ref[:] = jnp.zeros_like(pad_ref)

    x = x_ref[:]

    # --- expand (1x1 conv = matmul, MXU) -> padded scratch interior -------
    if cfg["has_expand"]:
        x2 = x.reshape(bt * h * wp, cin)
        hid = jnp.dot(x2, w_exp[:], preferred_element_type=jnp.float32)
        hid = act(hid + b_exp[:].astype(jnp.float32))
        hid = hid.reshape(bt, h, wp, ce)
        # The horizontal pad columns of x are zeros, but the expand matmul
        # maps them to act(b_exp) != 0; the XLA SAME-conv reference pads
        # AFTER the expand, so its border taps read true zeros. Mask the
        # columns outside the real image span [pl_w, pl_w + wo) back to 0.
        cols = jax.lax.broadcasted_iota(jnp.int32, (bt, h, wp, 1), 2)
        pl_w = cfg["pad_low_w"]
        real = jnp.logical_and(cols >= pl_w, cols < pl_w + wo)
        hid = jnp.where(real, hid, 0.0)
        pad_ref[:, pl_h : pl_h + h, :, :] = hid.astype(pad_ref.dtype)
    else:
        pad_ref[:, pl_h : pl_h + h, :, :] = x.astype(pad_ref.dtype)

    # --- depthwise VALID conv: k^2 shifted MACs (VPU, f32, in place) ------
    for di in range(k):
        for dj in range(k):
            sl = pad_ref[:, di : di + h, dj : dj + woa, :]
            tap = sl.astype(jnp.float32) * w_dw[di, dj, :].astype(jnp.float32)
            if di == 0 and dj == 0:
                acc_ref[:] = tap
            else:
                acc_ref[:] = acc_ref[:] + tap
    acc_ref[:] = act(acc_ref[:] + b_dw[:].astype(jnp.float32))

    # --- squeeze-excite over the full plane (column-masked mean) ----------
    if cfg["has_se"]:
        cols = jax.lax.broadcasted_iota(jnp.int32, (bt, h, woa, 1), 2)
        masked = jnp.where(cols < wo, acc_ref[:], 0.0)
        pooled = jnp.sum(masked, axis=(1, 2)) / float(h * wo)  # [bt, Ce]
        se = jax.nn.swish(
            jnp.dot(
                pooled,
                w_se1[:].astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
            + b_se1[:].astype(jnp.float32)
        )
        se = jax.nn.sigmoid(
            jnp.dot(se, w_se2[:].astype(jnp.float32),
                    preferred_element_type=jnp.float32)
            + b_se2[:].astype(jnp.float32)
        )
        acc_ref[:] = acc_ref[:] * se[:, None, None, :]

    # --- project (1x1 conv = matmul, MXU) ---------------------------------
    h2 = acc_ref[:].astype(jnp.bfloat16).reshape(bt * h * woa, ce)
    y = jnp.dot(h2, w_proj[:], preferred_element_type=jnp.float32)
    y = (y + b_proj[:].astype(jnp.float32)).reshape(bt, h, woa, -1)
    if cfg["residual"]:
        # x column j+pl_w is the real pixel j (left SAME pad shifts cols)
        y = y + x[:, :, cfg["pad_low_w"] : cfg["pad_low_w"] + woa, :].astype(
            jnp.float32
        )
    out_ref[:] = y.astype(out_ref.dtype)


def _pick_batch_tile(batch: int, vmem_bytes: int, budget: int) -> int:
    bt = max(1, budget // max(vmem_bytes, 1))
    while batch % bt:
        bt -= 1
    return max(bt, 1)


@functools.partial(
    jax.jit, static_argnames=("cfg_key", "interpret", "batch_tile")
)
def _fused_mbconv_jit(x_padded, params_flat, cfg_key, interpret, batch_tile):
    cfg = dict(cfg_key)
    b, h, wp, cin = x_padded.shape
    k = cfg["kernel"]
    _, pl_h, ph_h = _same_pads(h, k, 1)
    woa = cfg["woa"]
    cout = params_flat[-2].shape[1]
    ce = params_flat[-2].shape[0]
    bt = batch_tile

    kernel = functools.partial(_mbconv_kernel, cfg=cfg)
    in_specs = [
        pl.BlockSpec(
            (bt, h, wp, cin), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        )
    ] + [
        pl.BlockSpec(
            p.shape,
            lambda i, nd=p.ndim: (0,) * nd,  # bind ndim now (late-binding trap)
            memory_space=pltpu.VMEM,
        )
        for p in params_flat
    ]
    return pl.pallas_call(
        kernel,
        grid=(b // bt,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (bt, h, woa, cout), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, woa, cout), x_padded.dtype),
        scratch_shapes=[
            pltpu.VMEM((bt, h + pl_h + ph_h, wp, ce), jnp.bfloat16),
            pltpu.VMEM((bt, h, woa, ce), jnp.float32),
        ],
        interpret=interpret,
        # the 16M scoped-vmem default is far below physical VMEM; the big
        # 112x112 planes legitimately hold ~10M of live data + temporaries
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(
                2 * b * h * wp * cin * (ce if cfg["has_expand"] else 0)
                + 2 * b * h * woa * k * k * ce
                + 2 * b * h * woa * ce * cout
            ),
            bytes_accessed=int(
                x_padded.size * x_padded.dtype.itemsize + b * h * woa * cout * 2
            ),
            transcendentals=int(b * h * wp * ce),
        ),
    )(x_padded, *params_flat)


def fused_mbconv(
    x: jax.Array,  # [B, H, W, Cin] bf16 (or f32, cast internally)
    p: Dict[str, Any],  # folded block params (models/inference.py layout)
    cfg: Dict[str, Any],  # static block config (same source)
    interpret: Optional[bool] = None,
    vmem_budget: int = 9_000_000,
) -> jax.Array:
    """Run one folded stride-1 MBConv block through the fused kernel.

    Parity contract: identical math to models/inference.py::_block up to
    f32-accumulation order (expand matmul, depthwise SAME conv, SE, project
    matmul, optional residual)."""
    if cfg["stride"] != 1:
        raise NotImplementedError("fused_mbconv covers stride-1 blocks only")
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, h, w, cin = x.shape
    k = cfg["kernel"]
    wo, pl_w, _ = _same_pads(w, k, 1)
    woa = _round_up(wo, _W_ALIGN)
    wp = _round_up(woa + k - 1, _W_ALIGN)

    params_flat = []
    if cfg["has_expand"]:
        params_flat += [p["w_exp"].reshape(p["w_exp"].shape[2:]), p["b_exp"]]
    params_flat += [p["w_dw"].reshape(k, k, -1), p["b_dw"]]
    if cfg["has_se"]:
        params_flat += [p["w_se1"], p["b_se1"], p["w_se2"], p["b_se2"]]
    params_flat += [p["w_proj"].reshape(p["w_proj"].shape[2:]), p["b_proj"]]

    ce = params_flat[-2].shape[0]
    vmem = (
        h * wp * cin * 2  # x block
        + (h + k) * wp * ce * 2  # padded hidden (bf16)
        + h * woa * ce * 4  # f32 accumulator
        + h * woa * ce * 4  # one live temporary of the same size
        + h * woa * params_flat[-2].shape[1] * 4  # projected f32
    )
    bt = _pick_batch_tile(b, vmem, vmem_budget)

    x = jnp.pad(
        x.astype(jnp.bfloat16), ((0, 0), (0, 0), (pl_w, wp - pl_w - w), (0, 0))
    )
    cfg_key = tuple(
        sorted(
            [
                (k_, v)
                for k_, v in cfg.items()
                if k_
                in ("kernel", "stride", "has_expand", "has_se", "residual",
                    "activation")
            ]
            + [("pad_low_w", pl_w), ("wo", wo), ("woa", woa),
               ("pad_low_h", _same_pads(h, k, 1)[1])]
        )
    )
    out = _fused_mbconv_jit(x, tuple(params_flat), cfg_key, interpret, bt)
    return out[:, :, :wo, :]
