"""Device-resident procedural image workload (zero host<->device traffic).

The host generator (data/synthetic_images.py) builds the many-class
Caltech-256-regime dataset (tf_keras/sequential_inference.py:231-269,
augmentation family keras_finetune_prune.py:865-875) in numpy — fine for
CPU-mesh tests, but feeding a TPU trainer through the tunneled device
link costs ~40 MB per 224px batch. This module renders the SAME texture
family analytically ON DEVICE:

- class prototypes are band-limited sums of 2-D sinusoids, so instead of
  warping a sampled texture (gather + bilinear filtering) the affine warp
  composes with the sinusoid argument — evaluate ``sin(2pi(fx*u' + fy*v')
  + ph)`` directly at the warped coordinates (exact, no interpolation,
  no gathers);
- per-class parameters (frequencies/phases/amplitudes/color cast) are
  drawn with the SAME numpy rng stream as the host generator, so class c
  here is the same texture as class c there;
- instances (affine warp + brightness/contrast jitter + per-instance
  noise amplitude) come from a jax PRNG — bit-reproducible across runs
  on the same backend.

The trainer uploads NOTHING: the dataset materializes as a uint8 device
array once (~10 s for 10k 224px instances) and batches are device
gathers. The serving benches draw probe/calibration images from unseen
class seeds the same way.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np


def make_class_params(
    num_classes: int, seed: int = 0, waves: int = 6
) -> Dict[str, np.ndarray]:
    """Per-class texture parameters, host-side (tiny). Draw order matches
    data/synthetic_images.py::_class_prototypes so ``seed`` names the same
    texture family on both paths."""
    rng = np.random.default_rng(seed)
    C, W = num_classes, waves
    fx = np.empty((C, 3, W), np.float32)
    fy = np.empty((C, 3, W), np.float32)
    ph = np.empty((C, 3, W), np.float32)
    amp = np.empty((C, 3, W), np.float32)
    cast = np.empty((C, 3), np.float32)
    for c in range(C):
        for ch in range(3):
            fx[c, ch] = rng.uniform(-6.0, 6.0, W).astype(np.float32)
            fy[c, ch] = rng.uniform(-6.0, 6.0, W).astype(np.float32)
            ph[c, ch] = rng.uniform(0, 2 * np.pi, W).astype(np.float32)
            amp[c, ch] = rng.uniform(0.4, 1.0, W).astype(np.float32)
        cast[c] = rng.uniform(0.6, 1.0, 3).astype(np.float32)
    return {"fx": fx, "fy": fy, "ph": ph, "amp": amp, "cast": cast}


def _proto_norms(params_dev, res: int):
    """[C] (lo, inv_scale): joint min / 1/(max-min) of each UNWARPED
    prototype rendered at ``res`` — the host generator's per-prototype
    normalization (synthetic_images.py:64-65), computed once on device."""
    import jax
    import jax.numpy as jnp

    u = jnp.linspace(0.0, 1.0, res, dtype=jnp.float32)
    vv, uu = jnp.meshgrid(u, u, indexing="ij")  # v=rows, u=cols

    def one(p):
        # p: fx/fy/ph/amp [3, W] -> proto [res, res, 3]
        arg = (
            2.0 * jnp.pi
            * (
                p["fx"][:, :, None, None] * uu[None, None]
                + p["fy"][:, :, None, None] * vv[None, None]
            )
            + p["ph"][:, :, None, None]
        )
        img = jnp.einsum("cwyx,cw->yxc", jnp.sin(arg), p["amp"])
        return jnp.min(img), jnp.max(img)

    lo, hi = jax.lax.map(
        one,
        {k: params_dev[k] for k in ("fx", "fy", "ph", "amp")},
    )
    return lo, 1.0 / jnp.maximum(hi - lo, 1e-6)


def _render_batch(per, noise, res: int, waves: int):
    """Fully batched render — pure broadcasting with the wave loop
    Python-unrolled (NO lax.scan/map: a scan body containing threefry RNG
    compiles in ~6 MINUTES over the tunneled TPU's compile service;
    this elementwise graph compiles in seconds and XLA fuses the whole
    wave accumulation into one VPU pass).

    Layout: ALL elementwise work runs channel-second ([B, 3, res, res],
    minor dim = res) and transposes to NHWC once at the end — an NHWC
    pipeline puts the 3-wide channel axis on the 128-lane minor dimension
    (2.3% lane utilization, measured ~30 ms/image at 224); channel-second
    is ~res/128 full lanes.

    per: dict of [B]-leading instance+class params; noise [B,3,res,res].
    """
    import jax.numpy as jnp

    c = (res - 1) / 2.0
    xx = jnp.broadcast_to(
        jnp.arange(res, dtype=jnp.float32)[None, :], (res, res)
    )[None]
    yy = jnp.broadcast_to(
        jnp.arange(res, dtype=jnp.float32)[:, None], (res, res)
    )[None]
    s = lambda v: v[:, None, None]  # [B] -> [B,1,1]  # noqa: E731
    ca, sa = jnp.cos(s(per["angle"])), jnp.sin(s(per["angle"]))
    inv = 1.0 / s(per["scale"])
    tx, ty = s(per["tx"]), s(per["ty"])
    xs = ((xx - c - tx) * ca + (yy - c - ty) * sa) * inv + c
    ys = (-(xx - c - tx) * sa + (yy - c - ty) * ca) * inv + c
    us = (xs / (res - 1))[:, None]  # [B,1,res,res] texture coords
    vs = (ys / (res - 1))[:, None]
    img = jnp.zeros(noise.shape, jnp.float32)  # [B,3,res,res]
    w4 = lambda v: v[:, :, None, None]  # [B,3] -> [B,3,1,1]  # noqa: E731
    s4 = lambda v: v[:, None, None, None]  # [B] -> [B,1,1,1]  # noqa: E731
    for w in range(waves):
        arg = (
            2.0 * jnp.pi
            * (w4(per["fx"][:, :, w]) * us + w4(per["fy"][:, :, w]) * vs)
            + w4(per["ph"][:, :, w])
        )
        img = img + w4(per["amp"][:, :, w]) * jnp.sin(arg)
    img = (img - s4(per["lo"])) * s4(per["inv_scale"])
    img = img * w4(per["cast"])
    img = (img - 0.5) * s4(per["contrast"]) + 0.5
    img = img + s4(per["bright"])
    img = img + s4(per["namp"]) * noise
    img = (jnp.clip(img, 0.0, 1.0) * 255.0).astype(jnp.uint8)
    return jnp.transpose(img, (0, 2, 3, 1))  # NHWC out, one transpose


def make_render_fn(
    params: Dict[str, np.ndarray],
    res: int,
    max_rotate: float = 0.44,
    scale_range: Tuple[float, float] = (0.8, 1.2),
    max_shift: float = 0.1,
    noise_lo: float = 0.0,
    noise_hi: float = 0.25,
):
    """Returns a jitted ``render(class_ids [B] int32, key) -> uint8
    [B, res, res, 3]`` closing over the (device) class params. One
    compile per batch size."""
    import jax
    import jax.numpy as jnp

    pd = {k: jnp.asarray(v) for k, v in params.items()}
    lo, inv_scale = jax.jit(lambda p: _proto_norms(p, res))(pd)
    waves = int(params["fx"].shape[-1])

    @jax.jit
    def render(class_ids, key):
        b = class_ids.shape[0]
        ks = jax.random.split(key, 8)
        inst = {
            "angle": jax.random.uniform(
                ks[0], (b,), minval=-max_rotate, maxval=max_rotate
            ),
            "scale": jax.random.uniform(
                ks[1], (b,), minval=scale_range[0], maxval=scale_range[1]
            ),
            "tx": jax.random.uniform(
                ks[2], (b,), minval=-max_shift, maxval=max_shift
            )
            * res,
            "ty": jax.random.uniform(
                ks[3], (b,), minval=-max_shift, maxval=max_shift
            )
            * res,
            "bright": jax.random.uniform(
                ks[4], (b,), minval=-0.1, maxval=0.1
            ),
            "contrast": jax.random.uniform(
                ks[5], (b,), minval=0.85, maxval=1.15
            ),
            "namp": jax.random.uniform(
                ks[6], (b,), minval=noise_lo, maxval=noise_hi
            ),
        }
        noise = jax.random.normal(ks[7], (b, 3, res, res), jnp.float32)
        per = {
            "fx": pd["fx"][class_ids],
            "fy": pd["fy"][class_ids],
            "ph": pd["ph"][class_ids],
            "amp": pd["amp"][class_ids],
            "cast": pd["cast"][class_ids],
            "lo": lo[class_ids],
            "inv_scale": inv_scale[class_ids],
            **inst,
        }
        return _render_batch(per, noise, res, waves)

    return render


def device_dataset(
    num_classes: int,
    per_class: int,
    res: int,
    seed: int = 0,
    chunk: int = 256,
    class_seed: Optional[int] = None,
    **aug,
):
    """(images uint8 device [C*per, res, res, 3], labels np int64) —
    the device analog of synthetic_images.make_synthetic_image_dataset
    (same texture family per ``class_seed``; instances differ: analytic
    warp + jax PRNG instead of bilinear resample + numpy). Instances are
    class-major like the host version."""
    import jax
    import jax.numpy as jnp

    params = make_class_params(
        num_classes, seed if class_seed is None else class_seed
    )
    render = make_render_fn(params, res, **aug)
    labels = np.repeat(np.arange(num_classes, dtype=np.int64), per_class)
    n = num_classes * per_class
    outs = []
    key = jax.random.PRNGKey(seed)
    for s in range(0, n, chunk):
        ids = jnp.asarray(labels[s : s + chunk].astype(np.int32))
        outs.append(render(ids, jax.random.fold_in(key, s)))
    return jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0], labels
