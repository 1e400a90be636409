"""Export a LIVE keras.applications model through the flat weight contract.

The converters in utils/keras_checkpoint.py consume the h5-era flat
``{"<layer>/<weight>": array}`` naming of the released keras-applications
checkpoints (qt_cpp/dnn_feature_extractor.py:45-48). Pretrained blobs are
unreachable in this offline environment, but the keras package itself is
present — so a randomly-initialised keras.applications model is an
independent, executable specification of the exact architecture those
checkpoints parameterize. This module flattens such a model's variables
into the contract, letting tests compare OUR forward (converted weights)
against keras' own forward on the same input — the strongest offline
validation of layer naming, kernel layouts, padding and BN placement.

Requires ``keras`` (>=3). Lazy import: the core library never needs it.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def keras_weights_flat(model) -> Dict[str, np.ndarray]:
    """Flatten a keras model's variables into ``{"<layer>/<name>": array}``.

    Keras 3 renamed DepthwiseConv2D's variable to plain ``kernel``; the
    h5-era releases (and the converters) call it ``depthwise_kernel`` —
    renamed here based on the layer class, not shape heuristics.
    """
    import keras

    out: Dict[str, np.ndarray] = {}
    for layer in model.layers:
        is_dw = isinstance(layer, keras.layers.DepthwiseConv2D)
        for w in layer.weights:
            name = w.path.rsplit("/", 1)[-1]
            if is_dw and name == "kernel":
                name = "depthwise_kernel"
            out[f"{layer.name}/{name}"] = np.asarray(w)
    return out


def randomize_keras_model(model, seed: int = 0) -> None:
    """Replace every variable with seeded random values (in place).

    Fresh ``weights=None`` models carry identity BNs (gamma=1, beta=0,
    mean=0, var=1) — a converter that swapped two BN layers would still
    match. Randomising them (bounded, so ~200-layer activations stay
    finite) makes every layer's placement observable in the output.
    """
    rng = np.random.default_rng(seed)
    for w in model.weights:
        a = np.asarray(w)
        name = w.path.rsplit("/", 1)[-1]
        if name == "moving_variance":
            v = rng.uniform(0.5, 1.5, a.shape)
        elif name == "gamma":
            v = rng.uniform(0.8, 1.2, a.shape)
        elif name in ("moving_mean", "beta", "bias"):
            v = rng.normal(0.0, 0.05, a.shape)
        else:  # conv / depthwise kernels: keep the init's variance scale
            scale = float(np.std(a)) or 0.05
            v = rng.standard_normal(a.shape) * scale
        w.assign(v.astype(np.float32))
