"""Checkpoint / memoization utilities.

Reference mechanisms (SURVEY.md §5 checkpoint/resume):
- Keras ModelCheckpoint(save_best_only) + json/h5 round-trip
  (keras_finetune_prune.py:930-941, sequential_inference.py:1217-1230) →
  flax msgpack serialization with best-metric tracking;
- TF1 Saver restore with EMA shadow variables
  (dnn_feature_extractor.py:97-113) → ``ema_update`` /
  ``swap_in_ema_params``;
- pickled per-level embedding caches keyed by network name
  (sequential_inference.py:816-822, 851-852) → ``EmbeddingCache`` (npz).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from flax import serialization


def save_variables(path: str, variables) -> None:
    # one batched device->host transfer up front: to_bytes fetches leaf by
    # leaf, and per-leaf round trips over a tunneled device cost seconds
    # per save (hundreds of leaves in a backbone)
    variables = jax.device_get(variables)
    with open(path, "wb") as fh:
        fh.write(serialization.to_bytes(variables))


def load_variables(path: str, template=None):
    with open(path, "rb") as fh:
        data = fh.read()
    if template is not None:
        return serialization.from_bytes(template, data)
    return serialization.msgpack_restore(data)


class BestCheckpoint:
    """ModelCheckpoint(save_best_only=True) analog: keeps the best-metric
    variables on disk (sequential_inference.py:1217-1219)."""

    def __init__(self, path: str, mode: str = "max"):
        self.path = path
        self.mode = mode
        self.best: Optional[float] = None

    def update(self, metric: float, variables) -> bool:
        better = (
            self.best is None
            or (self.mode == "max" and metric > self.best)
            or (self.mode == "min" and metric < self.best)
        )
        if better:
            self.best = float(metric)
            save_variables(self.path, variables)
        return better


class EarlyStopping:
    """EarlyStopping(patience) analog (sequential_inference.py:1219)."""

    def __init__(self, patience: int = 5, mode: str = "max"):
        self.patience = patience
        self.mode = mode
        self.best: Optional[float] = None
        self.bad_epochs = 0

    def update(self, metric: float) -> bool:
        """Returns True when training should stop."""
        better = (
            self.best is None
            or (self.mode == "max" and metric > self.best)
            or (self.mode == "min" and metric < self.best)
        )
        if better:
            self.best = float(metric)
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
        return self.bad_epochs > self.patience


def ema_update(ema_params, params, decay: float = 0.9999):
    """Exponential-moving-average shadow parameters (the TF1 EMA variables
    restored by dnn_feature_extractor.py:97-113)."""
    return jax.tree.map(
        lambda e, p: decay * e + (1.0 - decay) * p, ema_params, params
    )


class EmbeddingCache:
    """npz memoization of per-level embeddings keyed by network name —
    resume = skip extraction when the cache exists
    (sequential_inference.py:816-822)."""

    def __init__(self, directory: str, network_name: str):
        self.directory = directory
        self.network_name = network_name
        os.makedirs(directory, exist_ok=True)

    def _path(self, tag: str) -> str:
        return os.path.join(self.directory, f"{self.network_name}{tag}.npz")

    def exists(self, tag: str) -> bool:
        return os.path.exists(self._path(tag))

    def save(self, tag: str, levels: Sequence[np.ndarray], labels: np.ndarray) -> None:
        np.savez(
            self._path(tag),
            labels=labels,
            **{f"level_{i}": np.asarray(x) for i, x in enumerate(levels)},
        )

    def load(self, tag: str):
        z = np.load(self._path(tag))
        levels = []
        i = 0
        while f"level_{i}" in z:
            levels.append(z[f"level_{i}"])
            i += 1
        return levels, z["labels"]
