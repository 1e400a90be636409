"""Device mesh construction.

The reference has no parallelism (SURVEY.md §2.3); these axes are the TPU
design. Axis names:

- ``data``:    batch data-parallelism (extractor / fine-tuning);
- ``gallery``: gallery-row sharding for search (the TP analog — each chip
  scans its slice of the gallery, top-k merged over ICI);
- ``model``:   model-parallel sharding of wide heads / embeddings.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    data: int = 1,
    gallery: int = 1,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    if devices is None:
        devices = jax.devices()
    need = data * gallery * model
    if need > len(devices):
        raise ValueError(
            f"mesh {data}x{gallery}x{model} needs {need} devices, "
            f"have {len(devices)}"
        )
    grid = np.asarray(devices[:need]).reshape(data, gallery, model)
    return Mesh(grid, axis_names=("data", "gallery", "model"))


def gallery_mesh(num_shards: Optional[int] = None) -> Mesh:
    """A 1-axis mesh over all (or the first ``num_shards``) devices for
    gallery sharding."""
    devices = jax.devices()
    n = num_shards if num_shards is not None else len(devices)
    return Mesh(np.asarray(devices[:n]), axis_names=("gallery",))
