"""fast_image_recognition_tpu — a TPU-native image recognition / search framework.

A ground-up JAX / XLA / Pallas / pjit re-design of the capabilities of
``av-savchenko/fast-image-recognition``:

- gallery 1-NN search (brute force, directed enumeration, budgeted ANN) as
  batched Pallas distance/top-k kernels over an HBM-resident, mesh-sharded
  gallery (reference: qt_cpp/ann.cpp, qt_cpp/db_features.cpp);
- sequential / three-way-decision early-exit classification as mask-gated,
  feature-chunked kernels (reference: qt_cpp/ImageTesting.cpp);
- PNN / orthogonal-series (FPNN) probabilistic classifiers as vectorized
  density ops (reference: qt_cpp/classification.cpp);
- multi-exit EfficientNet backbones with SVC / entropy / kNN exit policies
  (reference: tf_keras/sequential_inference.py) and channel pruning
  (reference: tf_keras/prunned/keras_finetune_prune.py);
- video frame-set recognition (reference: qt_cpp/video.cpp).

The compute path is JAX (jnp / lax / pallas); parallelism is expressed with
``jax.sharding.Mesh`` + NamedSharding and XLA collectives over ICI. A C++
data plane (fast feature-file ingest) lives in ``runtime/``.
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("FIR_PLATFORM"):
    # Escape hatch for the CLI drivers / scripts: the session may preset a
    # device plugin (e.g. the axon TPU tunnel) that re-appends itself to
    # JAX_PLATFORMS, so plain env vars can't force CPU — the config update
    # after import can (FIR_PLATFORM=cpu python cli/run_ann.py ...).
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["FIR_PLATFORM"])

from fast_image_recognition_tpu.config import (  # noqa: F401
    DatasetConfig,
    DistanceKind,
    FrameworkConfig,
    MatcherConfig,
)


def __getattr__(name):  # lazy: serving pulls in jax + the model zoo
    if name in ("RecognitionService", "build_service"):
        from fast_image_recognition_tpu import serving

        return getattr(serving, name)
    raise AttributeError(name)
