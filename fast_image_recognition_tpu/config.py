"""Runtime configuration for the framework.

The reference scatters its configuration across preprocessor defines
(qt_cpp/db.h:4-91, qt_cpp/db_features.h:10-12, qt_cpp/ann.cpp:270) and Python
module constants (tf_keras/sequential_inference.py:36-38). Here everything is
a dataclass with one source of truth: dataset, backbone, distance, cascade and
sharding options are explicit values, not compile-time switches.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Optional, Sequence


class DistanceKind(str, enum.Enum):
    """Distance selected by USE_L2_DISTANCE / chi2 / KL in the reference
    (qt_cpp/db_features.cpp:22-42)."""

    L2 = "l2"
    CHI2 = "chi2"
    KL = "kl"


@dataclasses.dataclass(frozen=True)
class DatasetConfig:
    """Replaces the USE_CALTECH / USE_LFW / USE_CASIA / USE_VGG / USE_LCNN
    compile-time dataset selection (qt_cpp/db.h:4-91)."""

    name: str = "caltech"
    features_file: str = "101_ObjectCategories_inception_resnet_v2.txt"
    features_count: int = 1536  # db.h:79-91 (4096 VGG, 256 LCNN)
    # Caltech clutter classes skipped at load time (db_features.cpp:60-64).
    skip_class_substrings: Sequence[str] = ("BACKGROUND_Google", "257.clutter")
    # CASIA caps identities at 1000 (db_features.cpp:66-70).
    max_classes: Optional[int] = None
    # Train split: fixed 30 images/class for Caltech, else ceil(FRACTION*n)
    # (db_features.cpp:117-162, db.h:71-78).
    train_images_per_class: Optional[int] = 30
    train_fraction: float = 0.03


@dataclasses.dataclass(frozen=True)
class MatcherConfig:
    """1-NN / ANN matcher options (qt_cpp/ann.h, qt_cpp/ann.cpp)."""

    distance: DistanceKind = DistanceKind.L2
    # Budgeted search: number of gallery rows an approximate method may probe
    # (ann.h:20-22 setImageCountToCheck). 0 means the full gallery.
    image_count_to_check: int = 0
    # DEM pivots: max(5, 0.015*N) capped at 32 (ann.cpp:371-379, 332-333).
    dem_pivot_fraction: float = 0.015
    dem_min_pivots: int = 5
    dem_max_pivots: int = 32
    # FAR quantile for the DEM early-exit threshold (ann.h:64).
    false_accept_rate: float = 0.01
    # Pallas kernel tiling.
    query_tile: int = 128
    gallery_tile: int = 1024
    # Brute-force scan precision: 'fp32' (bf16 scan + fp32-precise pass),
    # or 'int8' (quantized tile-min scan + exact bf16 rescore — half the
    # HBM stream, 2x MXU peak; TPU-native extension, no reference analog).
    precision: str = "fp32"


@dataclasses.dataclass(frozen=True)
class CascadeConfig:
    """Early-exit cascade options (qt_cpp/ImageTesting.cpp:74-288,
    tf_keras/sequential_inference.py:587-773, 1079-1167)."""

    # Prefix chunk for the proposed TWD (ImageTesting.cpp:221-224).
    chunk_features: int = 32
    # Refinement cap on the feature axis (ImageTesting.cpp:169-171, 224).
    max_features: int = 256
    # Distance-ratio threshold theta (ImageTesting.cpp:533-535).
    distance_ratio: float = 0.7
    # Python kNN cascade uses 0.8 (sequential_inference.py:496).
    knn_distance_ratio: float = 0.8
    # Fixed SVC exit threshold (sequential_inference.py:655).
    svc_threshold: float = 0.06
    # FAR target when tuning per-level thresholds
    # (sequential_inference.py:622-631).
    svc_far: float = 0.01


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device mesh layout for pjit/shard_map execution.

    The reference has no parallelism at all (SURVEY.md section 2.3); these
    axes are the TPU design: 'gallery' shards gallery rows across chips
    (top-k merged over ICI), 'data' is batch data-parallelism for the
    extractor / fine-tuning, 'model' shards classifier heads / wide layers.
    """

    data: int = 1
    gallery: int = 1
    model: int = 1


@dataclasses.dataclass(frozen=True)
class FrameworkConfig:
    dataset: DatasetConfig = dataclasses.field(default_factory=DatasetConfig)
    matcher: MatcherConfig = dataclasses.field(default_factory=MatcherConfig)
    cascade: CascadeConfig = dataclasses.field(default_factory=CascadeConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)
    seed: int = 123  # RANDOM_SEED (sequential_inference.py:30-32)
