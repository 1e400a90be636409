"""Config-driven construction — one source of truth for experiments.

Replaces the reference's compile-time wiring (qt_cpp/db.h defines select
dataset/backbone/distance; main.cpp `#if` selects the driver): a
``FrameworkConfig`` fully determines the dataset load, the matcher, and the
cascade, so an experiment is a config value, not an edit-and-recompile.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from fast_image_recognition_tpu.config import (
    CascadeConfig,
    DatasetConfig,
    FrameworkConfig,
    MatcherConfig,
)


def load_dataset_from_config(cfg: DatasetConfig, seed: int = 123):
    """Returns (gallery, glabels, probes, plabels, num_classes) using the
    configured feature file + split policy."""
    from fast_image_recognition_tpu.data import (
        load_feature_file,
        train_test_split_images,
    )

    db = load_feature_file(
        cfg.features_file,
        features_count=cfg.features_count,
        skip_class_substrings=tuple(cfg.skip_class_substrings),
        max_classes=cfg.max_classes,
    )
    split = train_test_split_images(
        db.labels,
        np.random.default_rng(seed),
        train_images_per_class=cfg.train_images_per_class,
        train_fraction=cfg.train_fraction,
    )
    return (
        db.features[split.train_idx],
        db.labels[split.train_idx],
        db.features[split.test_idx],
        db.labels[split.test_idx],
        db.num_classes,
    )


def build_matcher(
    method: str,
    gallery: np.ndarray,
    labels: np.ndarray,
    cfg: Optional[MatcherConfig] = None,
    seed: int = 0,
    mesh=None,
):
    """method: 'bf' | 'bf-sharded' | 'dem' | 'dem-gather' | 'dem-full' |
    'proj' | 'sw' | 'kdtree'. Budgets come from cfg.image_count_to_check."""
    cfg = cfg or MatcherConfig()
    if method == "bf":
        from fast_image_recognition_tpu.search import BruteForceMatcher

        return BruteForceMatcher(
            gallery, kind=cfg.distance, precision=cfg.precision
        )
    if method == "bf-sharded":
        from fast_image_recognition_tpu.parallel import ShardedGalleryMatcher
        from fast_image_recognition_tpu.parallel.mesh import gallery_mesh

        return ShardedGalleryMatcher(
            gallery, mesh or gallery_mesh(), tile_g=cfg.gallery_tile
        )
    if method in ("dem", "dem-gather"):
        from fast_image_recognition_tpu.search.dem import (
            DirectedEnumerationMatcher,
        )

        m = DirectedEnumerationMatcher(
            gallery,
            labels,
            false_accept_rate=cfg.false_accept_rate,
            image_count_to_check=cfg.image_count_to_check,
            kind=cfg.distance,
            seed=seed,
            pivot_fraction=cfg.dem_pivot_fraction,
            max_pivots=cfg.dem_max_pivots,
            probe_mode="gather" if method == "dem-gather" else "exact",
        )
        return m
    if method == "dem-full":
        from fast_image_recognition_tpu.search.dem import FullMatrixDEM

        return FullMatrixDEM(
            gallery,
            labels,
            false_accept_rate=cfg.false_accept_rate,
            image_count_to_check=cfg.image_count_to_check,
            kind=cfg.distance,
            seed=seed,
            pivot_fraction=cfg.dem_pivot_fraction,
            max_pivots=cfg.dem_max_pivots,
        )
    if method == "proj":
        from fast_image_recognition_tpu.search.projection import (
            ProjectionIndexMatcher,
        )

        m = ProjectionIndexMatcher(gallery, seed=seed)
        if cfg.image_count_to_check:
            m.set_budget(cfg.image_count_to_check)
        return m
    if method == "sw":
        # BASELINE-ONLY (parity with the reference's off-by-default
        # NMSLIB small_world_rand, qt_cpp/ann.h:121-157): loses to the
        # brute-force TPU scan by 20-250x at equal accuracy on every
        # captured point (benchmarks/ann_crossover_r4.jsonl) — kept as
        # the N10 parity artifact, never a recommended matcher.
        from fast_image_recognition_tpu.search.small_world import (
            SmallWorldMatcher,
        )

        return SmallWorldMatcher(
            gallery,
            image_count_to_check=cfg.image_count_to_check,
            seed=seed,
        )
    if method == "kdtree":
        from fast_image_recognition_tpu.search.projection import KDTreeMatcher

        return KDTreeMatcher(gallery)
    raise ValueError(f"unknown matcher method {method!r}")


def build_twd_classifiers(
    gallery: np.ndarray,
    labels: np.ndarray,
    num_classes: int,
    cfg: Optional[CascadeConfig] = None,
):
    """The testRecognition classifier battery (ImageTesting.cpp:525-538)
    from config thresholds."""
    from fast_image_recognition_tpu.cascade import (
        ConventionalTWD,
        ProposedTWD,
        TWDType,
    )

    cfg = cfg or CascadeConfig()
    d = gallery.shape[1]
    refine_to = min(cfg.max_features, d)
    reduced = min(64, d)
    return [
        ConventionalTWD(gallery, labels, num_classes, TWDType.POSTERIORS, 0.24,
                        reduced_features=reduced, refine_to=refine_to),
        ConventionalTWD(gallery, labels, num_classes, TWDType.DIST_DIFF, 0.003,
                        reduced_features=reduced, refine_to=refine_to),
        ConventionalTWD(gallery, labels, num_classes, TWDType.DIST_RATIO,
                        cfg.distance_ratio, reduced_features=reduced,
                        refine_to=refine_to),
        ProposedTWD(gallery, labels, num_classes, min(cfg.chunk_features, d),
                    cfg.distance_ratio, max_features=refine_to),
        ProposedTWD(gallery, labels, num_classes, min(64, d),
                    cfg.distance_ratio, max_features=refine_to),
    ]
