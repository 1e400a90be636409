"""Shared CLI plumbing for the experiment drivers.

Replaces the reference's static config: the ``#if``-selected entry points of
qt_cpp/main.cpp:21-31 and the dataset/backbone preprocessor defines of
qt_cpp/db.h:4-91 become real flags; every driver accepts either a feature
file (the 3-line text format) or a synthetic gallery spec.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])  # repo root

from fast_image_recognition_tpu.data import (  # noqa: E402
    load_feature_file,
    make_gallery_and_probes,
)
from fast_image_recognition_tpu.data.feature_io import FeatureDB  # noqa: E402


def add_dataset_args(parser: argparse.ArgumentParser) -> None:
    parser.add_argument(
        "--features-file",
        default=None,
        help="3-line text feature file (db.h FEATURES_FILE_NAME analog)",
    )
    parser.add_argument(
        "--features-count", type=int, default=1536, help="db.h FEATURES_COUNT"
    )
    parser.add_argument(
        "--skip-classes",
        nargs="*",
        default=["BACKGROUND_Google", "257.clutter"],
        help="class-name substrings to skip at load (Caltech clutter)",
    )
    parser.add_argument("--max-classes", type=int, default=None)
    parser.add_argument(
        "--synthetic",
        default=None,
        metavar="C,PER_GAL,PER_PROBE,D",
        help="synthetic spec when no features file is given, e.g. 64,20,4,1536",
    )
    parser.add_argument("--seed", type=int, default=123)


def load_dataset(args) -> tuple:
    """Returns (gallery, glabels, probes, plabels, num_classes)."""
    if args.features_file:
        db = load_feature_file(
            args.features_file,
            features_count=args.features_count,
            skip_class_substrings=tuple(args.skip_classes),
            max_classes=args.max_classes,
        )
        from fast_image_recognition_tpu.data import train_test_split_images

        rng = np.random.default_rng(args.seed)
        split = train_test_split_images(
            db.labels,
            rng,
            train_images_per_class=getattr(args, "train_per_class", 30),
        )
        return (
            db.features[split.train_idx],
            db.labels[split.train_idx],
            db.features[split.test_idx],
            db.labels[split.test_idx],
            db.num_classes,
        )
    spec = args.synthetic or "64,20,4,1536"
    c, per_g, per_p, d = (int(x) for x in spec.split(","))
    g, gl, p, pl = make_gallery_and_probes(c, per_g, per_p, d, seed=args.seed)
    return g, gl, p, pl, c
