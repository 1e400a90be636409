#!/usr/bin/env python
"""testRecognition driver — TWD classifier comparison
(qt_cpp/ImageTesting.cpp:503-548).

Builds the reference's classifier list — BF full/64/256-dim prefixes, the
three conventional TWD types, the proposed TWD at chunk 32/64, and the
RF/SVM/MLP host baselines — and evaluates each over repeated seeded splits
(testRecognitionMethod, :439-501)."""

from __future__ import annotations

import argparse

import numpy as np

from common import add_dataset_args, load_dataset


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    add_dataset_args(parser)
    parser.add_argument("--tests", type=int, default=2)
    parser.add_argument("--skip-baselines", action="store_true")
    args = parser.parse_args()

    from fast_image_recognition_tpu.cascade import (
        ConventionalTWD,
        ProposedTWD,
        TWDType,
    )
    from fast_image_recognition_tpu.evaluation import (
        evaluate_classifier,
        evaluate_matcher,
        repeated_splits_eval,
    )
    from fast_image_recognition_tpu.search import BruteForceMatcher

    gallery, glabels, probes, plabels, num_classes = load_dataset(args)
    d = gallery.shape[1]

    # brute-force prefixes (ImageTesting.cpp:526-529)
    for max_feats in (None, min(64, d), min(256, d)):
        m = BruteForceMatcher(gallery, max_features=max_feats)
        evaluate_matcher(m, glabels, probes, plabels, num_classes=num_classes)

    refine_to = min(256, d)
    reduced = min(64, d)
    classifiers = [
        ConventionalTWD(gallery, glabels, num_classes, TWDType.POSTERIORS, 0.24,
                        reduced_features=reduced, refine_to=refine_to),
        ConventionalTWD(gallery, glabels, num_classes, TWDType.DIST_DIFF, 0.003,
                        reduced_features=reduced, refine_to=refine_to),
        ConventionalTWD(gallery, glabels, num_classes, TWDType.DIST_RATIO, 0.7,
                        reduced_features=reduced, refine_to=refine_to),
        ProposedTWD(gallery, glabels, num_classes, min(32, d), 0.7,
                    max_features=refine_to),
        ProposedTWD(gallery, glabels, num_classes, min(64, d), 0.7,
                    max_features=refine_to),
    ]
    if not args.skip_baselines:
        from fast_image_recognition_tpu.classifiers.sklearn_baselines import (
            MLPBaseline,
            RandomForestBaseline,
            SVMBaseline,
        )

        for b in (
            RandomForestBaseline(max_features_cols=refine_to),
            SVMBaseline(linear=False, max_features=refine_to),
            MLPBaseline(hidden=256, max_features=refine_to),
        ):
            b.fit(gallery, glabels)
            evaluate_classifier(b.name, b.predict, probes, plabels, num_classes)

    for clf in classifiers:
        clf.reset_counters()
        evaluate_classifier(
            clf.name,
            clf.predict,
            probes,
            plabels,
            num_classes,
            unreliable_count=lambda c=clf: c.unreliable_count,
        )


if __name__ == "__main__":
    main()
