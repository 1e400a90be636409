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

    import numpy as np

    from fast_image_recognition_tpu.data import train_test_split_images
    from fast_image_recognition_tpu.factory import build_twd_classifiers

    gallery, glabels, probes, plabels, num_classes = load_dataset(args)
    d = gallery.shape[1]
    pool_feats = np.concatenate([gallery, probes])
    pool_labels = np.concatenate([glabels, plabels])
    refine_to = min(256, d)

    # testRecognitionMethod protocol (ImageTesting.cpp:439-501): per method,
    # --tests seeded random resplits; report avg error, sigma, recall, ms.
    rng = np.random.default_rng(13)  # srand(13), :440
    splits = [
        train_test_split_images(
            pool_labels, rng,
            train_images_per_class=getattr(args, "train_per_class", None)
            or max(2, int(0.8 * len(pool_labels) / num_classes)),
        )
        for _ in range(args.tests)
    ]

    def run_method(name, make_predict):
        def one(t):
            s = splits[t]
            g, gl = pool_feats[s.train_idx], pool_labels[s.train_idx]
            p, pl = pool_feats[s.test_idx], pool_labels[s.test_idx]
            predict, unreliable = make_predict(g, gl)
            return evaluate_classifier(
                name, predict, p, pl, num_classes,
                unreliable_count=unreliable, verbose=False,
            )
        print(name)
        repeated_splits_eval(one, tests=args.tests)

    # brute-force prefixes (ImageTesting.cpp:526-529), deduped for small D
    prefixes = list(dict.fromkeys([d, min(64, d), refine_to]))
    for max_feats in prefixes:
        def make_bf(g, gl, mf=max_feats):
            m = BruteForceMatcher(g, max_features=mf)
            return (lambda q: gl[m.search(q).indices]), None

        run_method(f"BF, {max_feats}", make_bf)

    # TWD battery (ImageTesting.cpp:531-535) via the config factory
    for idx in range(5):
        def make_twd(g, gl, i=idx):
            clf = build_twd_classifiers(g, gl, num_classes)[i]
            clf.reset_counters()
            return clf.predict, (lambda c=clf: c.unreliable_count)

        name = build_twd_classifiers(
            gallery[:2], glabels[:2], num_classes
        )[idx].name
        run_method(name, make_twd)

    if not args.skip_baselines:
        from fast_image_recognition_tpu.classifiers.sklearn_baselines import (
            MLPBaseline,
            RandomForestBaseline,
            SVMBaseline,
        )

        for ctor in (
            lambda: RandomForestBaseline(max_features_cols=refine_to),
            lambda: SVMBaseline(linear=False, max_features=refine_to),
            lambda: MLPBaseline(hidden=256, max_features=refine_to),
        ):
            def make_baseline(g, gl, c=ctor):
                b = c().fit(g, gl)
                return b.predict, None

            run_method(ctor().name, make_baseline)


if __name__ == "__main__":
    main()
