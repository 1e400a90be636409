#!/usr/bin/env python
"""testVerification driver (qt_cpp/ImageTesting.cpp:714-843): 10-split 1-NN
verification over the first 256 dims with device-side pairwise memoization;
optional Bayesian within-class Mahalanobis variant (:553-712)."""

from __future__ import annotations

import argparse

import numpy as np

from common import add_dataset_args, load_dataset


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    add_dataset_args(parser)
    parser.add_argument("--tests", type=int, default=10)
    parser.add_argument("--dims", type=int, default=256)
    parser.add_argument("--bayesian", action="store_true")
    args = parser.parse_args()

    from fast_image_recognition_tpu.evaluation.verification import (
        fit_bayesian_metric,
        mahalanobis_verification,
        verification_test,
    )

    gallery, glabels, probes, plabels, num_classes = load_dataset(args)
    feats = np.concatenate([gallery, probes])
    labels = np.concatenate([glabels, plabels])
    print("start testing")
    verification_test(
        feats, labels, tests=args.tests, end=min(args.dims, feats.shape[1])
    )
    if args.bayesian:
        metric = fit_bayesian_metric(
            gallery, glabels, num_components=min(96, gallery.shape[1])
        )
        err = mahalanobis_verification(metric, gallery, glabels, probes, plabels)
        print(f"bayesian mahalanobis error={err:.4g}%")

        from fast_image_recognition_tpu.evaluation.verification import (
            fit_joint_bayesian,
            joint_bayesian_verification,
        )

        jb = fit_joint_bayesian(gallery, glabels)
        err = joint_bayesian_verification(jb, gallery, glabels, probes, plabels)
        print(f"joint bayesian error={err:.4g}%")


if __name__ == "__main__":
    main()
