#!/usr/bin/env python
"""testClassification / testClassification1 drivers
(qt_cpp/classification.cpp:991-1169).

Default mode (``--mode fpnn-sweep``) is the reference's main path: PCA to
256 dims, sequential FPNN with an output_ratio sweep 0.6..0.99, fraction=30,
3 repeats (classification.cpp:1091-1169). ``--mode grid`` is the 12-classifier
x train-fraction sweep writing classification_res.txt (:991-1088)."""

from __future__ import annotations

import argparse
import time

import numpy as np

from common import add_dataset_args, load_dataset


def _eval(clf, q, qy, num_classes):
    from fast_image_recognition_tpu.evaluation.harness import macro_recall_percent

    t0 = time.perf_counter()
    preds = clf.predict(q)
    dt = time.perf_counter() - t0
    err = 100.0 * (preds != qy).mean()
    rec = macro_recall_percent(qy, preds, num_classes)
    us = 1e6 * dt / len(qy)
    return err, rec, us


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    add_dataset_args(parser)
    parser.add_argument("--mode", choices=["fpnn-sweep", "grid"], default="fpnn-sweep")
    parser.add_argument("--pca-features", type=int, default=256)
    parser.add_argument("--tests", type=int, default=3)
    parser.add_argument("--results-file", default="classification_res.txt")
    args = parser.parse_args()

    from fast_image_recognition_tpu.classifiers import (
        FPNNClassifier,
        KNNClassifier,
        PNNClassifier,
        PNNWithClusteringClassifier,
    )
    from fast_image_recognition_tpu.ops.pca import fit_pca

    gallery, glabels, probes, plabels, num_classes = load_dataset(args)
    k = min(args.pca_features, gallery.shape[1], gallery.shape[0])
    print(f"pca_features={k} db_size={gallery.shape[0]}")
    pca = fit_pca(gallery, num_components=k)
    x = pca.project(gallery).astype(np.float32)
    q = pca.project(probes).astype(np.float32)

    if args.mode == "fpnn-sweep":
        # FPNN sequential output_ratio sweep (classification.cpp:1111-1114)
        for output_ratio in np.arange(0.6, 1.0, 0.05):
            for scale in (1.0, 0.33):
                clf = FPNNClassifier(
                    num_classes, scale, bruteforce=False,
                    output_ratio=float(output_ratio),
                ).fit(x, glabels)
                err, rec, us = _eval(clf, q, plabels, num_classes)
                print(
                    f"db_size={gallery.shape[0]}\t{clf.name}, "
                    f"{output_ratio:.2f}\terror={err:.4g}\tavg time(us)="
                    f"{us:.4g}\trecall={rec:.4g}"
                )
    else:
        classifiers = [
            KNNClassifier(1, num_classes),
            KNNClassifier(3, num_classes),
            PNNClassifier(num_classes, True),
            PNNWithClusteringClassifier(num_classes, 5),
            FPNNClassifier(num_classes, 1.0, True),
            FPNNClassifier(num_classes, 0.33, True),
            PNNClassifier(num_classes, False),
            FPNNClassifier(num_classes, 1.0, False),
            FPNNClassifier(num_classes, 0.33, False),
        ]
        try:
            from fast_image_recognition_tpu.classifiers.sklearn_baselines import (
                RandomForestBaseline,
                SVMBaseline,
            )

            classifiers += [
                SVMBaseline(linear=True, center=True),
                SVMBaseline(linear=False, center=True),
                RandomForestBaseline(center=True),
            ]
        except ImportError:
            pass
        with open(args.results_file, "w") as fres:
            for clf in classifiers:
                clf.fit(x, glabels)
                err, rec, us = _eval(clf, q, plabels, num_classes)
                print(
                    f"{clf.name}: error={err:.4g} avg time(us)={us:.4g} "
                    f"recall={rec:.4g}"
                )
                fres.write(f"{clf.name}\t{err:.6g}\t{us:.6g}\t{rec:.6g}\n")
        print(f"wrote {args.results_file}")


if __name__ == "__main__":
    main()
