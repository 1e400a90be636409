#!/usr/bin/env python
"""testANN driver — ANN-method comparison (qt_cpp/ann.cpp:24-81).

Runs exact brute force, then the budgeted methods (DEM; sharded BF when a
multi-device mesh is available) over the reference's check-budget sweep
ratio 0.025..0.5 step 0.025 (ann.cpp:61-70), printing the
testSetRecognition line per method.
"""

from __future__ import annotations

import argparse


from common import add_dataset_args, load_dataset


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    add_dataset_args(parser)
    parser.add_argument("--ratio-start", type=float, default=0.025)
    parser.add_argument("--ratio-stop", type=float, default=0.5)
    parser.add_argument("--ratio-step", type=float, default=0.025)
    parser.add_argument("--far", type=float, default=0.01)
    parser.add_argument(
        "--methods",
        nargs="*",
        default=["dem", "proj"],
        choices=["dem", "dem-gather", "dem-full", "proj", "sw", "kdtree"],
        help="budgeted methods to sweep "
        "(the reference compares DEM vs FLANN vs NMSLIB, ann.cpp:55-70; "
        "'sw' is off by default — a measured negative result on TPU, see "
        "search/small_world.py)",
    )
    args = parser.parse_args()

    import jax

    from fast_image_recognition_tpu.evaluation import evaluate_matcher
    from fast_image_recognition_tpu.search import BruteForceMatcher
    from fast_image_recognition_tpu.search.dem import DirectedEnumerationMatcher
    from fast_image_recognition_tpu.search.projection import (
        KDTreeMatcher,
        ProjectionIndexMatcher,
    )

    gallery, glabels, probes, plabels, num_classes = load_dataset(args)
    print(
        f"dbSize={gallery.shape[0]} testSize={probes.shape[0]} "
        f"classes={num_classes} D={gallery.shape[1]} "
        f"devices={len(jax.devices())}"
    )

    bf = BruteForceMatcher(gallery)
    evaluate_matcher(bf, glabels, probes, plabels, num_classes=num_classes)

    methods = []
    if "kdtree" in args.methods:
        # FLANN-style kd-forest; set_budget in the sweep below maps to the
        # SearchParams(checks) cap (ann.cpp:190)
        methods.append(KDTreeMatcher(gallery, seed=args.seed))
    if "dem" in args.methods:
        methods.append(
            DirectedEnumerationMatcher(
                gallery, glabels, false_accept_rate=args.far, seed=args.seed
            )
        )
    if "dem-gather" in args.methods:
        methods.append(
            DirectedEnumerationMatcher(
                gallery, glabels, false_accept_rate=args.far, seed=args.seed,
                probe_mode="gather",
            )
        )
    if "dem-full" in args.methods:
        from fast_image_recognition_tpu.search.dem import FullMatrixDEM

        methods.append(
            FullMatrixDEM(
                gallery, glabels, false_accept_rate=args.far, seed=args.seed
            )
        )
    if "proj" in args.methods:
        methods.append(ProjectionIndexMatcher(gallery, proj_dim=32, seed=args.seed))
    if "sw" in args.methods:
        from fast_image_recognition_tpu.search.small_world import SmallWorldMatcher

        methods.append(SmallWorldMatcher(gallery, seed=args.seed))

    ratio = args.ratio_start
    while ratio <= args.ratio_stop + 1e-9:
        print(f"ratio{ratio:g}")
        for m in methods:
            m.set_budget(int(ratio * gallery.shape[0]))
            evaluate_matcher(m, glabels, probes, plabels, num_classes=num_classes)
        ratio += args.ratio_step


if __name__ == "__main__":
    main()
