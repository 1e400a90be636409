#!/usr/bin/env python
"""testYTFRecognition driver (qt_cpp/video.cpp:156-267).

Loads a still-image gallery + a nested video feature file, intersects
identities, samples every Nth frame as probes, and runs BF and DEM over the
budget sweep ratio 0.1..0.7 (video.cpp:254-264) — plus the fused per-video
aggregations (min-distance / majority / log-posterior sum)."""

from __future__ import annotations

import argparse

import numpy as np

from common import add_dataset_args, load_dataset


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    add_dataset_args(parser)
    parser.add_argument("--video-file", default=None, help="nested video feature file")
    parser.add_argument("--frame-step", type=int, default=10)
    args = parser.parse_args()

    from fast_image_recognition_tpu.data.feature_io import FeatureDB
    from fast_image_recognition_tpu.data.video_io import VideoDB, load_videos
    from fast_image_recognition_tpu.evaluation.video import (
        evaluate_video_recognition,
        intersect_identities,
        sample_probe_frames,
        video_log_posterior_fusion,
    )
    from fast_image_recognition_tpu.search import BruteForceMatcher
    from fast_image_recognition_tpu.search.dem import DirectedEnumerationMatcher

    gallery, glabels, probes, plabels, num_classes = load_dataset(args)
    names = [f"person_{c}" for c in range(num_classes)]
    db = FeatureDB(gallery, glabels, names, [""] * len(glabels))

    if args.video_file:
        videos = load_videos(args.video_file, args.features_count)
    else:
        # synthetic fallback: probe set regrouped as one video per class
        videos = VideoDB(probes, plabels.astype(np.int64), np.arange(num_classes), names)

    inter = intersect_identities(db, videos)
    g_mask = inter.gallery_mask
    g_labels = inter.gallery_labels[g_mask]  # remapped common-id space
    keep = inter.video_mask[videos.frame_video]
    vid = VideoDB(
        videos.frames[keep],
        videos.frame_video[keep],
        videos.video_person,
        videos.person_names,
    )
    video_labels = inter.video_labels
    print(
        f"gallery names={db.num_classes} video names={len(videos.person_names)} "
        f"common={inter.num_classes}"
    )
    probe_idx = sample_probe_frames(vid, step=args.frame_step)
    print(f"dbSize={g_mask.sum()} testSize={len(probe_idx)}")

    bf = BruteForceMatcher(db.features[g_mask])
    for agg in ("min_distance", "majority"):
        r = evaluate_video_recognition(
            bf, g_labels, vid, video_labels, probe_idx,
            inter.num_classes, aggregation=agg,
        )
        print(
            f"BF[{agg}] frame_error={r.frame_error:.4g}% "
            f"video_error={r.video_error:.4g}% ms/frame={r.ms_per_frame:.4g}"
        )
    # SVM frame classifier (video.cpp:246-247)
    try:
        from fast_image_recognition_tpu.classifiers.sklearn_baselines import (
            SVMBaseline,
        )

        svm = SVMBaseline(linear=True).fit(db.features[g_mask], g_labels)
        probes_feats = vid.frames[probe_idx]
        preds = svm.predict(probes_feats)
        truth = video_labels[vid.frame_video[probe_idx]]
        print(f"SVM frame_error={100.0 * (preds != truth).mean():.4g}%")
    except ImportError:
        pass

    fused = video_log_posterior_fusion(
        vid.frames[probe_idx], db.features[g_mask], g_labels,
        vid.frame_video[probe_idx], inter.num_classes, vid.num_videos,
    )
    valid = np.asarray([np.any(vid.frame_video[probe_idx] == v) for v in range(vid.num_videos)])
    err = 100.0 * (fused[valid] != video_labels[valid]).mean()
    print(f"log-posterior fusion video_error={err:.4g}%")

    dem = DirectedEnumerationMatcher(
        db.features[g_mask], g_labels, false_accept_rate=0.01, seed=args.seed
    )
    for ratio in np.arange(0.1, 0.75, 0.1):
        dem.set_budget(int(ratio * int(g_mask.sum())))
        r = evaluate_video_recognition(
            dem, g_labels, vid, video_labels, probe_idx, inter.num_classes
        )
        print(
            f"ratio{ratio:.1f} dem frame_error={r.frame_error:.4g}% "
            f"video_error={r.video_error:.4g}% ms/frame={r.ms_per_frame:.4g}"
        )


if __name__ == "__main__":
    main()
