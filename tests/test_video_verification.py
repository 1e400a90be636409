"""Video frame-set recognition (qt_cpp/video.cpp) and face verification
(qt_cpp/ImageTesting.cpp:714-843)."""

import numpy as np
import pytest

from fast_image_recognition_tpu.data import make_gallery_and_probes
from fast_image_recognition_tpu.data.feature_io import FeatureDB
from fast_image_recognition_tpu.data.video_io import VideoDB, load_videos, write_videos
from fast_image_recognition_tpu.evaluation.verification import (
    fit_bayesian_metric,
    full_pairwise_matrix,
    mahalanobis_verification,
    verification_test,
)
from fast_image_recognition_tpu.evaluation.video import (
    evaluate_video_recognition,
    intersect_identities,
    sample_probe_frames,
    video_log_posterior_fusion,
)
from fast_image_recognition_tpu.ops import oracle_pairwise
from fast_image_recognition_tpu.search import BruteForceMatcher


@pytest.fixture(scope="module")
def video_world(tmp_path_factory):
    """Gallery of stills + video frames drawn from shared class centers,
    with one extra identity on each side (exercises the intersection)."""
    g, gl, p, pl = make_gallery_and_probes(8, 12, 25, 64, seed=111)
    names = [f"person_{c}" for c in range(8)]
    db = FeatureDB(g, gl, names, [""] * len(gl))

    # frames: probes regrouped as videos of 25 frames (one video per class
    # per probe chunk); add an extra video identity not in the gallery
    frames = p
    frame_video = pl.copy()  # one video per class
    video_person = np.arange(8)
    vnames = names.copy()
    extra = np.random.default_rng(0).random((10, 64)).astype(np.float32)
    extra /= np.linalg.norm(extra, axis=1, keepdims=True)
    frames = np.concatenate([frames, extra])
    frame_video = np.concatenate([frame_video, np.full(10, 8)])
    video_person = np.concatenate([video_person, [8]])
    vnames.append("person_video_only")
    videos = VideoDB(frames, frame_video, video_person, vnames)

    path = tmp_path_factory.mktemp("video") / "videos.txt"
    write_videos(str(path), frames, frame_video, video_person, vnames)
    return db, videos, str(path)


def test_video_roundtrip(video_world):
    db, videos, path = video_world
    loaded = load_videos(path, features_count=64)
    assert loaded.num_videos == videos.num_videos
    assert loaded.person_names == videos.person_names
    # atol covers the loader's |f| < 1e-4 zeroing of values that dropped
    # below the threshold after renormalization (db_features.cpp semantics)
    np.testing.assert_allclose(loaded.frames, videos.frames, rtol=1e-4, atol=1.5e-4)
    np.testing.assert_array_equal(loaded.frame_video, videos.frame_video)


def test_identity_intersection(video_world):
    db, videos, _ = video_world
    inter = intersect_identities(db, videos)
    assert inter.num_classes == 8  # the video-only identity is dropped
    assert inter.gallery_mask.all()
    assert (~inter.video_mask).sum() == 1  # the video-only identity dropped
    # remapped labels live in one space
    assert inter.video_labels[inter.video_mask].max() < 8
    assert (inter.gallery_labels >= 0).all()


def test_frame_sampling(video_world):
    _, videos, _ = video_world
    idx = sample_probe_frames(videos, step=10)
    # every video contributes ceil(frames/10) probes
    per_video = np.bincount(videos.frame_video[idx], minlength=videos.num_videos)
    want = np.array([-(-np.sum(videos.frame_video == v) // 10) for v in range(videos.num_videos)])
    np.testing.assert_array_equal(per_video, want)


def test_video_recognition_end_to_end(video_world):
    db, videos, _ = video_world
    inter = intersect_identities(db, videos)
    keep_frames = inter.video_mask[videos.frame_video]
    vid = VideoDB(
        videos.frames[keep_frames],
        videos.frame_video[keep_frames],
        videos.video_person,
        videos.person_names,
    )
    g_labels = inter.gallery_labels[inter.gallery_mask]
    probe_idx = sample_probe_frames(vid, step=3)
    matcher = BruteForceMatcher(db.features[inter.gallery_mask])
    res = evaluate_video_recognition(
        matcher,
        g_labels,
        vid,
        inter.video_labels,
        probe_idx,
        num_classes=8,
        aggregation="min_distance",
    )
    assert res.frame_error < 10.0
    assert res.video_error <= res.frame_error + 1e-9  # fusion can't be worse here
    res_mv = evaluate_video_recognition(
        matcher, g_labels, vid, inter.video_labels, probe_idx, 8, "majority"
    )
    assert res_mv.video_error < 15.0


def test_log_posterior_fusion(video_world):
    db, videos, _ = video_world
    inter = intersect_identities(db, videos)
    keep_frames = inter.video_mask[videos.frame_video]
    frames = videos.frames[keep_frames]
    fv = videos.frame_video[keep_frames]
    g_labels = inter.gallery_labels[inter.gallery_mask]
    preds = video_log_posterior_fusion(
        frames, db.features[inter.gallery_mask], g_labels, fv, 8, videos.num_videos
    )
    valid = np.asarray([np.any(fv == v) for v in range(videos.num_videos)])
    assert (preds[valid] == inter.video_labels[valid]).mean() > 0.9


def test_full_pairwise_matrix_blocks():
    g, gl, _, _ = make_gallery_and_probes(6, 8, 2, 64, seed=5)
    dm = full_pairwise_matrix(g, end=32, block=16)
    want = oracle_pairwise(g, g, 0, 32)
    np.testing.assert_allclose(dm, want, rtol=1e-4, atol=1e-7)


def test_verification_ten_splits():
    g, gl, p, pl = make_gallery_and_probes(10, 20, 1, 64, seed=6)
    res = verification_test(g, gl, tests=10, end=64, verbose=False)
    assert res.error_rate < 10.0
    assert "sigma" in res.extras


def test_bayesian_metric_runs():
    g, gl, p, pl = make_gallery_and_probes(10, 20, 4, 64, seed=7)
    metric = fit_bayesian_metric(g, gl, num_components=16)
    err = mahalanobis_verification(metric, g, gl, p, pl)
    assert err < 15.0


def test_joint_bayesian_verification():
    from fast_image_recognition_tpu.evaluation.verification import (
        fit_joint_bayesian,
        joint_bayesian_scores,
        joint_bayesian_verification,
    )

    g, gl, p, pl = make_gallery_and_probes(10, 20, 4, 32, seed=8)
    model = fit_joint_bayesian(g, gl)
    err = joint_bayesian_verification(model, g, gl, p, pl)
    assert err < 10.0
    # same-identity pairs must score higher than cross-identity on average
    s = joint_bayesian_scores(model, p, g)
    same = np.asarray([s[i, gl == pl[i]].mean() for i in range(len(pl))])
    diff = np.asarray([s[i, gl != pl[i]].mean() for i in range(len(pl))])
    assert (same > diff).mean() > 0.95
