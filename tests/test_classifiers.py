"""KNN / PNN / FPNN classifier family vs oracles and expected behavior
(qt_cpp/classification.cpp parity targets)."""

import numpy as np
import pytest

from fast_image_recognition_tpu.classifiers import (
    FPNNClassifier,
    KNNClassifier,
    PNNClassifier,
    PNNWithClusteringClassifier,
)
from fast_image_recognition_tpu.classifiers.fpnn import fpnn_oracle_predict
from fast_image_recognition_tpu.classifiers.parzen import k_medoids_per_class
from fast_image_recognition_tpu.data import make_gallery_and_probes
from fast_image_recognition_tpu.ops.pca import fit_pca


@pytest.fixture(scope="module")
def data():
    return make_gallery_and_probes(10, 20, 4, 64, seed=101)


def test_knn_k1_equals_nearest(data):
    x, y, q, qy = data
    clf = KNNClassifier(1, 10).fit(x, y)
    preds = clf.predict(q)
    mean = x.mean(axis=0)
    d = (((q - mean)[:, None, :] - (x - mean)[None, :, :]) ** 2).sum(-1)
    want = y[d.argmin(1)]
    np.testing.assert_array_equal(preds, want)


def test_knn_k3(data):
    x, y, q, qy = data
    preds = KNNClassifier(3, 10).fit(x, y).predict(q)
    assert (preds == qy).mean() > 0.9


def test_pnn_bf_and_sequential_agree(data):
    x, y, q, qy = data
    bf = PNNClassifier(10, bruteforce=True).fit(x, y)
    seq = PNNClassifier(10, bruteforce=False).fit(x, y)
    pb = bf.predict(q)
    ps = seq.predict(q)
    assert (pb == qy).mean() > 0.9
    # sequential pruning is lossy by design; near-total agreement expected
    assert (pb == ps).mean() > 0.9


def test_pnn_with_clustering(data):
    x, y, q, qy = data
    clf = PNNWithClusteringClassifier(10, num_clusters=5).fit(x, y)
    assert clf._x.shape[0] == 10 * 5  # 5 prototypes per class
    assert (clf.predict(q) == qy).mean() > 0.85


def test_k_medoids_prototypes(data):
    x, y, _, _ = data
    proto = k_medoids_per_class(x, y, 10, num_clusters=3)
    assert len(proto) == 30
    # prototypes keep the class distribution
    assert (np.bincount(y[proto], minlength=10) == 3).all()
    # a class smaller than k keeps all members: y[:25] = 20x class0 + 5x
    # class1 -> 8 prototypes + 5 kept
    small = k_medoids_per_class(x[:25], y[:25], 10, num_clusters=8)
    assert len(small) == 13


def test_fpnn_matches_oracle(data):
    x, y, q, qy = data
    clf = FPNNClassifier(10, features_scale=1.0).fit(x, y)
    preds = clf.predict(q[:12])
    agree = sum(
        int(preds[i] == fpnn_oracle_predict(q[i], x, y, 10)) for i in range(12)
    )
    assert agree >= 11  # fp32 vs fp64 may flip a near-tie


def test_fpnn_scales_and_seq(data):
    x, y, q, qy = data
    for scale in (1.0, 0.33):
        bf = FPNNClassifier(10, features_scale=scale).fit(x, y)
        assert (bf.predict(q) == qy).mean() > 0.85
    seq = FPNNClassifier(10, bruteforce=False, output_ratio=0.9).fit(x, y)
    bf = FPNNClassifier(10).fit(x, y)
    assert (seq.predict(q) == bf.predict(q)).mean() > 0.9


def test_fpnn_j_terms(data):
    x, y, _, _ = data
    clf = FPNNClassifier(10).fit(x, y)
    # n/C = 20 -> ceil(20^(1/3)) = 3
    assert clf.j_terms == 3


def test_pca_reduction_and_stats(data):
    x, y, q, _ = data
    pca = fit_pca(x, num_components=16)
    xr = pca.project(x)
    qr = pca.project(q)
    assert xr.shape == (x.shape[0], 16) and qr.shape == (q.shape[0], 16)
    # variance ordering
    assert (np.diff(pca.explained_variance) <= 1e-9).all()
    # projection preserves pairwise distances in the kept subspace:
    # reconstruct and compare energies
    recon = xr @ pca.components + pca.mean
    resid = ((x - recon) ** 2).sum()
    total = ((x - x.mean(0)) ** 2).sum()
    assert resid / total < 0.7  # top-16 of 64 dims keeps most energy


def test_pca_classifier_pipeline(data):
    """The testClassification flow: split -> PCA 256 -> classify
    (classification.cpp:1091-1110) — shrunk to 16 dims here."""
    x, y, q, qy = data
    pca = fit_pca(x, num_components=16)
    clf = FPNNClassifier(10).fit(pca.project(x), y)
    preds = clf.predict(pca.project(q))
    assert (preds == qy).mean() > 0.85


def test_pca_save_load(tmp_path, data):
    x, _, _, _ = data
    pca = fit_pca(x, num_components=8)
    path = str(tmp_path / "pca.npz")
    pca.save(path)
    from fast_image_recognition_tpu.ops.pca import PCAModel

    loaded = PCAModel.load(path)
    np.testing.assert_allclose(loaded.components, pca.components)
    np.testing.assert_allclose(loaded.project(x[:3]), pca.project(x[:3]))
