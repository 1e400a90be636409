"""Host-side classical baselines (SVM / Random Forest / MLP).

Reference: the OpenCV ml wrappers — linear/RBF C-SVC (qt_cpp/ann.cpp:129-168,
qt_cpp/ImageTesting.cpp:324-346, qt_cpp/classification.cpp:481-497), random
forest (ImageTesting.cpp:348-373, classification.cpp:499-518), and the
3-layer sigmoid MLP (ImageTesting.cpp:376-438, classification.cpp:521-615).

These are comparison baselines in the reference's experiments, not the
product; they stay on the host via scikit-learn (the TPU-native classifier
paths are search/, cascade/ and classifiers/{knn,parzen,fpnn}).

Feature conventions preserved: truncation to the first 256 dims
(opencv_num_of_features, ImageTesting.cpp:322) and mean-centering
(classification.cpp normalize(), :103-105) are callers' choices exposed as
arguments.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


class _SkBaseline:
    def __init__(self, name: str, max_features: Optional[int], center: bool):
        self.name = name
        self.max_features = max_features
        self.center = center
        self._mean = None
        self._clf = None

    def _prep(self, x: np.ndarray, fit: bool = False) -> np.ndarray:
        x = np.asarray(x, np.float32)
        if self.max_features:
            x = x[:, : self.max_features]
        if self.center:
            if fit:
                self._mean = x.mean(axis=0)
            x = x - self._mean
        return x

    def fit(self, x: np.ndarray, y: np.ndarray, calibrated: bool = False):
        """``calibrated=True`` reproduces classifier_tester's
        CalibratedClassifierCV flow (sequential_inference.py:439-447): fit
        on half, calibrate probabilities prefit on the other half."""
        xp = self._prep(x, fit=True)
        if calibrated:
            from sklearn.calibration import CalibratedClassifierCV
            from sklearn.model_selection import train_test_split

            x_tr, x_val, y_tr, y_val = train_test_split(
                xp, y, test_size=0.5, random_state=42, stratify=y
            )
            self._clf.fit(x_tr, y_tr)
            try:  # sklearn >= 1.6 replaced cv='prefit' with FrozenEstimator
                from sklearn.frozen import FrozenEstimator

                calib = CalibratedClassifierCV(FrozenEstimator(self._clf))
            except ImportError:
                calib = CalibratedClassifierCV(self._clf, cv="prefit")
            calib.fit(x_val, y_val)
            self._clf = calib
        else:
            self._clf.fit(xp, y)
        return self

    def predict(self, x: np.ndarray) -> np.ndarray:
        return np.asarray(self._clf.predict(self._prep(x)))


class SVMBaseline(_SkBaseline):
    """Linear or RBF C-SVC (SVM::LINEAR ann.cpp:148; SVM::RBF
    ImageTesting.cpp:332; gamma = 1/num_features classification.cpp:495)."""

    def __init__(
        self,
        linear: bool = True,
        max_features: Optional[int] = None,
        center: bool = False,
    ):
        super().__init__("Linear SVM" if linear else "RBF SVM", max_features, center)
        from sklearn.svm import SVC

        self._clf = SVC(kernel="linear" if linear else "rbf", gamma="scale")


class RandomForestBaseline(_SkBaseline):
    """RTrees analog (512 trees cap via term criteria,
    classification.cpp:517)."""

    def __init__(
        self,
        n_estimators: int = 100,
        max_features_cols: Optional[int] = None,
        center: bool = False,
    ):
        super().__init__("RF", max_features_cols, center)
        from sklearn.ensemble import RandomForestClassifier

        self._clf = RandomForestClassifier(n_estimators=n_estimators, random_state=13)


class MLPBaseline(_SkBaseline):
    """3-layer MLP, hidden 256 (Caltech) / 128 (ImageTesting.cpp:380-383,
    classification.cpp:577-584)."""

    def __init__(
        self,
        hidden: int = 256,
        max_features: Optional[int] = None,
        center: bool = False,
        max_iter: int = 200,
    ):
        super().__init__("MLP", max_features, center)
        from sklearn.neural_network import MLPClassifier

        self._clf = MLPClassifier(
            hidden_layer_sizes=(hidden,), max_iter=max_iter, random_state=13
        )
