from fast_image_recognition_tpu.classifiers.knn import KNNClassifier  # noqa: F401
from fast_image_recognition_tpu.classifiers.parzen import (  # noqa: F401
    PNNClassifier,
    PNNWithClusteringClassifier,
)
from fast_image_recognition_tpu.classifiers.fpnn import FPNNClassifier  # noqa: F401
