from fast_image_recognition_tpu.ops.distances import (  # noqa: F401
    oracle_distance,
    oracle_pairwise,
    pairwise_distances,
)
from fast_image_recognition_tpu.ops.fastmath import fasterlog2  # noqa: F401
