from fast_image_recognition_tpu.parallel.mesh import make_mesh  # noqa: F401
from fast_image_recognition_tpu.parallel.sharded_gallery import (  # noqa: F401
    ShardedGalleryMatcher,
    sharded_topk_l2,
)
