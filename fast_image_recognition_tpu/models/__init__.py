from fast_image_recognition_tpu.models.efficientnet import (  # noqa: F401
    EfficientNet,
    VARIANTS,
    create_efficientnet,
    default_taps,
    preprocess_images,
)
from fast_image_recognition_tpu.models.inference import (  # noqa: F401
    fold_efficientnet,
    folded_forward,
    make_infer_fn,
)
