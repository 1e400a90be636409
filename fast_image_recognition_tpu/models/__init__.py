from fast_image_recognition_tpu.models.efficientnet import (  # noqa: F401
    EfficientNet,
    VARIANTS,
    create_efficientnet,
    default_taps,
    preprocess_images,
)
