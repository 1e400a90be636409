from fast_image_recognition_tpu.cascade.twd import (  # noqa: F401
    ConventionalTWD,
    ProposedTWD,
    TWDType,
)
