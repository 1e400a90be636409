from fast_image_recognition_tpu.data.feature_io import (  # noqa: F401
    FeatureDB,
    load_feature_file,
    normalize_features,
    write_feature_file,
)
from fast_image_recognition_tpu.data.splits import (  # noqa: F401
    Split,
    split_by_class_fraction,
    train_test_split_images,
)
from fast_image_recognition_tpu.data.synthetic import (  # noqa: F401
    make_gallery_and_probes,
    make_synthetic_gallery,
)
from fast_image_recognition_tpu.data.synthetic_images import (  # noqa: F401
    make_synthetic_image_dataset,
    split_synthetic_image_dataset,
)
