from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp

from fast_image_recognition_tpu.models.efficientnet import (  # noqa: F401
    EfficientNet,
    VARIANTS,
    create_efficientnet,
    default_taps,
    preprocess_images,
    round_filters,
)
from fast_image_recognition_tpu.models.mobilenet import (  # noqa: F401
    MobileNetV2,
    _make_divisible,
    create_mobilenetv2,
    default_taps_mobilenet,
    mobilenet_plan,
)
from fast_image_recognition_tpu.models.inference import (  # noqa: F401
    fold_backbone,
    fold_efficientnet,
    folded_forward,
    make_infer_fn,
)


def _parse_mobilenet_width(name: str) -> float:
    # 'mobilenetv2' or 'mobilenetv2_1.4' / 'mobilenetv2_140'
    if "_" not in name:
        return 1.0
    w = name.split("_", 1)[1]
    width = float(w)
    return width / 100.0 if width > 10 else width


def backbone_info(name: str) -> Dict[str, Any]:
    """Static facts about a zoo member (dnn_feature_extractor.py:19-56):
    default resolution, pooled-embedding dim, default exit taps, family."""
    if name in VARIANTS:
        v = VARIANTS[name]
        return dict(
            family="efficientnet",
            resolution=v.resolution,
            embedding_dim=round_filters(1280, v.width),
            taps=default_taps(name),
            preprocess="torch",  # MEAN_RGB/STDDEV_RGB (tf1 extractor :116-119)
        )
    if name.startswith("mobilenetv2"):
        width = _parse_mobilenet_width(name)
        return dict(
            family="mobilenetv2",
            resolution=224,
            embedding_dim=_make_divisible(1280 * max(width, 1.0)),
            taps=default_taps_mobilenet(width),
            preprocess="tf",  # keras mobilenet_v2.preprocess_input = x/127.5-1
        )
    if name == "inception_resnet_v2":
        from fast_image_recognition_tpu.models.inception_resnet import (
            INCEPTION_RESNET_EMBED_DIM,
            default_taps_inception_resnet,
        )

        return dict(
            family="inception_resnet_v2",
            resolution=299,
            embedding_dim=INCEPTION_RESNET_EMBED_DIM,
            taps=default_taps_inception_resnet(),
            preprocess="tf",  # keras inception_resnet_v2.preprocess_input
        )
    if name == "inception_v3":
        from fast_image_recognition_tpu.models.inception_v3 import (
            INCEPTION_V3_EMBED_DIM,
            default_taps_inception_v3,
        )

        return dict(
            family="inception_v3",
            resolution=299,
            embedding_dim=INCEPTION_V3_EMBED_DIM,
            taps=default_taps_inception_v3(),
            preprocess="tf",
        )
    if name in ("resnet50", "resnet50v2", "resnet101v2", "resnet152v2"):
        from fast_image_recognition_tpu.models.resnet import (
            RESNET_EMBED_DIM,
            default_taps_resnet,
        )

        return dict(
            family="resnet",
            resolution=224,
            embedding_dim=RESNET_EMBED_DIM,
            taps=default_taps_resnet(name),
            # keras resnet_v2.preprocess_input is 'tf' mode; v1 is 'caffe'
            preprocess="tf" if name.endswith("v2") else "caffe",
        )
    if name == "vgg19":
        from fast_image_recognition_tpu.models.vgg import (
            VGG19_EMBED_DIM,
            default_taps_vgg,
        )

        return dict(
            family="vgg",
            resolution=224,
            embedding_dim=VGG19_EMBED_DIM,
            taps=default_taps_vgg(),
            preprocess="caffe",  # keras vgg19.preprocess_input (BGR mean)
        )
    if name == "mobilenetv1":
        from fast_image_recognition_tpu.models.mobilenet import (
            default_taps_mobilenet_v1,
        )

        return dict(
            family="mobilenetv1",
            resolution=224,
            embedding_dim=1024,
            taps=default_taps_mobilenet_v1(),
            preprocess="tf",
        )
    raise ValueError(f"unknown backbone {name!r}")


def build_backbone(
    name: str, num_classes: int = 0, dtype: Any = jnp.bfloat16
):
    """Uninitialized module for a zoo name ('b0'..'b7', 'mobilenetv2[_W]',
    'inception_resnet_v2')."""
    if name in VARIANTS:
        return EfficientNet(variant=name, num_classes=num_classes, dtype=dtype)
    if name.startswith("mobilenetv2"):
        return MobileNetV2(
            width=_parse_mobilenet_width(name), num_classes=num_classes, dtype=dtype
        )
    if name == "inception_resnet_v2":
        from fast_image_recognition_tpu.models.inception_resnet import (
            InceptionResNetV2,
        )

        return InceptionResNetV2(num_classes=num_classes, dtype=dtype)
    if name == "inception_v3":
        from fast_image_recognition_tpu.models.inception_v3 import InceptionV3

        return InceptionV3(num_classes=num_classes, dtype=dtype)
    if name in ("resnet50", "resnet50v2", "resnet101v2", "resnet152v2"):
        from fast_image_recognition_tpu.models.resnet import ResNet

        return ResNet(variant=name, num_classes=num_classes, dtype=dtype)
    if name == "vgg19":
        from fast_image_recognition_tpu.models.vgg import VGG19

        return VGG19(num_classes=num_classes, dtype=dtype)
    if name.startswith("mobilenetv1"):
        from fast_image_recognition_tpu.models.mobilenet import MobileNetV1

        return MobileNetV1(num_classes=num_classes, dtype=dtype)
    raise ValueError(f"unknown backbone {name!r}")


def create_backbone(
    name: str,
    num_classes: int = 0,
    seed: int = 0,
    resolution: Optional[int] = None,
    dtype: Any = jnp.bfloat16,
) -> Tuple[Any, Any]:
    """Build + init any zoo backbone by name — the runtime replacement for
    the reference's get_model if/elif chain (dnn_feature_extractor.py:19-56,
    sequential_inference.py:342-435)."""
    if name in VARIANTS:
        return create_efficientnet(name, num_classes, seed, resolution, dtype)
    if name.startswith("mobilenetv2"):
        return create_mobilenetv2(
            _parse_mobilenet_width(name),
            num_classes,
            seed,
            resolution or 224,
            dtype,
        )
    if name == "inception_resnet_v2":
        from fast_image_recognition_tpu.models.inception_resnet import (
            create_inception_resnet_v2,
        )

        return create_inception_resnet_v2(
            num_classes, seed, resolution or 299, dtype
        )
    if name == "inception_v3":
        from fast_image_recognition_tpu.models.inception_v3 import (
            create_inception_v3,
        )

        return create_inception_v3(num_classes, seed, resolution or 299, dtype)
    if name in ("resnet50", "resnet50v2", "resnet101v2", "resnet152v2"):
        from fast_image_recognition_tpu.models.resnet import create_resnet

        return create_resnet(name, num_classes, seed, resolution or 224, dtype)
    if name == "vgg19":
        from fast_image_recognition_tpu.models.vgg import create_vgg19

        return create_vgg19(num_classes, seed, resolution or 224, dtype)
    if name.startswith("mobilenetv1"):
        from fast_image_recognition_tpu.models.mobilenet import (
            create_mobilenet_v1,
        )

        return create_mobilenet_v1(
            1.0, num_classes, seed, resolution or 224, dtype
        )
    raise ValueError(f"unknown backbone {name!r}")


def default_taps_for(name: str):
    return backbone_info(name)["taps"]
