#!/usr/bin/env python
"""Feature extractor CLI (qt_cpp/dnn_feature_extractor.py:132-177):
walks <dataset>/<class>/*.jpg, extracts pooled EfficientNet embeddings
(batched + jitted; optionally data-parallel over the mesh), writes the
3-line text format consumed by the matchers."""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("dataset_root", help="directory of <class>/<image> dirs")
    parser.add_argument("output", help="output feature file path")
    parser.add_argument("--variant", default="b0", help="backbone: b0..b7 | mobilenetv1 | mobilenetv2[_W] | inception_v3 | inception_resnet_v2 | resnet50[v2] | resnet101v2 | resnet152v2 | vgg19")
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--checkpoint", default=None, help="msgpack flax checkpoint")
    parser.add_argument("--data-parallel", type=int, default=0, help="DP mesh size (0=off)")
    args = parser.parse_args()

    from fast_image_recognition_tpu.models.extractor import extract_dataset_to_file

    variables = None
    if args.checkpoint:
        from fast_image_recognition_tpu.utils.checkpoint import load_variables

        variables = load_variables(args.checkpoint)

    mesh = None
    if args.data_parallel:
        import jax
        import numpy as np
        from jax.sharding import Mesh

        mesh = Mesh(
            np.asarray(jax.devices()[: args.data_parallel]).reshape(-1, 1),
            axis_names=("data", "model"),
        )

    n = extract_dataset_to_file(
        args.dataset_root,
        args.output,
        variant=args.variant,
        variables=variables,
        batch_size=args.batch_size,
        mesh=mesh,
    )
    print(f"extracted {n} images -> {args.output}")


if __name__ == "__main__":
    main()
