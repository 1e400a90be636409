"""DNN feature extraction — the producer of the matcher's gallery.

Reference: qt_cpp/dnn_feature_extractor.py — walks ``<dataset>/<class>/*.jpg``,
runs the backbone with pooled features only, and writes the 3-line text
format (58-64). There, extraction is one ``sess.run`` per image (a device
boundary crossing per image, SURVEY.md §3.5); here it is batched, jitted,
and optionally data-parallel over the mesh's ``data`` axis with pjit — no
gradient sync is needed at inference so DP is pure throughput scaling.
"""

from __future__ import annotations

import os
from typing import Iterable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fast_image_recognition_tpu.models import (
    backbone_info,
    build_backbone,
    create_backbone,
)
IMAGE_EXTENSIONS = (".jpg", ".jpeg", ".png", ".bmp")


class FeatureExtractor:
    """Batched pooled-embedding extractor over any zoo backbone
    ('b0'..'b7', 'mobilenetv1', 'mobilenetv2[_W]', 'inception_v3',
    'inception_resnet_v2', 'resnet50[v2]'/'resnet101v2'/'resnet152v2',
    'vgg19' — the full dnn_feature_extractor.py:19-56 model menu)."""

    def __init__(
        self,
        variant: str = "b0",
        variables=None,
        resolution: Optional[int] = None,
        mesh: Optional[Mesh] = None,
        seed: int = 0,
        folded: bool = True,
    ):
        self.variant = variant
        self._info = backbone_info(variant)
        self.resolution = resolution or self._info["resolution"]
        self.model, self.variables = (
            create_backbone(variant, 0, seed, self.resolution)
            if variables is None
            else (build_backbone(variant, 0), variables)
        )
        self.mesh = mesh
        # Unified folded serving entry (models/fold.py): MBConv families run
        # the dedicated functional fold; every other BN family runs the
        # variables-level fold through model.apply (family-correct
        # preprocessing — torch/tf/caffe, dnn_feature_extractor.py:52-56 —
        # is selected/folded there too).
        from fast_image_recognition_tpu.models.fold import make_serving_fn

        infer, self._folded = make_serving_fn(
            self.model, self.variables, self._info,
            resolution=self.resolution, folded=folded,
        )

        def forward(variables, images):
            return infer(variables, images)["embedding"]

        if mesh is not None:
            self._forward = jax.jit(
                forward,
                in_shardings=(
                    NamedSharding(mesh, P()),  # params replicated
                    NamedSharding(mesh, P("data", None, None, None)),
                ),
                out_shardings=NamedSharding(mesh, P("data", None)),
            )
            self._dp = mesh.shape["data"]
        else:
            self._forward = jax.jit(forward)
            self._dp = 1

    @property
    def embedding_dim(self) -> int:
        return int(self._info["embedding_dim"])

    def extract(self, images: np.ndarray, batch_size: int = 256) -> np.ndarray:
        """images: [N, H, W, 3] uint8/float -> [N, F] float32 embeddings."""
        n = images.shape[0]
        # batch must divide evenly across the data axis
        batch_size = max(self._dp, batch_size - batch_size % self._dp)
        outs = []
        for s in range(0, n, batch_size):
            chunk = images[s : s + batch_size]
            pad = 0
            if chunk.shape[0] % self._dp:
                pad = self._dp - chunk.shape[0] % self._dp
                chunk = np.concatenate([chunk, chunk[-1:].repeat(pad, 0)], axis=0)
            emb = self._forward(self._folded, jnp.asarray(chunk))
            emb = np.asarray(emb)
            outs.append(emb[: emb.shape[0] - pad] if pad else emb)
        return np.concatenate(outs, axis=0)

    def extract_normalized(
        self, images: np.ndarray, batch_size: int = 256
    ) -> np.ndarray:
        """L2-normalized embeddings — cosine-/L2-ready gallery rows.

        Pure row normalization: the |f|<1e-4 zeroing of db_features.cpp:85-87
        is a *load-time* rule for the text interchange format (applied in
        data/feature_io.py), not part of extraction."""
        feats = self.extract(images, batch_size).astype(np.float64)
        norms = np.linalg.norm(feats, axis=1, keepdims=True)
        norms[norms == 0.0] = 1.0
        return (feats / norms).astype(np.float32)


def list_image_dataset(
    root: str, extensions: Sequence[str] = IMAGE_EXTENSIONS
) -> Tuple[List[str], List[int], List[str]]:
    """Walk <root>/<class>/<image> (dnn_feature_extractor.py:132-160).
    Returns (paths, labels, class_names) with classes in sorted order."""
    class_names = sorted(
        d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
    )
    paths: List[str] = []
    labels: List[int] = []
    for ci, cname in enumerate(class_names):
        cdir = os.path.join(root, cname)
        for fname in sorted(os.listdir(cdir)):
            if fname.lower().endswith(tuple(extensions)):
                paths.append(os.path.join(cdir, fname))
                labels.append(ci)
    return paths, labels, class_names


def load_images(
    paths: Iterable[str], resolution: int
) -> Tuple[np.ndarray, List[int]]:
    """Decode + resize images on host. Returns (images [N,R,R,3] uint8,
    indices of successfully read paths) — unreadable files are skipped like
    dnn_feature_extractor.py:158-163."""
    from PIL import Image  # host-side decode; TPU path starts at extract()

    out = []
    kept = []
    for i, p in enumerate(paths):
        try:
            with Image.open(p) as im:
                im = im.convert("RGB").resize((resolution, resolution))
                out.append(np.asarray(im, dtype=np.uint8))
                kept.append(i)
        except Exception:
            continue
    if not out:
        return np.zeros((0, resolution, resolution, 3), dtype=np.uint8), []
    return np.stack(out), kept


def extract_dataset_to_file(
    root: str,
    output_path: str,
    variant: str = "b0",
    variables=None,
    batch_size: int = 64,
    mesh: Optional[Mesh] = None,
) -> int:
    """The dnn_feature_extractor.py CLI pipeline: dataset dir -> text
    feature file in the 3-line format. Returns image count."""
    from fast_image_recognition_tpu.data.feature_io import write_feature_file

    if not os.path.isdir(root):
        raise FileNotFoundError(f"dataset root is not a directory: {root}")
    paths, labels, class_names = list_image_dataset(root)
    extractor = FeatureExtractor(variant, variables=variables, mesh=mesh)
    images, kept = load_images(paths, extractor.resolution)
    labels = [labels[i] for i in kept]
    names = [os.path.basename(paths[i]) for i in kept]
    # Write L2-normalized rows: the loader re-normalizes (idempotent), and
    # normalized components (~1/sqrt(D)) stay safely above the loader's
    # |f| < 1e-4 zeroing threshold regardless of the backbone's raw
    # activation scale.
    feats = extractor.extract_normalized(images, batch_size=batch_size)
    write_feature_file(output_path, feats, np.asarray(labels), class_names, names)
    return len(kept)
