"""ctypes bindings for the native ingest library.

Builds on demand (``make -C runtime``) and transparently falls back to the
NumPy parser in data/feature_io.py when the shared library is unavailable.
The C++ parser implements the same db_features.cpp:44-116 semantics and is
~10-50x faster on big galleries (multi-threaded float parsing).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libfir_ingest.so")
_lib: Optional[ctypes.CDLL] = None


def _ensure_lib(build: bool = True) -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and build:
        try:
            subprocess.run(
                ["make", "-C", _HERE, "-s"],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.fir_load_features.restype = ctypes.c_void_p
    lib.fir_load_features.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.fir_num_images.argtypes = [ctypes.c_void_p]
    lib.fir_num_classes.argtypes = [ctypes.c_void_p]
    lib.fir_copy_features.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.fir_copy_labels.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.fir_class_name.argtypes = [
        ctypes.c_void_p,
        ctypes.c_int,
        ctypes.c_char_p,
        ctypes.c_int,
    ]
    lib.fir_class_name.restype = ctypes.c_int
    lib.fir_file_name.argtypes = lib.fir_class_name.argtypes
    lib.fir_file_name.restype = ctypes.c_int
    lib.fir_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def native_available() -> bool:
    return _ensure_lib() is not None


def load_feature_file_native(
    path: str,
    features_count: int,
    skip_class_substrings: Sequence[str] = (),
    max_classes: Optional[int] = None,
    l2_normalize: bool = True,
    n_threads: int = 0,
    with_file_names: bool = False,
):
    """Returns a FeatureDB, or None when the native library is unavailable."""
    from fast_image_recognition_tpu.data.feature_io import FeatureDB

    lib = _ensure_lib()
    if lib is None:
        return None

    skips = [s.encode() for s in skip_class_substrings]
    arr = (ctypes.c_char_p * max(len(skips), 1))(*skips) if skips else None
    handle = lib.fir_load_features(
        path.encode(),
        features_count,
        arr,
        len(skips),
        max_classes or 0,
        1 if l2_normalize else 0,
        n_threads,
    )
    if not handle:
        raise FileNotFoundError(path)
    try:
        n = lib.fir_num_images(handle)
        c = lib.fir_num_classes(handle)
        features = np.empty((n, features_count), dtype=np.float32)
        labels = np.empty(n, dtype=np.int32)
        if n:
            lib.fir_copy_features(
                handle, features.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
            )
            lib.fir_copy_labels(
                handle, labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
            )
        buf = ctypes.create_string_buffer(4096)
        class_names = []
        for i in range(c):
            lib.fir_class_name(handle, i, buf, len(buf))
            class_names.append(buf.value.decode())
        file_names = []
        if with_file_names:
            for i in range(n):
                lib.fir_file_name(handle, i, buf, len(buf))
                file_names.append(buf.value.decode())
        return FeatureDB(
            features=features,
            labels=labels,
            class_names=class_names,
            file_names=file_names if with_file_names else [""] * n,
        )
    finally:
        lib.fir_free(handle)
