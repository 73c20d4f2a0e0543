"""ctypes wrapper for the native (C++/libjpeg/libpng) paired-image loader.

Builds `native/imgloader.cpp` into a shared library on first use (g++, one
time, cached beside the source or in $SLIDERS_TPU_NATIVE_CACHE) and exposes

    load_batch(paths, resolution) -> (N, res, res, 3) float32 in [-1, 1]

with a threaded decode+bicubic-resize fan-out per batch. Falls back to the
PIL path (paired_images.preprocess_image) when the toolchain or image
libraries are unavailable — behavior is identical up to PIL's fixed-point
coefficient quantization (<= ~2/255 per channel, tests pin this).

Reference role: the inline PIL loads of
trainscripts/imagesliders/train_lora-scale.py:211-220.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "native", "imgloader.cpp")


def _build_lib() -> str | None:
    cache = os.environ.get("SLIDERS_TPU_NATIVE_CACHE") or os.path.join(
        os.path.dirname(_SRC)
    )
    out = os.path.join(cache, "libimgloader.so")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(_SRC):
        return out
    os.makedirs(cache, exist_ok=True)
    # build to a process-private temp path, then atomically rename: a
    # concurrent process can never dlopen a half-written .so (no -march=
    # native — the artifact may be cached in a dir shared across hosts)
    tmp = f"{out}.{os.getpid()}.tmp"
    cmd = [
        "g++", "-O3", "-funroll-loops", "-shared", "-fPIC", "-std=c++17",
        "-pthread", _SRC, "-o", tmp, "-ljpeg", "-lpng",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, out)
    except (OSError, subprocess.SubprocessError):
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return None
    return out


def _get_lib():
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        path = _build_lib()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            return None
        lib.img_load_batch.restype = ctypes.c_int
        lib.img_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
        ]
        _LIB = lib
        return _LIB


def available() -> bool:
    return _get_lib() is not None


def load_batch(paths: list[str], resolution: int) -> np.ndarray:
    """Decode + PIL-equivalent bicubic resize + [-1,1] normalize, threaded
    in native code. Raises FileNotFoundError/ValueError on bad inputs."""
    lib = _get_lib()
    n = len(paths)
    out = np.empty((n, resolution, resolution, 3), np.float32)
    if lib is None:
        from PIL import Image

        from sliders_tpu.data.paired_images import preprocess_image

        for i, p in enumerate(paths):
            out[i] = preprocess_image(Image.open(p), resolution)
        return out
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.img_load_batch(
        arr, n, resolution, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    )
    if rc != 0:
        bad = paths[rc - 1]
        if not os.path.exists(bad):
            raise FileNotFoundError(bad)
        raise ValueError(f"cannot decode image: {bad}")
    return out
