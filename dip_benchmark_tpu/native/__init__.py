"""ctypes binding for the native C++ runtime library (dipnative.cpp).

Builds the shared library on demand with the system toolchain (g++) and
caches it next to the source; falls back gracefully (``available() ->
False``) when no toolchain exists, in which case callers use the NumPy
oracle / perf_counter instead. pybind11 is deliberately not used (not in
the baked image); the plain C ABI + ctypes keeps the binding dependency-free.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "dipnative.cpp")
_LIB_PATH = os.path.join(_HERE, "_dipnative.so")
_lock = threading.Lock()
_lib = None
_build_error: str | None = None


def _build() -> str | None:
    for omp in (["-fopenmp"], []):
        cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
               *omp, _SRC, "-o", _LIB_PATH]
        try:
            proc = subprocess.run(cmd, capture_output=True, text=True,
                                  timeout=120)
        except (OSError, subprocess.TimeoutExpired) as e:
            return f"{type(e).__name__}: {e}"
        if proc.returncode == 0:
            return None
    return proc.stderr[-500:]


def _load():
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        if not os.path.exists(_LIB_PATH) or (
                os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
            _build_error = _build()
            if _build_error is not None:
                return None
        try:
            lib = _bind(ctypes.CDLL(_LIB_PATH))
        except (OSError, AttributeError):
            # A corrupt/partial .so (interrupted g++, concurrent builder
            # in another process) has a fresh mtime; rebuild once, and if
            # the library still won't load, degrade to the NumPy oracle —
            # available() must return False, never raise.
            _build_error = _build()
            if _build_error is not None:
                return None
            try:
                lib = _bind(ctypes.CDLL(_LIB_PATH))
            except (OSError, AttributeError) as e:
                _build_error = f"load failed after rebuild: {e}"
                return None
        _lib = lib
        return _lib


def _bind(lib):
    lib.dip_monotonic_ns.restype = ctypes.c_uint64
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    ci = ctypes.c_int
    for name in ("dip_copy", "dip_inversion", "dip_threshold",
                 "dip_grayscale"):
        getattr(lib, name).argtypes = [u8p, u8p, ci, ci, ci]
    lib.dip_erosion.argtypes = [u8p, u8p, ci, ci, ci, u8p, ci, ci]
    lib.dip_convolution.argtypes = [u8p, u8p, ci, ci, ci, i32p, ci, ci, ci]
    return lib


def available() -> bool:
    return _load() is not None


def build_error() -> str | None:
    _load()
    return _build_error


def monotonic_ns() -> int:
    lib = _load()
    if lib is None:  # pragma: no cover - toolchain always present in CI image
        import time
        return time.perf_counter_ns()
    return lib.dip_monotonic_ns()


def _run(name: str, image: np.ndarray, *extra) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native library unavailable: {_build_error}")
    if image.dtype != np.uint8 or image.ndim != 3 or image.shape[2] != 3:
        # ValueError, not assert (python -O strips asserts) — and the C
        # kernels hard-code 3 channels (dip_grayscale reads px[1]/px[2]),
        # so anything else would be a heap over-read, not a wrong answer.
        raise ValueError(
            f"native ops take uint8 HWC RGB arrays, got "
            f"dtype={image.dtype} shape={image.shape}")
    image = np.ascontiguousarray(image)
    out = np.empty_like(image)
    h, w, c = image.shape
    getattr(lib, name)(image, out, h, w, c, *extra)
    return out


def copy(image):
    return _run("dip_copy", image)


def inversion(image):
    return _run("dip_inversion", image)


def threshold(image):
    return _run("dip_threshold", image)


def grayscale(image):
    return _run("dip_grayscale", image)


def erosion(image, mask: np.ndarray):
    mask = np.ascontiguousarray(mask.astype(np.uint8))
    return _run("dip_erosion", image, mask, mask.shape[0], mask.shape[1])


def convolution(image, int_mask: np.ndarray, shift: int):
    m = np.ascontiguousarray(int_mask.astype(np.int32))
    return _run("dip_convolution", image, m, m.shape[0], m.shape[1], shift)


def image_ops() -> dict:
    """CSV-column-keyed native oracle, mirroring oracle.IMAGE_OPS."""
    from .. import spec

    def erosion_separated(im):
        return erosion(erosion(im, spec.SQUARE_MASK_1X3), spec.SQUARE_MASK_3X1)

    def conv_sep(im, m1, m2, shift):
        return convolution(convolution(im, m1, shift), m2, shift)

    return {
        "Copy": copy,
        "Inversion": inversion,
        "Grayscale": grayscale,
        "Threshold": threshold,
        "Erosion-3x3-Cross": lambda im: erosion(im, spec.CROSS_MASK_3X3),
        "Erosion-3x3-Square": lambda im: erosion(im, spec.SQUARE_MASK_3X3),
        "Erosion-1x3+3x1-Square": erosion_separated,
        "Convolution-3x3": lambda im: convolution(
            im, spec.BLUR_3X3_INT, spec.BLUR_3X3_SHIFT),
        "Convolution-1x3+3x1": lambda im: conv_sep(
            im, spec.BLUR_1X3_INT, spec.BLUR_3X1_INT, spec.BLUR_SEP3_SHIFT),
        "Convolution-5x5": lambda im: convolution(
            im, spec.BLUR_5X5_INT, spec.BLUR_5X5_SHIFT),
        "Convolution-1x5+5x1": lambda im: conv_sep(
            im, spec.BLUR_1X5_INT, spec.BLUR_5X1_INT, spec.BLUR_SEP5_SHIFT),
        "Gaussian-Blur-3x3": lambda im: convolution(
            im, spec.BLUR_3X3_INT, spec.BLUR_3X3_SHIFT),
        "Fused-Pipeline": lambda im: convolution(
            erosion(threshold(grayscale(im)), spec.SQUARE_MASK_3X3),
            spec.BLUR_3X3_INT, spec.BLUR_3X3_SHIFT),
    }
