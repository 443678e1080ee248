"""X-path ops for the float32 planar-CHW data model (CUDA.jl parity knob).

Mirrors oracle_f32 semantics exactly (see its docstring for the deltas from
the buggy CUDA.jl kernels). All functions take/return float32 (3, H, W)
arrays in [0,1]. Selected with --dtype float32 on the CLI.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import lax

from .. import spec


def mirror_pad_chw(x: jnp.ndarray, py: int, px: int) -> jnp.ndarray:
    """SYCL-parity mirror pad on the H/W dims of a (C, H, W) array."""
    if py:
        top = jnp.flip(x[:, 1:py + 1], axis=1)
        bot = jnp.flip(x[:, -py:], axis=1)
        x = jnp.concatenate([top, x, bot], axis=1)
    if px:
        left = jnp.flip(x[:, :, 1:px + 1], axis=2)
        right = jnp.flip(x[:, :, -px:], axis=2)
        x = jnp.concatenate([left, x, right], axis=2)
    return x


def copy(x):
    return jnp.copy(x)


def inversion(x):
    return jnp.float32(1.0) - x


def grayscale(x):
    wr, wg, wb = (jnp.float32(w) for w in spec.GRAYSCALE_WEIGHTS_RGB)
    gray = wr * x[0] + wg * x[1] + wb * x[2]
    return jnp.broadcast_to(gray, x.shape)


def threshold(x):
    return jnp.where(x > jnp.float32(0.5), jnp.float32(1.0), jnp.float32(0.0))


def _erode_window(x, kh: int, kw: int):
    padded = mirror_pad_chw(x, kh // 2, kw // 2)
    return lax.reduce_window(
        padded, np.float32(np.inf), lax.min,
        window_dimensions=(1, kh, kw), window_strides=(1, 1, 1),
        padding="VALID")


def erosion_cross(x):
    return jnp.minimum(_erode_window(x, 1, 3), _erode_window(x, 3, 1))


def erosion_square(x):
    return _erode_window(x, 3, 3)


def erosion_separated(x):
    return _erode_window(_erode_window(x, 1, 3), 3, 1)


def _conv(x, int_mask: np.ndarray, shift: int):
    fmask = spec.mask_float(int_mask, shift)
    kh, kw = fmask.shape
    padded = mirror_pad_chw(x, kh // 2, kw // 2)
    h, w = x.shape[1], x.shape[2]
    # column-sums-then-columns: the shared f32 accumulation order (see
    # oracle_f32.convolution docstring)
    acc = None
    for kx in range(kw):
        col = None
        for ky in range(kh):
            term = jnp.float32(fmask[ky, kx]) * lax.slice(
                padded, (0, ky, kx), (x.shape[0], ky + h, kx + w))
            col = term if col is None else col + term
        acc = col if acc is None else acc + col
    return acc


def convolution_3x3(x):
    return _conv(x, spec.BLUR_3X3_INT, spec.BLUR_3X3_SHIFT)


def convolution_3x3_separated(x):
    return _conv(_conv(x, spec.BLUR_1X3_INT, spec.BLUR_SEP3_SHIFT),
                 spec.BLUR_3X1_INT, spec.BLUR_SEP3_SHIFT)


def convolution_5x5(x):
    return _conv(x, spec.BLUR_5X5_INT, spec.BLUR_5X5_SHIFT)


def convolution_5x5_separated(x):
    return _conv(_conv(x, spec.BLUR_1X5_INT, spec.BLUR_SEP5_SHIFT),
                 spec.BLUR_5X1_INT, spec.BLUR_SEP5_SHIFT)


def gaussian_blur_3x3(x):
    return convolution_3x3(x)


def fused_pipeline(x):
    return gaussian_blur_3x3(erosion_square(threshold(grayscale(x))))


IMAGE_OPS_F32 = {
    "Copy": copy,
    "Inversion": inversion,
    "Grayscale": grayscale,
    "Threshold": threshold,
    "Erosion-3x3-Cross": erosion_cross,
    "Erosion-3x3-Square": erosion_square,
    "Erosion-1x3+3x1-Square": erosion_separated,
    "Convolution-3x3": convolution_3x3,
    "Convolution-1x3+3x1": convolution_3x3_separated,
    "Convolution-5x5": convolution_5x5,
    "Convolution-1x5+5x1": convolution_5x5_separated,
    "Gaussian-Blur-3x3": gaussian_blur_3x3,
    "Fused-Pipeline": fused_pipeline,
}
