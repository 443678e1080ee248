"""X-path: the 14-op matrix as jitted jax.numpy / lax library calls.

This is the TPU analogue of the reference's library-call backends (OpenCV
T-API, MATLAB gpuArray, VisionGL CL shaders — SURVEY.md §2.2 item 3): no
hand-written kernels, just XLA-generated ones from high-level ops
(lax.reduce_window for erosion, lax.conv_general_dilated for convolution).

All functions take and return uint8 (H, W, C=3) RGB jax arrays and are
bit-exact against dip_benchmark_tpu.oracle. Convolution uses the exact
integer formulation (see spec module docstring) so float accumulation order
is irrelevant.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import lax

from .. import spec


def mirror_pad(x: jnp.ndarray, pad_y: int, pad_x: int) -> jnp.ndarray:
    """SYCL-parity mirror pad (low: -i, high: 2n-i-1) on H and W dims."""
    if pad_y:
        top = jnp.flip(x[1:pad_y + 1], axis=0)        # i=-k -> k
        bot = jnp.flip(x[-pad_y:], axis=0)            # i=n-1+k -> n-k
        x = jnp.concatenate([top, x, bot], axis=0)
    if pad_x:
        left = jnp.flip(x[:, 1:pad_x + 1], axis=1)
        right = jnp.flip(x[:, -pad_x:], axis=1)
        x = jnp.concatenate([left, x, right], axis=1)
    return x


# ---------------------------------------------------------------------------
# Point ops
# ---------------------------------------------------------------------------

def copy(x: jnp.ndarray) -> jnp.ndarray:
    """On-device HBM->HBM copy (the reference's cudaMemcpy D2D analogue)."""
    return jnp.copy(x)


def inversion(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.uint8(255) - x


def grayscale(x: jnp.ndarray) -> jnp.ndarray:
    r = x[..., 0].astype(jnp.float32)
    g = x[..., 1].astype(jnp.float32)
    b = x[..., 2].astype(jnp.float32)
    wr, wg, wb = (jnp.float32(w) for w in spec.GRAYSCALE_WEIGHTS_RGB)
    gray = (wb * b + wg * g) + wr * r
    gray_u8 = gray.astype(jnp.uint8)  # truncating cast, like static_cast
    return jnp.repeat(gray_u8[..., None], 3, axis=2)


def threshold(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(x > spec.THRESHOLD_VALUE,
                     jnp.uint8(spec.THRESHOLD_MAX), jnp.uint8(0))


# ---------------------------------------------------------------------------
# Erosion (lax.reduce_window min — the library call for morphology)
# ---------------------------------------------------------------------------

def _erode_window(x: jnp.ndarray, kh: int, kw: int) -> jnp.ndarray:
    """Min over a kh x kw rectangle, mirror borders."""
    padded = mirror_pad(x, kh // 2, kw // 2)
    return lax.reduce_window(
        padded, np.uint8(255), lax.min,
        window_dimensions=(kh, kw, 1), window_strides=(1, 1, 1),
        padding="VALID")


def erosion_cross(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 cross = min(1x3 row window, 3x1 col window) over one shared pad."""
    return jnp.minimum(_erode_window(x, 1, 3), _erode_window(x, 3, 1))


def erosion_square(x: jnp.ndarray) -> jnp.ndarray:
    return _erode_window(x, 3, 3)


def _dilate_window(x: jnp.ndarray, kh: int, kw: int) -> jnp.ndarray:
    padded = mirror_pad(x, kh // 2, kw // 2)
    return lax.reduce_window(
        padded, np.uint8(0), lax.max,
        window_dimensions=(kh, kw, 1), window_strides=(1, 1, 1),
        padding="VALID")


def dilation_square(x: jnp.ndarray) -> jnp.ndarray:
    """Max-morphology counterpart (library completeness; the reference
    defines but never benchmarks dilation, opencv/benchmark.py:80-82)."""
    return _dilate_window(x, 3, 3)


def dilation_separated(x: jnp.ndarray) -> jnp.ndarray:
    return _dilate_window(_dilate_window(x, 1, 3), 3, 1)


def erosion_separated(x: jnp.ndarray) -> jnp.ndarray:
    """1x3 pass into aux, then 3x1 pass (re-mirrors aux borders, like the
    reference's two-dispatch chain [sycl/benchmark.cpp:341-344])."""
    aux = _erode_window(x, 1, 3)
    return _erode_window(aux, 3, 1)


# ---------------------------------------------------------------------------
# Convolution (lax.conv_general_dilated — the library call for filtering)
# ---------------------------------------------------------------------------

def _conv(x: jnp.ndarray, int_mask: np.ndarray, shift: int) -> jnp.ndarray:
    """Integer shift-MAC correlation: round-half-up via add + right shift.

    A depthwise lax.conv_general_dilated would be the literal library call,
    but (a) a C=3 depthwise conv cannot tile the MXU and (b) the experimental
    axon PJRT platform miscompiles convs fused with convert/transpose
    producers (verified empirically: jitted conv fed by a u8->f32 cast
    returns zeros). The unrolled slice-MAC form is exact, fuses into a
    single VPU pass, and is faster for these tiny masks.
    """
    kh, kw = int_mask.shape
    padded = mirror_pad(x, kh // 2, kw // 2).astype(jnp.int32)
    h, w = x.shape[0], x.shape[1]
    acc = None
    for ky in range(kh):
        for kx in range(kw):
            term = int(int_mask[ky, kx]) * lax.slice(
                padded, (ky, kx, 0), (ky + h, kx + w, padded.shape[2]))
            acc = term if acc is None else acc + term
    half = 1 << (shift - 1)
    result = (acc + half) >> shift
    return jnp.clip(result, 0, 255).astype(jnp.uint8)


def convolution_3x3(x: jnp.ndarray) -> jnp.ndarray:
    return _conv(x, spec.BLUR_3X3_INT, spec.BLUR_3X3_SHIFT)


def convolution_3x3_separated(x: jnp.ndarray) -> jnp.ndarray:
    aux = _conv(x, spec.BLUR_1X3_INT, spec.BLUR_SEP3_SHIFT)
    return _conv(aux, spec.BLUR_3X1_INT, spec.BLUR_SEP3_SHIFT)


def convolution_5x5(x: jnp.ndarray) -> jnp.ndarray:
    return _conv(x, spec.BLUR_5X5_INT, spec.BLUR_5X5_SHIFT)


def convolution_5x5_separated(x: jnp.ndarray) -> jnp.ndarray:
    aux = _conv(x, spec.BLUR_1X5_INT, spec.BLUR_SEP5_SHIFT)
    return _conv(aux, spec.BLUR_5X1_INT, spec.BLUR_SEP5_SHIFT)


def gaussian_blur_3x3(x: jnp.ndarray) -> jnp.ndarray:
    """Op #14, the library-native blur: on the X-path this IS the library
    call (same op as convolution_3x3; the P-path carries the specialized
    const-weight kernel the op exists to measure)."""
    return convolution_3x3(x)


def fused_pipeline(x: jnp.ndarray) -> jnp.ndarray:
    """Flagship fused chain: grayscale -> threshold -> erode(3x3) -> blur."""
    return gaussian_blur_3x3(erosion_square(threshold(grayscale(x))))


# CSV-column-keyed registry of the 12 on-device image ops (memory ops Upload/
# Download are host-boundary ops owned by the harness).
IMAGE_OPS = {
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
    # Extra (non-reference) row for --pipeline.
    "Fused-Pipeline": fused_pipeline,
}
