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
    """Coefficient-row formulation on the flat (H, W*3) minor dim.

    Round-1's channel-split forms (tensordot / einsum / CHW round-trip)
    all cost ~5.4 ms/image on TPU — strided per-channel access on the C=3
    minor axis forces a relayout (~2.7 ms each way; xla_lab.py). Round 2:
    never split channels. Flatten to (H, W*3) — a free view of the
    row-major layout — and compute every output byte directly (the
    replicate-to-3 contract makes the flat output the luma repeated per
    byte). out[k] = luma(pixel k//3) = sum over tap offsets d in [-2, 2]
    of C_d[k] * f[k+d], where C_d[k] = w((k%3)+d) when 0 <= (k%3)+d <= 2
    and 0 otherwise — one PRECOMPUTED periodic i32 coefficient row per
    offset, so the op is a select-free 5-tap MAC that XLA fuses into one
    VPU pass. Measured ~375 us/image true execution vs ~407 for the
    phase-select (6 wheres) form and ~5700 for channel-split, repeatable
    at the tight K=50/250 chained protocol; absolute numbers swing
    1.5-2x with relay weather (benchmarks/tuning/xla_gray_lab.py).
    Exact: each pixel accumulates the identical integer products as the
    oracle.
    """
    h, w, c = x.shape
    n = w * c
    f = x.reshape(h, n)
    p = jnp.pad(f, ((0, 0), (2, 2)))
    wrgb = np.asarray(spec.GRAYSCALE_WEIGHTS_INT_RGB, dtype=np.int64)
    ks = np.arange(n) % 3
    acc = None
    for d in (-2, -1, 0, 1, 2):
        ch = ks + d
        cd = np.where((ch >= 0) & (ch <= 2), wrgb[np.clip(ch, 0, 2)],
                      0).astype(np.int32)
        s = lax.slice(p, (0, 2 + d), (h, 2 + d + n)).astype(jnp.int32)
        t = s * jnp.asarray(cd)[None, :]
        acc = t if acc is None else acc + t
    y = acc >> spec.GRAYSCALE_SHIFT
    return y.astype(jnp.uint8).reshape(h, w, c)


def threshold(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(x > spec.THRESHOLD_VALUE,
                     jnp.uint8(spec.THRESHOLD_MAX), jnp.uint8(0))


# ---------------------------------------------------------------------------
# Erosion. Library formulation choice, measured on hardware
# (benchmarks/tuning/xla_lab.py): lax.reduce_window(min) compiles to a
# ~1.34 ms/image kernel, while the equivalent min-of-shifted-slices fuses to
# a single ~0.54 ms VPU pass (0.30 ms for the separable pair) — both are
# plain jnp/lax library calls into XLA, so the X-path uses the fast one.
# ---------------------------------------------------------------------------

def _min_slices(p: jnp.ndarray, offs, out_h: int, out_w: int) -> jnp.ndarray:
    """Min over (dy, dx)-shifted slices of the padded array p."""
    c = p.shape[2]
    acc = None
    for dy, dx in offs:
        t = lax.slice(p, (dy, dx, 0), (dy + out_h, dx + out_w, c))
        acc = t if acc is None else jnp.minimum(acc, t)
    return acc


def erosion_square(x: jnp.ndarray) -> jnp.ndarray:
    """Separable: row-min of 3 then col-min of 3 (exact factorization)."""
    h, w, _ = x.shape
    p = mirror_pad(x, 1, 1)
    rows = _min_slices(p, [(0, 0), (1, 0), (2, 0)], h, w + 2)
    return _min_slices(rows, [(0, 0), (0, 1), (0, 2)], h, w)


def erosion_cross(x: jnp.ndarray) -> jnp.ndarray:
    """Center column's 3 slices + the center row's 2 shifted slices."""
    h, w, _ = x.shape
    p = mirror_pad(x, 1, 1)
    vert = _min_slices(p, [(0, 1), (1, 1), (2, 1)], h, w)
    return jnp.minimum(vert, _min_slices(p, [(1, 0), (1, 2)], h, w))


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
    h, w, _ = x.shape
    aux = _min_slices(mirror_pad(x, 0, 1), [(0, 0), (0, 1), (0, 2)], h, w)
    return _min_slices(mirror_pad(aux, 1, 0), [(0, 0), (1, 0), (2, 0)], h, w)


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
    """Flagship fused chain: grayscale -> threshold -> erode(3x3) -> blur.

    Flat-domain formulation (benchmarks/tuning/xla_pipe_lab.py): the four
    stages stay on ONE flat (H, W*3) i32 view end to end — coef-rows luma
    MAC, threshold in i32 (no narrow), erosion as separable mins over
    taps (dy, 3*dx) (stride-3 column taps ARE per-channel taps), then the
    separable 1-2-1 blur MAC with a single round + narrow. One mirror
    halo (2 rows, 2 pixels as 3-byte blocks) serves both windowed stages
    with the halo shrinking per stage. Composing the four standalone ops
    instead costs 1.66x more (each op round-trips through uint8 HWC with
    its own pad, which breaks XLA fusion; measured 3382 vs 2033 us).
    Bit-exact vs the op-by-op oracle chain: threshold's {0, 255} output
    held in i32, integer min/MAC, round-half-up once (the models/
    pipeline.py argument)."""
    h, w, c = x.shape
    n = w * c
    f = x.reshape(h, n)
    # stages 1+2: coef-rows grayscale MAC -> threshold, i32 domain
    p = jnp.pad(f, ((0, 0), (2, 2)))
    wrgb = np.asarray(spec.GRAYSCALE_WEIGHTS_INT_RGB, dtype=np.int64)
    ks = np.arange(n) % 3
    acc = None
    for d in (-2, -1, 0, 1, 2):
        ch = ks + d
        cd = np.where((ch >= 0) & (ch <= 2), wrgb[np.clip(ch, 0, 2)],
                      0).astype(np.int32)
        s = lax.slice(p, (0, 2 + d), (h, 2 + d + n)).astype(jnp.int32)
        t = s * jnp.asarray(cd)[None, :]
        acc = t if acc is None else acc + t
    luma = acc >> spec.GRAYSCALE_SHIFT
    v = jnp.where(luma > spec.THRESHOLD_VALUE, spec.THRESHOLD_MAX, 0)
    # mirror halo for the two windowed stages: 2 rows, 2 pixel blocks
    v = jnp.concatenate([v[1:3][::-1], v, v[-2:][::-1]], axis=0)
    hp = v.shape[0]
    left = v[:, 3:9].reshape(hp, 2, 3)[:, ::-1].reshape(hp, 6)
    right = v[:, n - 6:n].reshape(hp, 2, 3)[:, ::-1].reshape(hp, 6)
    v = jnp.concatenate([left, v, right], axis=1)  # (h+4, n+12)
    # stage 3: erosion 3x3 square, separable min, taps (dy, 3*dx)
    rows = h + 2  # keep 1 row + 1 pixel of halo for the blur
    cm = jnp.minimum(jnp.minimum(v[0:rows], v[1:rows + 1]), v[2:rows + 2])
    m = 6 + n
    e = jnp.minimum(jnp.minimum(cm[:, 0:m], cm[:, 3:m + 3]),
                    cm[:, 6:m + 6])  # (h+2, n+6)
    # stage 4: specialized 1-2-1 blur, one round, one narrow
    aux = e[0:h] + (e[1:h + 1] << 1) + e[2:h + 2]
    o = aux[:, 0:n] + (aux[:, 3:n + 3] << 1) + aux[:, 6:n + 6]
    y = (o + 8) >> 4
    return y.astype(jnp.uint8).reshape(h, w, c)


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
