"""P-path Pallas kernels for the float32 planar-CHW data model.

The hand-written-kernel analogue of the CUDA.jl backend's data model
(planar CHW float32 in [0,1], cuda/benchmark.jl:171-179), sharing the
uint8 path's banded-DMA skeleton (_windowed_call) and layout geometry —
only the element type and arithmetic differ (native f32, no widening,
no rounding in convolutions). Semantics match oracle_f32 (within f32
reassociation tolerance for convolutions; exact for point/min ops).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ... import spec
from ...utils.image import PlanarLayout
from .common import GRAY_BAND, POINT_BAND, interpret_mode
from .point import _copy_dma, _elementwise
from .window import _divisor_band, _shift, _windowed_call, mask_to_taps


def _inversion_kernel(in_ref, out_ref):
    out_ref[:] = jnp.float32(1.0) - in_ref[:]


def _threshold_kernel(in_ref, out_ref):
    out_ref[:] = jnp.where(in_ref[:] > jnp.float32(0.5),
                           jnp.float32(1.0), jnp.float32(0.0))


def _grayscale(layout: PlanarLayout):
    c, hp, wp = layout.shape
    band = max(8, GRAY_BAND // 4)  # f32 blocks are 4x the bytes of u8

    def kernel(in_ref, out_ref):
        wr, wg, wb = (jnp.float32(w) for w in spec.GRAYSCALE_WEIGHTS_RGB)
        gray = wr * in_ref[0] + wg * in_ref[1] + wb * in_ref[2]
        out_ref[0] = gray
        out_ref[1] = gray
        out_ref[2] = gray

    @jax.jit
    def op(planar: jax.Array) -> jax.Array:
        return pl.pallas_call(
            kernel,
            grid=(pl.cdiv(hp, band),),
            in_specs=[pl.BlockSpec((3, band, wp), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((3, band, wp), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((3, hp, wp), jnp.float32),
            interpret=interpret_mode(),
        )(planar)

    return op


def _make_erosion(layout: PlanarLayout, taps):
    """Structure-aware like the uint8 path (window._tap_structure):
    rectangles factor into row-min then column-min, plus-shapes into the
    center column plus lane-shifted center row — same op-count savings."""
    hy = max(abs(dy) for dy, _ in taps)
    hx = max(abs(dx) for _, dx in taps)
    if hy > layout.pad_y or hx > layout.pad_x:
        # Same halo bound as window._make_morphology (roll wrap safety).
        raise ValueError(
            f"structuring element radius (ry={hy}, rx={hx}) exceeds the "
            f"layout halo (pad_y={layout.pad_y}, pad_x={layout.pad_x}); "
            f"build the layout with halo={max(hy, hx)}")
    band = _divisor_band(layout, 2)  # f32 bands are 4x the bytes of u8
    from .window import _tap_structure
    structure = _tap_structure(tuple(taps))
    dys = sorted({dy for dy, _ in taps})
    dxs = sorted({dx for _, dx in taps})

    def body_rect(x, out_ref, *_):
        h = None
        for dx in dxs:
            t = _shift(x, dx)
            h = t if h is None else jnp.minimum(h, t)
        acc = None
        for dy in dys:
            t = h[dy + hy:dy + hy + band]
            acc = t if acc is None else jnp.minimum(acc, t)
        out_ref[0] = acc

    def body_plus(x, out_ref, *_):
        mid = x[hy:hy + band]
        acc = None
        for dy in dys:
            t = x[dy + hy:dy + hy + band]
            acc = t if acc is None else jnp.minimum(acc, t)
        for dx in dxs:
            if dx == 0:
                continue
            acc = jnp.minimum(acc, _shift(mid, dx))
        out_ref[0] = acc

    def body_generic(x, out_ref, *_):
        by_dy: dict[int, list[int]] = {}
        for dy, dx in taps:
            by_dy.setdefault(dy, []).append(dx)
        acc = None
        for dy, dxs_ in sorted(by_dy.items()):
            v = x[dy + hy:dy + hy + band, :]
            for dx in sorted(dxs_):
                t = _shift(v, dx)
                acc = t if acc is None else jnp.minimum(acc, t)
        out_ref[0] = acc

    body = {"rect": body_rect, "plus": body_plus,
            "generic": body_generic}[structure]
    return _windowed_call(layout, hy, body, band=band, dtype=jnp.float32)


def _make_erosion_sep(layout: PlanarLayout):
    hy = 1
    band = _divisor_band(layout, 2)

    def body(x, out_ref, *_):
        aux = jnp.minimum(jnp.minimum(_shift(x, -1), x), _shift(x, 1))
        out_ref[0] = jnp.minimum(
            jnp.minimum(aux[0:band], aux[1:band + 1]), aux[2:band + 2])

    return _windowed_call(layout, hy, body, band=band, dtype=jnp.float32)


def _make_conv(layout: PlanarLayout, int_mask: np.ndarray, shift: int):
    kh, kw = int_mask.shape
    hy, hx = kh // 2, kw // 2
    band = _divisor_band(layout, 4 if kh * kw > 9 else 2)
    fmask = spec.mask_float(int_mask, shift)

    def body(x, out_ref, mask_ref):
        # column-sums first (row slices only), ONE lane roll per mask
        # column — same order as oracle_f32.convolution (its docstring).
        rows = [None] * kh
        acc = None
        for kx in range(kw):
            col = None
            for ky in range(kh):
                if rows[ky] is None:
                    rows[ky] = x[ky:ky + band, :]
                t = rows[ky] * mask_ref[ky * kw + kx]
                col = t if col is None else col + t
            col = _shift(col, kx - hx)
            acc = col if acc is None else acc + col
        out_ref[0] = acc

    return _windowed_call(layout, hy, body,
                          mask_args=(fmask.reshape(-1).astype(np.float32),),
                          band=band, dtype=jnp.float32)


def _make_conv_sep(layout: PlanarLayout, n: int, row_mask: np.ndarray,
                   shift: int):
    hy = n // 2
    band = _divisor_band(layout, 2)
    fmask = spec.mask_float(row_mask, shift).reshape(-1).astype(np.float32)

    def body(x, out_ref, mask_ref):
        aux = None
        for kx in range(n):
            t = _shift(x, kx - hy) * mask_ref[kx]
            aux = t if aux is None else aux + t
        acc = None
        for ky in range(n):
            t = aux[ky:ky + band, :] * mask_ref[ky]
            acc = t if acc is None else acc + t
        out_ref[0] = acc

    return _windowed_call(layout, hy, body, mask_args=(fmask,),
                          band=band, dtype=jnp.float32)


def _make_blur(layout: PlanarLayout):
    hy = 1
    band = _divisor_band(layout, 2)

    def body(x, out_ref, *_):
        q = jnp.float32(0.25)
        h = jnp.float32(0.5)
        aux = q * x[0:band] + h * x[1:band + 1] + q * x[2:band + 2]
        out_ref[0] = q * _shift(aux, -1) + h * aux + q * _shift(aux, 1)

    return _windowed_call(layout, hy, body, band=band, dtype=jnp.float32)


def _make_pipeline(layout: PlanarLayout, batch: int = 0):
    """Fused f32 pipeline on the shared fused-channels skeleton (ONE copy
    of the double-buffered band-DMA plumbing for every fused kernel —
    _windowed_call; make_fused_chain_f32 uses the identical combination).
    Band is halved for the 4-byte windows AND budget-capped like the
    uint8 flagship (utils/image.fused_effective_band): the 3-channel
    fused window escapes the single-op envelope model near the width
    boundary on this surface too. Gains the batch serving path for free."""
    from ...utils import image as image_mod
    band = image_mod.fused_effective_band(
        layout, itemsize=4, channels=3, start=_divisor_band(layout, 2))
    hy = 2

    def body(x, write, *_):
        wr, wg, wb = (jnp.float32(w) for w in spec.GRAYSCALE_WEIGHTS_RGB)
        gray = wr * x[0] + wg * x[1] + wb * x[2]
        t = jnp.where(gray > jnp.float32(0.5), jnp.float32(1.0),
                      jnp.float32(0.0))
        tm = jnp.minimum(jnp.minimum(_shift(t, -1), t), _shift(t, 1))
        n = band + 2
        e = jnp.minimum(jnp.minimum(tm[0:n], tm[1:n + 1]), tm[2:n + 2])
        q = jnp.float32(0.25)
        h = jnp.float32(0.5)
        aux = q * e[0:band] + h * e[1:band + 1] + q * e[2:band + 2]
        out = q * _shift(aux, -1) + h * aux + q * _shift(aux, 1)
        for ch in range(3):
            write(ch, slice(None), out)

    return _windowed_call(layout, hy, body, band=band, dtype=jnp.float32,
                          fused_channels=True, batch=batch)


def build_f32_ops(layout: PlanarLayout) -> dict:
    return {
        "Copy": _copy_dma(layout, dtype=jnp.float32),
        "Inversion": _elementwise(_inversion_kernel, layout,
                                  dtype=jnp.float32, band=POINT_BAND // 4),
        "Threshold": _elementwise(_threshold_kernel, layout,
                                  dtype=jnp.float32, band=POINT_BAND // 4),
        "Grayscale": _grayscale(layout),
        "Erosion-3x3-Cross": _make_erosion(
            layout, mask_to_taps(spec.CROSS_MASK_3X3)),
        "Erosion-3x3-Square": _make_erosion(
            layout, mask_to_taps(spec.SQUARE_MASK_3X3)),
        "Erosion-1x3+3x1-Square": _make_erosion_sep(layout),
        "Convolution-3x3": _make_conv(layout, spec.BLUR_3X3_INT,
                                      spec.BLUR_3X3_SHIFT),
        "Convolution-1x3+3x1": _make_conv_sep(layout, 3, spec.BLUR_1X3_INT,
                                              spec.BLUR_SEP3_SHIFT),
        "Convolution-5x5": _make_conv(layout, spec.BLUR_5X5_INT,
                                      spec.BLUR_5X5_SHIFT),
        "Convolution-1x5+5x1": _make_conv_sep(layout, 5, spec.BLUR_1X5_INT,
                                              spec.BLUR_SEP5_SHIFT),
        "Gaussian-Blur-3x3": _make_blur(layout),
        "Fused-Pipeline": _make_pipeline(layout),
    }
