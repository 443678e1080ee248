"""P-path op registry: hand-written Pallas kernels for the 12 device ops.

build_ops(layout) returns CSV-column-keyed callables over the planar padded
(C, Hp, Wp) uint8 device image; build_crops(layout) returns the matching
device-output -> uint8 HWC converters used by the untimed image dump.
"""

from __future__ import annotations

import numpy as np

from ... import spec
from ...utils.image import PlanarLayout, from_planar_padded
from . import f32, point, window
from .common import interpret_mode  # noqa: F401


def build_ops(layout: PlanarLayout) -> dict:
    ops = dict(point.build_point_ops(layout))
    ops.update({
        "Erosion-3x3-Cross": window.make_erosion(
            layout, window.mask_to_taps(spec.CROSS_MASK_3X3)),
        "Erosion-3x3-Square": window.make_erosion(
            layout, window.mask_to_taps(spec.SQUARE_MASK_3X3)),
        "Erosion-1x3+3x1-Square": window.make_erosion_separated_fused(layout),
        "Convolution-3x3": window.make_convolution(
            layout, 3, 3, spec.BLUR_3X3_SHIFT, spec.BLUR_3X3_INT),
        "Convolution-1x3+3x1": window.make_convolution_separated_fused(
            layout, 3, spec.BLUR_1X3_INT, spec.BLUR_SEP3_SHIFT),
        "Convolution-5x5": window.make_convolution(
            layout, 5, 5, spec.BLUR_5X5_SHIFT, spec.BLUR_5X5_INT),
        "Convolution-1x5+5x1": window.make_convolution_separated_fused(
            layout, 5, spec.BLUR_1X5_INT, spec.BLUR_SEP5_SHIFT),
        "Gaussian-Blur-3x3": window.make_gaussian_blur_3x3(layout),
    })
    from ...models import pipeline as pipeline_model  # lazy: avoids cycle
    ops["Fused-Pipeline"] = pipeline_model.make_fused_pipeline_pallas(layout)
    return ops


def _crop_padded(layout: PlanarLayout):
    def crop(dev) -> np.ndarray:
        return from_planar_padded(np.asarray(dev), layout)
    return crop


POINT_COLS = ("Copy", "Inversion", "Threshold", "Grayscale")


def build_crops(layout: PlanarLayout) -> dict:
    # Every op (point AND windowed) is shape-preserving over the padded
    # layout since round 2, so a single crop serves the whole matrix.
    padded = _crop_padded(layout)
    crops = {col: padded
             for col in spec.CSV_COLUMNS if col not in ("Upload", "Download")}
    crops["Fused-Pipeline"] = padded
    return crops


def build_f32_ops(layout: PlanarLayout) -> dict:
    return f32.build_f32_ops(layout)


def _f32_to_u8(arr: np.ndarray) -> np.ndarray:
    return np.clip(np.rint(arr * np.float32(255.0)), 0, 255).astype(np.uint8)


def build_f32_crops(layout: PlanarLayout) -> dict:
    padded = _crop_padded(layout)

    def crop(dev) -> np.ndarray:
        # Crop FIRST, then quantize: rows outside the valid region are
        # never written by the shape-preserving kernels (band-0 stale VMEM
        # below hy, junk slack above banded_height) and may hold non-finite
        # f32 garbage — converting them would raise invalid-cast warnings
        # and waste work on pixels the crop discards anyway.
        return _f32_to_u8(padded(np.asarray(dev)))
    crops = {col: crop
             for col in spec.CSV_COLUMNS if col not in ("Upload", "Download")}
    crops["Fused-Pipeline"] = crop
    return crops
