"""Shape-fuzz tests: random image sizes through both paths vs the oracle.

Catches layout/banding edge cases (odd widths near lane boundaries, heights
around the band size, minimum sizes) that fixed fixtures might miss.
"""

import jax
import numpy as np
import pytest

from dip_benchmark_tpu import oracle
from dip_benchmark_tpu.ops import pallas, xla
from dip_benchmark_tpu.utils.image import make_layout, to_planar_padded

# Deterministic sample of awkward shapes: tiny, lane-straddling, band-edge.
SHAPES = [(5, 5), (8, 128), (9, 127), (16, 129), (111, 33), (112, 124),
          (113, 252), (120, 380), (17, 511)]

CHECK_COLS = ["Inversion", "Grayscale", "Threshold", "Erosion-3x3-Cross",
              "Erosion-1x3+3x1-Square", "Convolution-3x3",
              "Convolution-1x5+5x1", "Gaussian-Blur-3x3", "Fused-Pipeline"]


@pytest.mark.parametrize("shape", SHAPES)
def test_xla_fuzz(shape):
    rng = np.random.default_rng(hash(shape) % (2 ** 31))
    img = rng.integers(0, 256, size=(*shape, 3), dtype=np.uint8)
    for col in CHECK_COLS:
        got = np.asarray(jax.jit(xla.IMAGE_OPS[col])(img))
        np.testing.assert_array_equal(got, oracle.IMAGE_OPS[col](img),
                                      err_msg=f"{col} @ {shape}")


@pytest.mark.parametrize("shape", SHAPES[:6])  # interpret mode is slow
def test_pallas_fuzz(shape):
    rng = np.random.default_rng(hash(shape) % (2 ** 31))
    img = rng.integers(0, 256, size=(*shape, 3), dtype=np.uint8)
    layout = make_layout(*shape)
    planar = jax.device_put(to_planar_padded(img, layout))
    ops = pallas.build_ops(layout)
    crops = pallas.build_crops(layout)
    for col in ["Inversion", "Erosion-3x3-Square", "Convolution-3x3",
                "Gaussian-Blur-3x3"]:
        got = crops[col](ops[col](planar))
        np.testing.assert_array_equal(got, oracle.IMAGE_OPS[col](img),
                                      err_msg=f"{col} @ {shape}")
