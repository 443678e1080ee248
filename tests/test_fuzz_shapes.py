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


# ---------------------------------------------------------------------------
# Size envelope (round-4 VERDICT #7): make_layout enforces the VMEM/HBM
# bounds of docs/DESIGN.md §1.
# ---------------------------------------------------------------------------

def test_envelope_default_band_at_measured_top():
    """Round-4 envelope probe anchors (benchmarks/tuning/envelope_probe.py,
    DESIGN §1): fresh conv-5x5 compiles pass at band 112 x width 5120 and
    band 88 x width 7168 but fail at band 112 x width 6144, so the fitted
    band must keep 112 through 5120 and sit at <= 88 by 7168."""
    from dip_benchmark_tpu.utils import image as im
    assert make_layout(2336, 3504).band == 112   # benchmark image: unchanged
    assert make_layout(1024, 5120).band == 112   # measured pass at 112
    fitted = make_layout(1024, 7168).band
    assert 8 <= fitted <= 88                     # measured pass at 88
    assert make_layout(1024, 6144).band < 112    # measured fail at 112
    layout = make_layout(7168, 7168)
    assert im.windowed_vmem_bytes(layout, 1) <= im.VMEM_BUDGET


def test_envelope_band_caps_to_vmem():
    """Beyond the default-band envelope the band shrinks (more grid steps,
    same kernels) instead of letting Mosaic exhaust VMEM."""
    from dip_benchmark_tpu.utils import image as im
    wide = make_layout(256, 20_000)
    assert wide.band < 112 and wide.band % 8 == 0
    assert im.windowed_vmem_bytes(wide, 1) <= im.VMEM_BUDGET
    # f32 model: 4-byte windows tighten the same cap
    f32 = make_layout(256, 7168, itemsize=4)
    assert im.windowed_vmem_bytes(f32, 4) <= im.VMEM_BUDGET


def test_envelope_width_beyond_any_band_rejected():
    with pytest.raises(ValueError, match="envelope"):
        make_layout(256, 200_000)


def test_envelope_hbm_buffer_cap_rejected():
    with pytest.raises(ValueError, match="HBM|GiB"):
        make_layout(60_000, 30_000)


def test_envelope_shrunk_band_kernels_still_exact(gradient_image):
    """A layout whose band was capped below the requested value still runs
    the windowed kernels bit-exactly (interpret mode)."""
    from dip_benchmark_tpu import oracle
    from dip_benchmark_tpu.ops import pallas as pallas_ops
    from dip_benchmark_tpu.utils.image import from_planar_padded
    h, w, _ = gradient_image.shape
    layout = make_layout(h, w, band=8)  # forced tiny band
    assert layout.band == 8
    ops = pallas_ops.build_ops(layout)
    planar = jax.device_put(to_planar_padded(gradient_image, layout))
    got = from_planar_padded(np.asarray(ops["Erosion-3x3-Square"](planar)),
                             layout)
    np.testing.assert_array_equal(
        got, oracle.IMAGE_OPS["Erosion-3x3-Square"](gradient_image))
