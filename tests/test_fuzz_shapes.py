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


def test_conv5_effective_band_budget_cap():
    """Round-5 advisor (medium): the packed conv-5x5 upsizes its band by
    banded_height divisibility, i.e. by image HEIGHT — so the pick must
    be budget-capped or near-boundary widths admitted by fit_band (which
    models layout.band) would hand Mosaic an over-budget 336-band body."""
    from dip_benchmark_tpu.utils import image as im
    # hardware-validated picks unchanged: benchmark image (banded 2352 =
    # 7*336) keeps 336; the 1024-row calibration anchor keeps 224
    assert im.conv5_effective_band(make_layout(2336, 3504)) == 336
    assert im.conv5_effective_band(make_layout(1024, 3504)) == 224
    # near-boundary width at a 336-divisible banded height: capped (the
    # uncapped 336 pick models ~20 MiB against the 14.9 MiB budget)
    lo = make_layout(2330, 5120)           # banded 2352, Wp 5248
    eff = im.conv5_effective_band(lo)
    assert eff != 336
    probe = im.PlanarLayout(lo.height, lo.width, lo.channels,
                            pad_y=lo.pad_y, pad_x=lo.pad_x, band=eff // 2)
    assert im.windowed_vmem_bytes(probe, 1) <= im.VMEM_BUDGET
    # every accepted pick divides banded_height (the grid invariant)
    assert lo.banded_height % eff == 0


def test_conv5_band_override_capped_kernel_exact(monkeypatch):
    """The kernel honors the budget-capped pick and stays bit-exact: with
    the budget squeezed so 336 is rejected at this width, conv-5x5 runs
    at the capped band and still matches the oracle."""
    import jax

    from dip_benchmark_tpu.ops import pallas
    from dip_benchmark_tpu.utils import image as im
    from dip_benchmark_tpu.utils.image import to_planar_padded
    img = np.random.default_rng(97).integers(
        0, 256, size=(330, 300, 3), dtype=np.uint8)
    layout = make_layout(330, 300)         # banded 336 (divisible by 336)
    assert im.conv5_effective_band(layout) == 336  # normal budget: upsize
    monkeypatch.setattr(im, "VMEM_BUDGET", 2**20)  # squeeze: 336 over, 168 ok
    assert im.conv5_effective_band(layout) == 168
    ops = pallas.build_ops(layout)
    crops = pallas.build_crops(layout)
    got = crops["Convolution-5x5"](
        ops["Convolution-5x5"](jax.device_put(
            to_planar_padded(img, layout))))
    np.testing.assert_array_equal(
        got, oracle.IMAGE_OPS["Convolution-5x5"](img))


def test_conv5_band_336_kernel_exact():
    """The 336 upsize itself (the benchmark image's pick) is exercised in
    interpret mode: a 336-divisible banded height runs the packed 5x5 at
    band 336 and matches the oracle bit-exactly."""
    import jax

    from dip_benchmark_tpu.ops import pallas
    from dip_benchmark_tpu.utils.image import to_planar_padded
    img = np.random.default_rng(101).integers(
        0, 256, size=(330, 140, 3), dtype=np.uint8)
    layout = make_layout(330, 140)
    from dip_benchmark_tpu.utils import image as im
    assert im.conv5_effective_band(layout) == 336
    ops = pallas.build_ops(layout)
    crops = pallas.build_crops(layout)
    got = crops["Convolution-5x5"](
        ops["Convolution-5x5"](jax.device_put(
            to_planar_padded(img, layout))))
    np.testing.assert_array_equal(
        got, oracle.IMAGE_OPS["Convolution-5x5"](img))


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
