"""Float32 planar-CHW data-model variant (CUDA.jl parity knob) tests."""

import jax
import numpy as np
import pytest

from dip_benchmark_tpu import oracle_f32
from dip_benchmark_tpu.harness import BenchmarkRunner
from dip_benchmark_tpu.ops import xla_f32
from dip_benchmark_tpu.session import BenchmarkSession

COLS = sorted(oracle_f32.IMAGE_OPS_F32)


def test_roundtrip(small_image):
    f = oracle_f32.from_uint8_hwc(small_image)
    assert f.dtype == np.float32 and f.shape == (3, 37, 53)
    assert f.max() <= 1.0 and f.min() >= 0.0
    np.testing.assert_array_equal(oracle_f32.to_uint8_hwc(f), small_image)


@pytest.mark.parametrize("col", COLS)
def test_xla_f32_matches_oracle_f32(col, small_image):
    x = oracle_f32.from_uint8_hwc(small_image)
    got = np.asarray(jax.jit(xla_f32.IMAGE_OPS_F32[col])(x))
    want = oracle_f32.IMAGE_OPS_F32[col](x)
    # XLA may fuse multiply-adds / reassociate float sums: 2 ulp tolerance.
    np.testing.assert_allclose(got, want, rtol=0, atol=3e-7, err_msg=col)


def test_f32_threshold_semantics():
    x = np.array([[[0.49, 0.5, 0.51]]], np.float32).reshape(1, 1, 3)
    x = np.broadcast_to(x.reshape(1, 1, 3), (3, 1, 3)).astype(np.float32)
    out = oracle_f32.threshold(x)
    np.testing.assert_array_equal(out[0, 0], [0.0, 0.0, 1.0])


def test_f32_session_end_to_end(fundus_crop, tmp_path):
    session = BenchmarkSession(fundus_crop, path="xla", dtype="float32")
    runner = BenchmarkRunner(
        session.operations(include_pipeline=True), rounds=2)
    results = runner.run(filename="c.png", outdir=str(tmp_path),
                         verify_against=fundus_crop,
                         verify_ops=session.oracle_ops(),
                         verify_atol=session.verify_atol, quiet=True)
    assert len(results) == 15


PALLAS_F32_COLS = sorted(oracle_f32.IMAGE_OPS_F32)


@pytest.mark.parametrize("col", PALLAS_F32_COLS)
def test_pallas_f32_matches_oracle_f32(col, fundus_crop):
    from dip_benchmark_tpu.ops import pallas as pallas_ops
    from dip_benchmark_tpu.utils.image import (make_layout,
                                               to_planar_padded_f32)
    layout = make_layout(*fundus_crop.shape[:2])
    planar = jax.device_put(to_planar_padded_f32(fundus_crop, layout))
    out = np.asarray(pallas_ops.build_f32_ops(layout)[col](planar))
    want = oracle_f32.IMAGE_OPS_F32[col](
        oracle_f32.from_uint8_hwc(fundus_crop))
    h, w = fundus_crop.shape[:2]
    px, py = layout.pad_x, layout.pad_y
    got = out[:, py:py + h, px:px + w]  # every op is shape-preserving
    np.testing.assert_allclose(got, want, rtol=0, atol=3e-7, err_msg=col)


def test_f32_pallas_session_end_to_end(fundus_crop, tmp_path):
    session = BenchmarkSession(fundus_crop, path="pallas", dtype="float32")
    runner = BenchmarkRunner(
        session.operations(include_pipeline=True), rounds=1)
    results = runner.run(filename="c.png", outdir=str(tmp_path),
                         verify_against=fundus_crop,
                         verify_ops=session.oracle_ops(),
                         verify_atol=session.verify_atol, quiet=True)
    assert len(results) == 15


def test_f32_pipeline_threshold_boundary_mask():
    """rgb (126,139,18) has f32 luma EXACTLY 0.5: the pipeline's
    threshold on that computed value may flip under reassociation, so
    the verify oracle must exempt it (dilated by the erosion+blur
    radius) and leave every other pixel under the strict contract."""
    from dip_benchmark_tpu import oracle_f32
    ops = oracle_f32.uint8_verify_ops()
    img = np.full((16, 20, 3), 40, np.uint8)
    img[5, 7] = (126, 139, 18)
    out = ops["Fused-Pipeline"](img)
    assert isinstance(out, tuple)
    expected, mask = out
    assert expected.shape == mask.shape == img.shape
    assert mask[5, 7].all() and mask[7, 9].all()   # pixel + radius-2 spread
    assert not mask[5, 12].any()                   # outside the dilation
    # no boundary pixels -> plain array, strict contract everywhere
    assert not isinstance(ops["Fused-Pipeline"](
        np.full((8, 8, 3), 40, np.uint8)), tuple)
    # standalone Threshold keeps the plain form (raw-input compare, exact)
    assert not isinstance(ops["Threshold"](img), tuple)


def test_f32_chain_oracle_threshold_boundary_mask():
    from dip_benchmark_tpu.models.chain import chain_row_parts
    img = np.full((16, 20, 3), 40, np.uint8)
    img[5, 7] = (126, 139, 18)
    _, _, seq = chain_row_parts(
        ["Grayscale", "Threshold", "Erosion-3x3-Square"], dtype="float32")
    out = seq(img)
    assert isinstance(out, tuple) and out[1][5, 7].all()
    # Threshold FIRST thresholds raw input values (exact): no mask
    _, _, seq2 = chain_row_parts(["Threshold", "Copy"], dtype="float32")
    assert not isinstance(seq2(img), tuple)


def test_harness_verify_respects_dontcare_mask():
    from dip_benchmark_tpu.harness import BenchmarkRunner, Operation
    img = np.zeros((4, 4, 3), np.uint8)
    got = np.zeros((4, 4, 3), np.uint8)
    got[1, 1] = 200
    expected = np.zeros_like(got)
    mask = np.zeros(got.shape, bool)
    mask[1, 1] = True
    op = Operation("X", "x", "Copy", lambda: None, lambda: got)
    BenchmarkRunner([op], rounds=1).run(
        verify_against=img, quiet=True,
        verify_ops={"Copy": lambda im: (expected, mask)})  # masked: passes
    with pytest.raises(AssertionError, match="Copy"):
        BenchmarkRunner([op], rounds=1).run(
            verify_against=img, quiet=True,
            verify_ops={"Copy": lambda im: (expected,
                                            np.zeros_like(mask))})
