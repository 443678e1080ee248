"""P-path (Pallas kernels) must match the NumPy oracle bit-exactly.

Runs in Pallas interpret mode on CPU (conftest forces the CPU backend) —
the sanitizer/fake-backend analogue (SURVEY.md §4/§5). The same kernels are
verified on real TPU hardware by the harness --verify flag and bench.py.
"""

import jax
import numpy as np
import pytest

from dip_benchmark_tpu import oracle
from dip_benchmark_tpu.ops import pallas
from dip_benchmark_tpu.utils.image import (from_planar_padded, make_layout,
                                           to_planar_padded)

COLS = sorted(c for c in oracle.IMAGE_OPS)


def run_pallas(col: str, image: np.ndarray) -> np.ndarray:
    layout = make_layout(*image.shape[:2])
    planar = jax.device_put(to_planar_padded(image, layout))
    out = pallas.build_ops(layout)[col](planar)
    return pallas.build_crops(layout)[col](out)


def test_planar_roundtrip(small_image):
    layout = make_layout(*small_image.shape[:2])
    planar = to_planar_padded(small_image, layout)
    assert planar.shape == layout.shape
    np.testing.assert_array_equal(
        from_planar_padded(planar, layout), small_image)


def test_planar_padding_is_mirror(gradient_image):
    layout = make_layout(*gradient_image.shape[:2])
    planar = to_planar_padded(gradient_image, layout)
    ch0 = planar[0]
    py, px = layout.pad_y, layout.pad_x
    img0 = gradient_image[..., 0]
    # col halo: index -1 -> 1, -2 -> 2; w -> w-1, w+1 -> w-2
    np.testing.assert_array_equal(ch0[py:py + layout.height, px - 1],
                                  img0[:, 1])
    np.testing.assert_array_equal(ch0[py:py + layout.height, px - 2],
                                  img0[:, 2])
    np.testing.assert_array_equal(
        ch0[py:py + layout.height, px + layout.width], img0[:, -1])
    np.testing.assert_array_equal(
        ch0[py:py + layout.height, px + layout.width + 1], img0[:, -2])
    # row halo
    np.testing.assert_array_equal(ch0[py - 1, px:px + layout.width],
                                  img0[1, :])
    np.testing.assert_array_equal(ch0[py + layout.height, px:px + layout.width],
                                  img0[-1, :])


@pytest.mark.parametrize("col", COLS)
def test_pallas_matches_oracle_random(col, small_image):
    np.testing.assert_array_equal(run_pallas(col, small_image),
                                  oracle.IMAGE_OPS[col](small_image),
                                  err_msg=col)


@pytest.mark.parametrize("col", COLS)
def test_pallas_matches_oracle_edges(col, gradient_image):
    np.testing.assert_array_equal(run_pallas(col, gradient_image),
                                  oracle.IMAGE_OPS[col](gradient_image),
                                  err_msg=col)


@pytest.mark.parametrize("col", COLS)
def test_pallas_matches_oracle_real_image(col, fundus_crop):
    np.testing.assert_array_equal(run_pallas(col, fundus_crop),
                                  oracle.IMAGE_OPS[col](fundus_crop),
                                  err_msg=col)


def test_pallas_dilation_matches_oracle_and_duality(small_image):
    """P-path dilation (the reference's unused helper surface): matches the
    NumPy oracle and satisfies dilate(x) == 255 - erode(255 - x)."""
    from dip_benchmark_tpu import spec
    from dip_benchmark_tpu.ops.pallas import window

    h, w = small_image.shape[:2]
    layout = make_layout(h, w)
    taps = window.mask_to_taps(spec.SQUARE_MASK_3X3)
    dil = window.make_dilation(layout, taps)
    ero = window.make_erosion(layout, taps)

    def crop(arr):
        py = layout.pad_y  # shape-preserving output: valid rows at pad_y
        a = np.asarray(arr)[:, py:py + h, layout.pad_x:layout.pad_x + w]
        return np.ascontiguousarray(np.transpose(a, (1, 2, 0)))

    planar = jax.device_put(to_planar_padded(small_image, layout))
    got = crop(dil(planar))
    np.testing.assert_array_equal(
        got, oracle.dilation(small_image, spec.SQUARE_MASK_3X3))
    inv_planar = jax.device_put(
        to_planar_padded(255 - small_image, layout))
    np.testing.assert_array_equal(got, 255 - crop(ero(inv_planar)))
    # plus-shape structuring element takes the specialized path too
    cross_taps = window.mask_to_taps(spec.CROSS_MASK_3X3)
    got_x = crop(window.make_dilation(layout, cross_taps)(planar))
    np.testing.assert_array_equal(
        got_x, oracle.dilation(small_image, spec.CROSS_MASK_3X3))


def _extreme_images():
    """Adversarial values for the packed-16 convolution arithmetic:
    all-255 drives every accumulator field to its exact 65280 = 255*256
    bound (one below a cross-field carry), checkerboard and stripe patterns
    exercise field extraction at both parities and roll boundaries."""
    h, w = 24, 40
    yield np.full((h, w, 3), 255, np.uint8)
    yield np.zeros((h, w, 3), np.uint8)
    cb = np.indices((h, w)).sum(0) % 2
    yield np.repeat((cb[..., None] * 255).astype(np.uint8), 3, axis=2)
    stripes = (np.arange(w) % 2)[None, :, None] * 255
    yield np.broadcast_to(stripes, (h, w, 3)).astype(np.uint8)
    rows = (np.arange(h) % 2)[:, None, None] * 255
    yield np.broadcast_to(rows, (h, w, 3)).astype(np.uint8)


@pytest.mark.parametrize("col", COLS)
def test_pallas_matches_oracle_extreme_values(col):
    for i, image in enumerate(_extreme_images()):
        np.testing.assert_array_equal(
            run_pallas(col, image), oracle.IMAGE_OPS[col](image),
            err_msg=f"{col} extreme image #{i}")


def test_pallas_convolution_non_rank1_fallback(small_image):
    """The standard Gaussian masks all factor rank-1 (fast path); a
    non-factorable runtime mask must still be served, by the packed dense
    body — and a negative-weight mask by the plain i32 body."""
    from dip_benchmark_tpu.ops.pallas import window
    from dip_benchmark_tpu.utils.image import make_layout, to_planar_padded

    h, w = small_image.shape[:2]
    layout = make_layout(h, w)
    planar = jax.device_put(to_planar_padded(small_image, layout))
    py, px = layout.pad_y, layout.pad_x

    def crop(arr):
        a = np.asarray(arr)[:, py:py + h, px:px + w]
        return np.ascontiguousarray(np.transpose(a, (1, 2, 0)))

    rank2 = np.array([[1, 2, 1], [2, 4, 2], [1, 2, 2]], np.int32)  # not uv
    assert window.factor_rank1_int(rank2) is None
    got = crop(window.make_convolution(layout, 3, 3, 4, rank2)(planar))
    np.testing.assert_array_equal(got, oracle.convolution(small_image,
                                                          rank2, 4))

    neg = np.array([[0, -1, 0], [-1, 8, -1], [0, -1, 0]], np.int32)
    assert not window._packable(neg)
    got = crop(window.make_convolution(layout, 3, 3, 2, neg)(planar))
    np.testing.assert_array_equal(got, oracle.convolution(small_image,
                                                          neg, 2))


def test_pallas_convolution_swar_round_carry_guard(small_image):
    """SWAR in-place rounding is only legal when field + half < 2^16
    (DESIGN.md §2c). A packable mask with 255*sum + half >= 2^16 must take
    the per-field fallback and still match the oracle exactly — this pins
    the static carry guard in make_convolution."""
    from dip_benchmark_tpu.ops.pallas import window
    from dip_benchmark_tpu.utils.image import make_layout, to_planar_padded

    h, w = small_image.shape[:2]
    layout = make_layout(h, w)
    planar = jax.device_put(to_planar_padded(small_image, layout))
    py, px = layout.pad_y, layout.pad_x

    # sum = 256 (packable: 255*256 = 65280 < 2^16), shift = 16 -> half =
    # 32768; 65280 + 32768 >= 2^16 would carry across the field boundary.
    rank1 = np.outer([1, 14, 1], [1, 14, 1]).astype(np.int32)   # sum 256
    dense = np.array([[4, 8, 4], [8, 208, 8], [4, 8, 4]], np.int32)
    for m in (rank1, dense):  # exercises body_rank1 and body_packed
        assert m.sum() == 256 and window._packable(m)
        assert 255 * int(m.sum()) + (1 << 15) >= (1 << 16)
        got = np.asarray(window.make_convolution(layout, 3, 3, 16, m)(planar))
        got = np.transpose(got[:, py:py + h, px:px + w], (1, 2, 0))
        np.testing.assert_array_equal(got, oracle.convolution(small_image,
                                                              m, 16))


def test_factor_rank1_int():
    from dip_benchmark_tpu import spec
    from dip_benchmark_tpu.ops.pallas.window import factor_rank1_int
    u, v = factor_rank1_int(spec.BLUR_3X3_INT)
    assert (np.outer(u, v) == spec.BLUR_3X3_INT).all()
    u, v = factor_rank1_int(spec.BLUR_5X5_INT)
    assert (np.outer(u, v) == spec.BLUR_5X5_INT).all()
    assert factor_rank1_int(np.array([[1, 2], [3, 5]])) is None
    assert factor_rank1_int(np.zeros((3, 3), np.int32)) is None
    # rank-1 with a zero row and a zero column still factors
    m = np.outer([0, 1, 2], [3, 0, 1])
    u, v = factor_rank1_int(m)
    assert (np.outer(u, v) == m).all()


def test_morphology_rejects_element_wider_than_halo():
    """A structuring element wider than the baked halo would silently
    corrupt valid edge columns via lane-roll wrap — both paths refuse."""
    from dip_benchmark_tpu.ops.pallas import f32 as f32_ops
    from dip_benchmark_tpu.ops.pallas.window import make_erosion, mask_to_taps
    from dip_benchmark_tpu.utils.image import make_layout
    lo = make_layout(32, 64)
    wide_row = mask_to_taps(np.ones((1, 7), bool))
    with pytest.raises(ValueError, match="exceeds the layout halo"):
        make_erosion(lo, wide_row)
    with pytest.raises(ValueError, match="exceeds the layout halo"):
        f32_ops._make_erosion(make_layout(32, 64, itemsize=4), wide_row)
