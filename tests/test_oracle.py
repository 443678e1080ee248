"""Oracle self-consistency tests: pin the spec semantics with hand-computed
values so the oracle itself is trustworthy before other paths test against it.
"""

import numpy as np
import pytest

from dip_benchmark_tpu import oracle, spec


def test_mirror_index_low_and_high():
    # low edge: -i (reflect-101); high edge: 2n-i-1 (symmetric)
    n = 10
    assert spec.mirror_index(-1, n) == 1
    assert spec.mirror_index(-2, n) == 2
    assert spec.mirror_index(0, n) == 0
    assert spec.mirror_index(9, n) == 9
    assert spec.mirror_index(10, n) == 9
    assert spec.mirror_index(11, n) == 8


def test_inversion_exact():
    img = np.array([[[0, 1, 255]]], dtype=np.uint8)
    assert (oracle.inversion(img) == [[[255, 254, 0]]]).all()


def test_threshold_exact():
    img = np.array([[[126, 127, 128]]], dtype=np.uint8)
    assert (oracle.threshold(img) == [[[0, 0, 255]]]).all()


def test_grayscale_rec709_fixed_point():
    img = np.array([[[100, 200, 50]]], dtype=np.uint8)
    # spec: y = (13933*R + 46871*G + 4732*B) >> 16 (exact fixed point)
    expected = (13933 * 100 + 46871 * 200 + 4732 * 50) >> 16
    out = oracle.grayscale(img)
    assert out.shape == (1, 1, 3)
    assert (out == expected).all()


def test_grayscale_fixed_point_tracks_reference_float():
    """The integer spec deviates from the reference's f32 luma by at most
    one level, and flat colors map to themselves (weights sum to 2^16)."""
    rgb = np.stack(np.meshgrid(*[np.arange(0, 256, 5)] * 3, indexing="ij"),
                   axis=-1).reshape(1, -1, 3).astype(np.uint8)
    ours = oracle.grayscale(rgb)[..., 0].astype(np.int32)
    r, g, b = (rgb[..., i].astype(np.float32) for i in range(3))
    ref = ((np.float32(0.0722) * b + np.float32(0.7152) * g)
           + np.float32(0.2126) * r).astype(np.uint8).astype(np.int32)
    assert np.abs(ours - ref).max() <= 1
    flat = np.repeat(np.arange(256, dtype=np.uint8), 3).reshape(1, 256, 3)
    assert (oracle.grayscale(flat) == flat).all()


def test_grayscale_replicates_channels(small_image):
    out = oracle.grayscale(small_image)
    assert (out[..., 0] == out[..., 1]).all()
    assert (out[..., 0] == out[..., 2]).all()


def test_erosion_square_center():
    img = np.arange(9, dtype=np.uint8).reshape(3, 3)
    img = np.repeat(img[..., None], 3, axis=2)
    out = oracle.erosion(img, spec.SQUARE_MASK_3X3)
    assert out[1, 1, 0] == 0  # min of all 9


def test_erosion_cross_vs_square_differ(small_image):
    cross = oracle.erosion(small_image, spec.CROSS_MASK_3X3)
    square = oracle.erosion(small_image, spec.SQUARE_MASK_3X3)
    assert (square <= cross).all()  # square window is a superset
    assert (square != cross).any()


def test_erosion_separated_equals_square_in_interior(small_image):
    """Separable 1x3+3x1 == 3x3 square erosion away from borders (min is
    separable); borders may differ due to aux re-mirroring."""
    sep = oracle.erosion_separated(small_image)
    square = oracle.erosion(small_image, spec.SQUARE_MASK_3X3)
    assert (sep[2:-2, 2:-2] == square[2:-2, 2:-2]).all()


def test_convolution_uniform_image_fixed_point():
    img = np.full((8, 8, 3), 77, dtype=np.uint8)
    for fn in (oracle.convolution_3x3, oracle.convolution_5x5,
               oracle.convolution_3x3_separated,
               oracle.convolution_5x5_separated, oracle.gaussian_blur_3x3):
        assert (fn(img) == 77).all(), fn.__name__


def test_convolution_3x3_hand_value():
    # Single bright pixel: center value = 255*4/16 rounded half-up = 64 (63.75 -> 64)
    img = np.zeros((5, 5, 3), dtype=np.uint8)
    img[2, 2] = 255
    out = oracle.convolution_3x3(img)
    assert out[2, 2, 0] == 64        # (255*4 + 8) >> 4 = 63.75+r -> 64
    assert out[2, 1, 0] == 32        # 255*2/16 = 31.875 -> 32
    assert out[1, 1, 0] == 16        # 255*1/16 = 15.9375 -> 16
    assert out[0, 0, 0] == 0


def test_convolution_matches_float_reference(small_image):
    """Integer formulation == float32 accumulate + int(sum+0.5) + clamp."""
    img = small_image
    kh, kw = 3, 3
    padded = oracle.mirror_pad(img, 1, 1).astype(np.float32)
    fmask = spec.mask_float(spec.BLUR_3X3_INT, spec.BLUR_3X3_SHIFT)
    h, w = img.shape[:2]
    acc = np.zeros(img.shape, dtype=np.float32)
    for ky in range(kh):
        for kx in range(kw):
            acc += fmask[ky, kx] * padded[ky:ky + h, kx:kx + w]
    ref = np.clip((acc + 0.5).astype(np.int32), 0, 255).astype(np.uint8)
    assert (oracle.convolution_3x3(img) == ref).all()


def test_border_mirror_pinned(gradient_image):
    """Erosion at the corner must use mirror taps, not zero/clamp."""
    img = gradient_image
    out = oracle.erosion(img, spec.SQUARE_MASK_3X3)
    # corner (0,0): taps (-1,-1)->(1,1), (-1,0)->(1,0), (0,-1)->(0,1), etc.
    taps = [img[1, 1], img[1, 0], img[0, 1], img[0, 0],
            img[1, 1], img[0, 1], img[1, 1], img[1, 0], img[1, 1]]
    expected = np.min(np.stack(taps), axis=0)
    assert (out[0, 0] == expected).all()


@pytest.mark.parametrize("col", sorted(oracle.IMAGE_OPS))
def test_ops_preserve_shape_dtype(col, small_image):
    out = oracle.IMAGE_OPS[col](small_image)
    assert out.shape == small_image.shape
    assert out.dtype == np.uint8
