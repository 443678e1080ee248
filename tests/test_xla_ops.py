"""X-path (jitted jax.numpy / lax) ops must match the NumPy oracle bit-exactly."""

import jax
import numpy as np
import pytest

from dip_benchmark_tpu import oracle
from dip_benchmark_tpu.ops import xla


@pytest.mark.parametrize("col", sorted(xla.IMAGE_OPS))
def test_xla_matches_oracle_random(col, small_image):
    got = np.asarray(jax.jit(xla.IMAGE_OPS[col])(small_image))
    want = oracle.IMAGE_OPS[col](small_image)
    np.testing.assert_array_equal(got, want, err_msg=col)


@pytest.mark.parametrize("col", sorted(xla.IMAGE_OPS))
def test_xla_matches_oracle_edges(col, gradient_image):
    got = np.asarray(jax.jit(xla.IMAGE_OPS[col])(gradient_image))
    want = oracle.IMAGE_OPS[col](gradient_image)
    np.testing.assert_array_equal(got, want, err_msg=col)


@pytest.mark.parametrize("col", sorted(xla.IMAGE_OPS))
def test_xla_matches_oracle_real_image(col, fundus_crop):
    got = np.asarray(jax.jit(xla.IMAGE_OPS[col])(fundus_crop))
    want = oracle.IMAGE_OPS[col](fundus_crop)
    np.testing.assert_array_equal(got, want, err_msg=col)


def test_copy_is_fresh_buffer(small_image):
    x = jax.device_put(small_image)
    y = jax.jit(xla.copy)(x)
    np.testing.assert_array_equal(np.asarray(y), small_image)
    assert y is not x


def test_fused_pipeline_matches_oracle(fundus_crop):
    got = np.asarray(jax.jit(xla.fused_pipeline)(fundus_crop))
    want = oracle.fused_pipeline(fundus_crop)
    np.testing.assert_array_equal(got, want)


def test_dilation_matches_oracle(small_image):
    from dip_benchmark_tpu import spec
    got = np.asarray(jax.jit(xla.dilation_square)(small_image))
    want = oracle.dilation(small_image, spec.SQUARE_MASK_3X3)
    np.testing.assert_array_equal(got, want)
    got = np.asarray(jax.jit(xla.dilation_separated)(small_image))
    np.testing.assert_array_equal(got, oracle.dilation_separated(small_image))


def test_dilation_duality_with_erosion(small_image):
    """dilate(x) == 255 - erode(255 - x) (morphological duality)."""
    from dip_benchmark_tpu import spec
    d = oracle.dilation(small_image, spec.SQUARE_MASK_3X3)
    e = oracle.erosion(255 - small_image, spec.SQUARE_MASK_3X3)
    np.testing.assert_array_equal(d, 255 - e)
