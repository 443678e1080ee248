"""Native C++ oracle must match the NumPy oracle bit-exactly."""

import numpy as np
import pytest

from dip_benchmark_tpu import native, oracle

pytestmark = pytest.mark.skipif(
    not native.available(),
    reason=f"native toolchain unavailable: {native.build_error()}")


@pytest.mark.parametrize("col", sorted(oracle.IMAGE_OPS))
def test_native_matches_oracle(col, small_image):
    np.testing.assert_array_equal(
        native.image_ops()[col](small_image),
        oracle.IMAGE_OPS[col](small_image), err_msg=col)


@pytest.mark.parametrize("col", sorted(oracle.IMAGE_OPS))
def test_native_matches_oracle_edges(col, gradient_image):
    np.testing.assert_array_equal(
        native.image_ops()[col](gradient_image),
        oracle.IMAGE_OPS[col](gradient_image), err_msg=col)


def test_native_timer_monotonic():
    a = native.monotonic_ns()
    b = native.monotonic_ns()
    assert b >= a > 0
