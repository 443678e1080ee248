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


def test_native_corrupt_so_degrades_not_raises(tmp_path, monkeypatch):
    """A corrupt .so with a fresh mtime (interrupted g++ / concurrent
    builder) must make available() return False after a failed rebuild —
    never raise out of the oracle fallback."""
    bad = tmp_path / "_dipnative.so"
    bad.write_bytes(b"not an ELF")
    monkeypatch.setattr(native, "_LIB_PATH", str(bad))
    monkeypatch.setattr(native, "_SRC", __file__)  # older mtime than bad
    monkeypatch.setattr(native, "_build",
                        lambda: "rebuild disabled for test")
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_build_error", None)
    assert native.available() is False
    assert "rebuild disabled" in native.build_error()


def test_native_timer_monotonic():
    a = native.monotonic_ns()
    b = native.monotonic_ns()
    assert b >= a > 0


def test_native_rejects_non_rgb():
    """The C kernels hard-code 3 channels (grayscale reads px[1]/px[2]);
    the binding must refuse RGBA/gray arrays with a ValueError, not pass
    them through to a heap over-read."""
    if not native.available():
        pytest.skip("native library unavailable")
    with pytest.raises(ValueError, match="RGB"):
        native.grayscale(np.zeros((8, 8, 4), np.uint8))
    with pytest.raises(ValueError, match="RGB"):
        native.copy(np.zeros((8, 8), np.uint8).reshape(8, 4, 2))
