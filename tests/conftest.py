"""Test configuration: force the CPU backend with 8 virtual devices.

This is the 'fake backend' the reference lacks (SURVEY.md §4): the whole
suite — including Pallas kernels (interpret mode) and the multi-chip
shard_map path — runs without TPU hardware.
"""

import os

_platform = os.environ.get("DIP_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

# The axon environment's sitecustomize imports jax and registers the TPU
# plugin before this conftest runs, so the env var alone is not enough —
# force the platform through jax.config too. Set DIP_TEST_PLATFORM to
# override for an on-device run of the suite.
import jax  # noqa: E402

jax.config.update("jax_platforms", _platform)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(scope="session")
def small_image(rng) -> np.ndarray:
    """Random uint8 RGB image, dims deliberately not lane-aligned."""
    return rng.integers(0, 256, size=(37, 53, 3), dtype=np.uint8)


@pytest.fixture(scope="session")
def gradient_image() -> np.ndarray:
    """Deterministic edge-pattern image that pins border behavior: distinct
    values along both edges so any mirror-index mistake changes the output."""
    h, w = 24, 40
    y = np.arange(h, dtype=np.int32)[:, None]
    x = np.arange(w, dtype=np.int32)[None, :]
    base = (7 * y + 13 * x) % 256
    img = np.stack([base, (base * 3 + 1) % 256, (255 - base) % 256], axis=-1)
    return img.astype(np.uint8)


@pytest.fixture(scope="session")
def fundus_crop() -> np.ndarray:
    """A crop of the real benchmark image if available, else synthetic."""
    from dip_benchmark_tpu.utils.testimage import ref_path
    path = ref_path("assets/fundus.jpg")
    if os.path.exists(path):
        from dip_benchmark_tpu.utils.image import load_image
        return load_image(path)[1000:1128, 1500:1756]  # (128, 256, 3)
    # Self-contained fallback: the deterministic synthetic fundus
    # (utils/testimage.py) — realistic structure, no mount needed.
    from dip_benchmark_tpu.utils.testimage import synth_fundus
    return synth_fundus(256, 512)[64:192, 128:384]  # (128, 256, 3)
