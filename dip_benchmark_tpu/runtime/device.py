"""Device runtime: backend gate and device selection (the L1 layer).

Mirrors the reference backends' startup gates — no-OpenCL
[opencv/benchmark.py:118-120], CUDA.functional [cuda/benchmark.jl:276-279],
GPU-aspect + USM exit codes [sycl/benchmark.cpp:429-438] — as a fail-fast
check with a clear message and an explicit --backend cpu escape hatch
(SURVEY.md §5 failure-detection parity).
"""

from __future__ import annotations

import jax


class DeviceGateError(RuntimeError):
    """No suitable accelerator available."""


def backend_name() -> str:
    return jax.default_backend()


def default_device() -> jax.Device:
    return jax.devices()[0]


def require_device(backend: str = "tpu") -> jax.Device:
    """Fail fast (like the reference gates) if the requested backend is absent.

    backend: "tpu" (default), "cpu", or "any".
    """
    if backend == "any":
        return default_device()
    try:
        devices = jax.devices(backend)
    except RuntimeError as e:
        raise DeviceGateError(
            f"No {backend.upper()} backend available "
            f"(jax.default_backend()={jax.default_backend()!r}). "
            f"Pass --backend cpu to run on host.") from e
    if not devices:
        raise DeviceGateError(f"No {backend.upper()} devices found.")
    return devices[0]


def gate_backend(backend: str) -> jax.Device:
    """The shared CLI entry gate: force the host platform when asked (the
    JAX_PLATFORMS env var alone is ignored under environments whose
    sitecustomize pre-registers an accelerator plugin, e.g. axon), then
    fail fast via require_device. Raises DeviceGateError — callers print
    it and exit 4 (the SYCL reference's no-GPU exit code)."""
    if backend == "cpu":
        jax.config.update("jax_platforms", "cpu")
    return require_device(backend)


def describe_device(device: jax.Device) -> str:
    """Device banner, mirroring e.g. sycl/benchmark.cpp:441-442."""
    kind = getattr(device, "device_kind", "unknown")
    return f"Platform: {device.platform} | Device: {kind} (id={device.id})"
