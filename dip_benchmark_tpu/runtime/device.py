"""Device runtime: backend gate and device selection (the L1 layer).

Mirrors the reference backends' startup gates — no-OpenCL
[opencv/benchmark.py:118-120], CUDA.functional [cuda/benchmark.jl:276-279],
GPU-aspect + USM exit codes [sycl/benchmark.cpp:429-438] — as a fail-fast
check with a clear message and an explicit --backend cpu escape hatch
(SURVEY.md §5 failure-detection parity).
"""

from __future__ import annotations

import os
import threading

import jax

# Backend-initialization deadline for the gate (seconds). A healthy relay
# rig brings the TPU plugin up in ~90 s on first contact; a DEAD tunnel
# blocks jax.devices() inside the PJRT C API for tens of minutes before
# erroring (observed 28 min, round 4), which breaks the fail-fast
# contract. 8 min clears every healthy init observed on this rig with
# margin; override via env for slower rigs. Malformed values fall back
# to the default (the gate must never itself crash an entry point's
# import with a raw traceback).
try:
    GATE_TIMEOUT_S = float(os.environ.get("DIP_TPU_GATE_TIMEOUT_S", "480"))
except ValueError:  # e.g. "8m" — plain seconds expected
    import sys as _sys
    print("warning: ignoring malformed DIP_TPU_GATE_TIMEOUT_S "
          f"{os.environ['DIP_TPU_GATE_TIMEOUT_S']!r} (want seconds); "
          "using 480", file=_sys.stderr)
    GATE_TIMEOUT_S = 480.0


def _env_int(name: str, default: int) -> int:
    try:
        return int(os.environ.get(name, str(default)))
    except ValueError:
        import sys as _sys
        print(f"warning: ignoring malformed {name} "
              f"{os.environ[name]!r} (want an integer); using {default}",
              file=_sys.stderr)
        return default


# Bounded retries of a TIMED-OUT backend discovery before giving up
# (round-4 lesson: a transient tunnel hiccup nulled the round's bench —
# one retry window is often enough for a recovering relay, because the
# retry's jax.devices() call joins the first attempt's still-initializing
# PJRT call and returns as soon as it completes). Only the timeout flavor
# retries; a definitive "no such backend" answer is stable in-process.
GATE_RETRIES = _env_int("DIP_TPU_GATE_RETRIES", 1)


class DeviceGateError(RuntimeError):
    """No suitable accelerator available."""


class DeviceGateTimeout(DeviceGateError):
    """Backend initialization exceeded the gate deadline (possibly
    transient: relay tunnels hiccup on a minutes scale)."""


def backend_name() -> str:
    return jax.default_backend()


def default_device() -> jax.Device:
    return jax.devices()[0]


def _call_with_deadline(fn, timeout_s: float, what: str):
    """Run fn() in a daemon thread; raise DeviceGateError if it does not
    return within timeout_s. The blocked thread cannot be cancelled (it is
    inside a C extension), but the gate's callers exit the process on
    DeviceGateError, which reaps it — the point is a prompt, explained
    exit instead of an indefinite silent hang."""
    result: list = []
    error: list = []

    def run():
        try:
            result.append(fn())
        except BaseException as e:  # re-raised typed below
            error.append(e)

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        raise DeviceGateTimeout(
            f"{what} did not complete within {timeout_s:.0f}s — the "
            f"accelerator runtime appears hung (on relay rigs this means "
            f"the TPU tunnel is down). Pass --backend cpu to run on host, "
            f"or raise DIP_TPU_GATE_TIMEOUT_S.")
    if error:
        raise error[0]
    return result[0]


def require_device(backend: str = "tpu",
                   timeout_s: float | None = None,
                   retries: int | None = None) -> jax.Device:
    """Fail fast (like the reference gates) if the requested backend is
    absent OR its initialization hangs past the deadline. A TIMED-OUT
    discovery is retried up to `retries` times (default GATE_RETRIES /
    $DIP_TPU_GATE_RETRIES) — transient tunnel hiccups recover on a
    minutes scale, and the retry returns as soon as the first attempt's
    in-flight PJRT initialization completes.

    backend: "tpu" (default), "cpu", or "any".
    """
    if retries is None:
        retries = GATE_RETRIES
    last: DeviceGateTimeout | None = None
    for attempt in range(max(0, retries) + 1):
        if attempt:
            import sys as _sys
            print(f"device gate: {last} — retrying "
                  f"({attempt}/{retries})", file=_sys.stderr)
        try:
            return _require_device_once(backend, timeout_s)
        except DeviceGateTimeout as e:
            last = e
    raise last


def _require_device_once(backend: str,
                         timeout_s: float | None = None) -> jax.Device:
    if timeout_s is None:
        timeout_s = GATE_TIMEOUT_S
    if backend == "any":
        try:
            return _call_with_deadline(
                default_device, timeout_s, "backend initialization")
        except DeviceGateError:
            raise
        except RuntimeError as e:
            # Same wrap as the named-backend branch: callers (bench.py's
            # JSON error line, cli.py's exit-4 message) rely on every
            # prompt init failure arriving as a DeviceGateError.
            raise DeviceGateError(
                f"Backend initialization failed: {e}") from e
    try:
        devices = _call_with_deadline(
            lambda: jax.devices(backend), timeout_s,
            f"{backend.upper()} backend initialization")
    except DeviceGateError:
        raise
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
