"""Two-phase benchmark timer (the L3 measure_time contract, SURVEY.md §3).

Reference contract [opencv/benchmark.py:26-38, sycl/benchmark.cpp:25-39]:
run once (timed — includes compile/JIT cost, the "once" column), then run
`rounds` times and report the mean (the "repeatedly" column).

Unlike the CUDA.jl/OpenCV/MATLAB references, which time asynchronous dispatch
(SURVEY.md §2.4.4), thunks passed here MUST synchronize internally
(jax.block_until_ready) so we measure completed device work, matching the
SYCL reference's per-round `.wait()` semantics [sycl/benchmark.cpp:32].

A native C++ steady-clock timer is used when the optional `_dipnative`
extension is built; otherwise time.perf_counter_ns (both are monotonic
nanosecond clocks — the native one exists for parity with the reference's
C++ chrono::high_resolution_clock harness [sycl/benchmark.cpp:25-39]).
"""

from __future__ import annotations

import time
from typing import Any, Callable

try:
    from ..native import monotonic_ns as _clock_ns  # C++ steady_clock
except Exception:  # pragma: no cover - native extension not built
    _clock_ns = time.perf_counter_ns


def measure_time(func: Callable[[], Any], rounds: int) -> tuple[float, float]:
    """Return (seconds_once, seconds_per_round_mean)."""
    t0 = _clock_ns()
    func()
    t1 = _clock_ns()

    t2 = _clock_ns()
    for _ in range(rounds):
        func()
    t3 = _clock_ns()

    return (t1 - t0) * 1e-9, (t3 - t2) * 1e-9 / max(rounds, 1)
