#!/usr/bin/env python3
"""Does jax.block_until_ready await on-device EXECUTION on this rig?

Method: one jitted program runs K data-dependent full-image passes
(fori_loop, iteration i adds i — not hoistable, not fusible across
iterations since each reads/writes the whole 24.5 MB buffer). If
block_until_ready awaits execution, per-dispatch wall time must grow
linearly with K at roughly bytes_moved / HBM_bandwidth per pass
(~49 MB / 819 GB/s = 60 us/pass on v5e). If wall time is flat in K,
the timed quantity is dispatch/enqueue only and true completion must be
observed another way (final-value D2H).

Also times a K-pass dispatch followed by a 1-element D2H (np.asarray of a
scalar slice), which PJRT cannot satisfy before execution completes —
the ground-truth completion time. Run this LAST: D2H flips the rig into
degraded mode.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np  # noqa: E402


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax import lax

    from dip_benchmark_tpu.runtime.cache import enable_compilation_cache
    enable_compilation_cache()

    x = jax.block_until_ready(jax.device_put(
        np.zeros((3, 2336, 3504), np.uint8)))

    def make(k):
        def f(v):
            return lax.fori_loop(
                0, k, lambda i, u: u + i.astype(jnp.uint8), v)
        return jax.jit(f).lower(x).compile()

    fns = {k: make(k) for k in (1, 10, 100, 1000)}
    print("phase 1: block_until_ready timing (flat => enqueue-only)")
    for k, fn in fns.items():
        jax.block_until_ready(fn(x))  # warm
        n = 20
        t0 = time.perf_counter()
        for _ in range(n):
            jax.block_until_ready(fn(x))
        dt = (time.perf_counter() - t0) / n
        print(f"  K={k:5d}: {dt * 1e6:10.1f} us/dispatch "
              f"({dt / k * 1e6:8.2f} us/pass)")

    print("phase 2: ground truth via 1-elem D2H (degrades rig; last)")
    for k, fn in fns.items():
        n = 5
        t0 = time.perf_counter()
        for _ in range(n):
            y = fn(x)
            np.asarray(y[0, 0, 0])  # cannot resolve before execution
        dt = (time.perf_counter() - t0) / n
        print(f"  K={k:5d}: {dt * 1e6:10.1f} us/dispatch+sync "
              f"({dt / k * 1e6:8.2f} us/pass)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
