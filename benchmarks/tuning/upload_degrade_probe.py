#!/usr/bin/env python3
"""A/B probe: does a burst of large H2D uploads degrade subsequent
per-dispatch latency on this rig (the way one D2H flips it ~500x)?

Measures a compute op's latency distribution before and after 10 x 24 MB
jax.device_put bursts. If 'after' p50 is materially worse, the harness must
measure Upload AFTER the compute ops (it already defers Download).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np  # noqa: E402


def dist(fn, x, n=300):
    import jax
    jax.block_until_ready(fn(x))
    ts = np.empty(n)
    for i in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(x))
        ts[i] = time.perf_counter() - t0
    q = np.percentile(ts * 1e6, [50, 90, 99])
    return f"p50={q[0]:7.1f} p90={q[1]:7.1f} p99={q[2]:8.1f} us"


def main() -> int:
    import jax

    from dip_benchmark_tpu.runtime.cache import enable_compilation_cache
    enable_compilation_cache()
    from dip_benchmark_tpu.ops import pallas as pallas_ops
    from dip_benchmark_tpu.utils.image import make_layout, to_planar_padded

    rng = np.random.default_rng(0)
    image = rng.integers(0, 256, size=(2336, 3504, 3), dtype=np.uint8)
    layout = make_layout(2336, 3504)
    planar = jax.block_until_ready(
        jax.device_put(to_planar_padded(image, layout)))
    inv = pallas_ops.build_ops(layout)["Inversion"]
    compiled = inv.lower(planar).compile()

    print(f"  before uploads : {dist(compiled, planar)}")
    for k in range(10):
        t0 = time.perf_counter()
        jax.block_until_ready(jax.device_put(image))
        print(f"    upload {k}: {time.perf_counter() - t0:6.3f} s",
              file=sys.stderr)
    print(f"  after 10x24MB H2D: {dist(compiled, planar)}")
    time.sleep(5)
    print(f"  after 5s idle  : {dist(compiled, planar)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
