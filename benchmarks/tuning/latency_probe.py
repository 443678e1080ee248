#!/usr/bin/env python3
"""Probe per-dispatch latency distribution on the live rig.

Times N individual dispatches of (a) a tiny compiled no-op (the pure
dispatch floor: Python -> PJRT -> relay -> TPU -> back) and (b) a few real
ops, printing percentiles. Distinguishes genuine kernel cost from relay
tail noise so bench methodology/numbers can be interpreted honestly.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np  # noqa: E402

FUNDUS = "/root/reference/assets/fundus.jpg"


def sample(fn, x, n):
    import jax
    jax.block_until_ready(fn(x))
    ts = np.empty(n)
    for i in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(x))
        ts[i] = time.perf_counter() - t0
    return ts * 1e6


def report(name, ts):
    q = np.percentile(ts, [0, 50, 90, 99, 100])
    print(f"  {name:22s} mean={ts.mean():8.1f}  p0={q[0]:7.1f} "
          f"p50={q[1]:7.1f} p90={q[2]:7.1f} p99={q[3]:8.1f} "
          f"max={q[4]:9.1f} us  (n={len(ts)})")


def main() -> int:
    n = int(os.environ.get("PROBE_N", "500"))
    import jax
    import jax.numpy as jnp

    from dip_benchmark_tpu.runtime.cache import enable_compilation_cache
    enable_compilation_cache()
    from dip_benchmark_tpu.ops import pallas as pallas_ops
    from dip_benchmark_tpu.utils.image import load_image, make_layout, \
        to_planar_padded

    print(f"device: {jax.devices()[0]}", file=sys.stderr)

    tiny = jax.jit(lambda x: x + 1).lower(
        jnp.zeros((8, 128), jnp.int32)).compile()
    xt = jax.block_until_ready(
        jax.device_put(np.zeros((8, 128), np.int32)))
    report("dispatch-floor", sample(tiny, xt, n))

    if os.path.exists(FUNDUS):
        image = load_image(FUNDUS)
    else:
        rng = np.random.default_rng(0)
        image = rng.integers(0, 256, size=(2336, 3504, 3), dtype=np.uint8)
    h, w, _ = image.shape
    layout = make_layout(h, w)
    planar = jax.block_until_ready(
        jax.device_put(to_planar_padded(image, layout)))
    ops = pallas_ops.build_ops(layout)
    for col in ("Inversion", "Erosion-1x3+3x1-Square", "Convolution-5x5"):
        fn = ops[col]
        compiled = jax.jit(fn).lower(planar).compile() if not hasattr(
            fn, "lower") else fn.lower(planar).compile()
        report(col, sample(compiled, planar, n))
    return 0


if __name__ == "__main__":
    sys.exit(main())
