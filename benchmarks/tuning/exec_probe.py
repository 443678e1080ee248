#!/usr/bin/env python3
"""True per-op device EXECUTION time via chained-K marginal fit.

On this rig jax.block_until_ready acks enqueue without awaiting execution
(benchmarks/tuning/sync_probe.py), so wall-clock dispatch loops measure the
relay, not the kernels. Ground truth: run K in-graph applications of an op
inside one dispatch, force completion with a 1-element D2H (which PJRT
cannot satisfy early), and take the marginal between two K values:

    t_exec = (T(K2) - T(K1)) / (K2 - K1)

This cancels the fixed enqueue + D2H round-trip (~30 ms on this transport)
and is immune to any relay-side caching of identical requests. Pallas
kernels are opaque custom calls, so XLA cannot fold the chain.

Point ops chain directly (shape-preserving on the padded planar buffer);
windowed ops re-insert their (C, banded, Wp) output into the padded buffer
via dynamic_update_slice (adds one on-device copy per pass, itself ~2x
image bytes — reported alongside).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np  # noqa: E402

FUNDUS = "/root/reference/assets/fundus.jpg"
K1, K2 = 30, 300


def main() -> int:
    import jax
    from jax import lax

    from dip_benchmark_tpu.runtime.cache import enable_compilation_cache
    enable_compilation_cache()
    from dip_benchmark_tpu.ops import pallas as pallas_ops
    from dip_benchmark_tpu.utils.image import load_image, make_layout, \
        to_planar_padded

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
    img_mb = h * w * 3 / 1e6

    def chained(op, k, windowed):
        def body(i, v):
            out = op(v)
            if windowed:
                # tile-ALIGNED update (row 0): an unaligned row offset
                # costs ~450 us/pass of sublane shuffling (kernel_lab3.py)
                return lax.dynamic_update_slice(
                    v, out.astype(v.dtype), (0, 0, 0))
            return out

        def f(v):
            return lax.fori_loop(0, k, body, v)
        return jax.jit(f).lower(planar).compile()

    def t_sync(fn, n=5):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            y = fn(planar)
            np.asarray(y[0, 0, 0])  # forces completion
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    cols = ["Copy", "Inversion", "Grayscale", "Threshold",
            "Erosion-3x3-Cross", "Erosion-3x3-Square",
            "Erosion-1x3+3x1-Square", "Convolution-3x3",
            "Convolution-1x3+3x1", "Convolution-5x5",
            "Convolution-1x5+5x1", "Gaussian-Blur-3x3", "Fused-Pipeline"]
    print(f"image {w}x{h} ({img_mb:.1f} MB rgb); K marginal "
          f"({K1} vs {K2}); v5e HBM ~819 GB/s")

    def run_table(label, table, windowed_fn, chain_fn, t_sync=t_sync):
        print(f"-- {label}")
        for col in cols:
            if col not in table:
                continue
            op = table[col]
            windowed = windowed_fn(col)
            try:
                f1 = chain_fn(op, K1, windowed)
                f2 = chain_fn(op, K2, windowed)
            except Exception as e:
                print(f"  {col:26s} compile failed: {str(e)[:80]}")
                continue
            t1, t2 = t_sync(f1), t_sync(f2)
            te = (t2 - t1) / (K2 - K1)
            # op reads+writes ~image bytes each pass; DUS adds r+w more
            passes_bytes = (2 + (2 if windowed else 0)) * np.prod(layout.shape)
            gbps = passes_bytes / te / 1e9 if te > 0 else float("inf")
            print(f"  {col:26s} exec {te * 1e6:7.1f} us/pass   "
                  f"(~{gbps:6.0f} GB/s incl. {'DUS' if windowed else 'no'} "
                  f"chain copy; T{K1}={t1 * 1e3:6.1f} ms "
                  f"T{K2}={t2 * 1e3:6.1f} ms)")

    run_table(
        "Pallas (planar padded)", ops,
        lambda col: col not in ("Copy", "Inversion", "Grayscale",
                                "Threshold"),
        chained)

    # X-path: jitted lax/jnp library ops on the uint8 HWC image —
    # shape-preserving, so they chain directly with no DUS copy.
    if os.environ.get("EXEC_PROBE_XLA", "1") == "1":
        from jax import lax as _lax
        from dip_benchmark_tpu.ops import xla as xla_ops
        img_dev = jax.block_until_ready(jax.device_put(image))

        def chained_xla(op, k, windowed):
            def f(v):
                return _lax.fori_loop(0, k, lambda i, u: op(u), v)
            return jax.jit(f).lower(img_dev).compile()

        def t_sync_xla(fn, n=5):
            ts = []
            for _ in range(n):
                t0 = time.perf_counter()
                y = fn(img_dev)
                np.asarray(y[0, 0, 0])
                ts.append(time.perf_counter() - t0)
            return float(np.median(ts))

        run_table("XLA library calls (uint8 HWC)", xla_ops.IMAGE_OPS,
                  lambda col: False, chained_xla, t_sync=t_sync_xla)
    return 0


if __name__ == "__main__":
    sys.exit(main())
