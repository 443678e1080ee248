#!/usr/bin/env python3
"""Wide-model hardware anchor (round 4): run a width PAST the
single-buffer envelope through the column-strip resident model
(models/wide.py), bit-check against the native/NumPy oracle, and
measure the chained-K exec marginal.

Default point: 1024 x 65536 (the single-buffer envelope tops out near
52.7k uint8 columns — make_layout refuses 65536). The default strip
plan is 13 strips (12 x 5120 + a 4096 remainder), every strip at the
full 112-row band AND at the measured conv-5x5 compiler pass point
(Wp 5248 — models/wide.MEASURED_SAFE_STRIP_U8): the same kernels the
benchmark image runs, so per-pixel cost should match the in-envelope
regime plus the seam refresh (4 lane-dim update-slices per seam per
application).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np  # noqa: E402

import jax  # noqa: E402
from jax import lax  # noqa: E402

from dip_benchmark_tpu import native, oracle  # noqa: E402
from dip_benchmark_tpu.models import wide  # noqa: E402
from dip_benchmark_tpu.runtime.cache import enable_compilation_cache  # noqa: E402
from dip_benchmark_tpu.utils.image import make_layout  # noqa: E402

K1 = int(os.environ.get("K1", "5"))
K2 = int(os.environ.get("K2", "25"))
HEIGHT = int(os.environ.get("HEIGHT", "1024"))
WIDTH = int(os.environ.get("WIDTH", "65536"))
COLS = os.environ.get("COLS", "Erosion-3x3-Square,Convolution-5x5").split(",")
# Strip-width override (0 = the model's default plan). Lets an offline
# CPU dry-run exercise a multi-strip plan at tiny sizes before the
# script runs unattended on a real TPU window.
STRIP = int(os.environ.get("STRIP", "0")) or None


def main() -> int:
    enable_compilation_cache()
    try:
        make_layout(HEIGHT, WIDTH)
        print(f"NOTE: width {WIDTH} fits the single-buffer envelope — "
              f"probe still runs the strip model", flush=True)
    except ValueError:
        print(f"width {WIDTH}: beyond the single-buffer envelope "
              f"(make_layout refuses) — strip model required", flush=True)
    wl = wide.make_wide_layout(HEIGHT, WIDTH, strip_width=STRIP)
    print(f"strip plan: {wl.n_strips} strips of {wl.strip_width} "
          f"(last {wl.layouts[-1].width}), band {wl.layouts[0].band}",
          flush=True)
    rng = np.random.default_rng(7)
    image = rng.integers(0, 256, size=(HEIGHT, WIDTH, 3), dtype=np.uint8)
    strips = wide.put_wide(wide.to_wide_resident(image, wl))
    ops = wide.build_wide_ops(wl)
    ops_oracle = native.image_ops() if native.available() else oracle.IMAGE_OPS
    for col in COLS:
        op = ops[col]
        try:
            out = jax.block_until_ready(op(strips))
        except Exception as e:  # Mosaic rejection lands here
            print(f"  {col}: FAILED: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
            continue
        got = wide.from_wide_resident(out, wl)
        want = ops_oracle[col](image)
        ok = np.array_equal(got, want)
        print(f"  {col}: bit-check {'OK' if ok else 'MISMATCH'}", flush=True)

        def chained(k):
            def body(v):
                return lax.fori_loop(0, k, lambda i, u: op(u), v)
            return jax.jit(body).lower(strips).compile()
        f1, f2 = chained(K1), chained(K2)

        def t_sync(fn, n=5):
            ts = []
            for _ in range(n):
                t0 = time.perf_counter()
                y = fn(strips)
                np.asarray(y[0].ravel()[0])  # force completion
                ts.append(time.perf_counter() - t0)
            return float(np.median(ts))
        te = (t_sync(f2) - t_sync(f1)) / (K2 - K1)
        mb = HEIGHT * WIDTH * 3 / 2**20
        print(f"  {col}: exec {te * 1e6:8.1f} us/app "
              f"({mb / te / 1024:.1f} GiB/s over {mb:.0f} MiB)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
