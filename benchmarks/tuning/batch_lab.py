#!/usr/bin/env python3
"""Serving-throughput lab: batched fused pipeline, exec-time per image.

Measures vmapped execution of the flagship pipeline over B copies of the
fundus image (X-path vmap, and the Pallas kernel vmapped over the batch
dim), via the chained-K marginal. Reports images/s and Gpx/s at B = 1..4.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np  # noqa: E402

import jax  # noqa: E402
from jax import lax  # noqa: E402

from dip_benchmark_tpu.models.pipeline import make_fused_pipeline_pallas  # noqa: E402
from dip_benchmark_tpu.runtime.cache import enable_compilation_cache  # noqa: E402
from dip_benchmark_tpu.utils.image import load_image, make_layout, \
    to_planar_padded  # noqa: E402

FUNDUS = "/root/reference/assets/fundus.jpg"
K1, K2 = 20, 200


def main() -> int:
    enable_compilation_cache()
    if os.path.exists(FUNDUS):
        image = load_image(FUNDUS)
    else:
        rng = np.random.default_rng(0)
        image = rng.integers(0, 256, size=(2336, 3504, 3), dtype=np.uint8)
    h, w, _ = image.shape
    mpx = h * w / 1e6
    layout = make_layout(h, w)
    planar1 = to_planar_padded(image, layout)
    pipe = make_fused_pipeline_pallas(layout)

    def t_sync(fn, x, n=5):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            y = fn(x)
            np.asarray(y.ravel()[0])
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    for b in (1, 2, 4):
        batch = jax.block_until_ready(jax.device_put(
            np.broadcast_to(planar1, (b,) + planar1.shape).copy()))
        vpipe = make_fused_pipeline_pallas(layout, batch=b)

        def chained(k):
            def body(i, v):
                out = vpipe(v)
                return lax.dynamic_update_slice(
                    v, out.astype(v.dtype), (0, 0, 0, 0))
            return jax.jit(lambda v: lax.fori_loop(0, k, body, v)
                           ).lower(batch).compile()
        try:
            f1, f2 = chained(K1), chained(K2)
            t1, t2 = t_sync(f1, batch), t_sync(f2, batch)
            te = (t2 - t1) / (K2 - K1)
            per_img = te / b
            print(f"  pallas-pipeline B={b}: {te * 1e6:7.1f} us/batch  "
                  f"{per_img * 1e6:6.1f} us/image  "
                  f"{1 / per_img:8.0f} img/s  "
                  f"{mpx / per_img / 1e3:6.2f} Gpx/s")
        except Exception as e:
            print(f"  pallas-pipeline B={b} FAILED: {str(e)[:100]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
