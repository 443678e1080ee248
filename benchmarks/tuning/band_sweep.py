#!/usr/bin/env python3
"""Tuning experiment: dispatch floor + band-size sweep for windowed kernels.

SUPERSEDED: this script times with block_until_ready, which acks enqueue
on relay rigs (sync_probe.py), so its per-application numbers are
submission rates. kernel_lab4/5 re-measure with the chained-K marginal +
forced completion. Kept for the dispatch-floor measurement it pioneered.

Answers two questions on the real TPU rig:
1. What is the irreducible per-dispatch latency (relay RTT + PJRT execute)?
   Measured with a compiled 1-element no-op — this is the floor every
   per-dispatch op time sits on.
2. Which row-band size minimizes the windowed kernels' on-device time?
   Swept via the chained-execution trick (K in-graph applications per
   dispatch) so the answer reflects kernel time, not dispatch overhead.

Usage: python benchmarks/tuning/band_sweep.py [--rounds 100] [--chain 50]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np  # noqa: E402

FUNDUS = "/root/reference/assets/fundus.jpg"


def timed(fn, x, rounds):
    import jax
    jax.block_until_ready(fn(x))  # compile
    t0 = time.perf_counter()
    for _ in range(rounds):
        jax.block_until_ready(fn(x))
    return (time.perf_counter() - t0) / rounds


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=100)
    ap.add_argument("--chain", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from dip_benchmark_tpu.runtime.cache import enable_compilation_cache
    enable_compilation_cache()
    from dip_benchmark_tpu.ops.pallas import window
    from dip_benchmark_tpu.utils.image import load_image, make_layout, \
        to_planar_padded
    from dip_benchmark_tpu import spec

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    # 1. dispatch floor: trivial compiled ops of increasing output size
    for name, mk in [
        ("noop-1elem", lambda: (jax.jit(lambda x: x + 1).lower(
            jnp.zeros((8, 128), jnp.int32)).compile(),
            jax.device_put(np.zeros((8, 128), np.int32)))),
        ("add-24MB", lambda: (jax.jit(lambda x: x + 1).lower(
            jnp.zeros((3, 2336, 3584), jnp.uint8)).compile(),
            jax.device_put(np.zeros((3, 2336, 3584), np.uint8)))),
    ]:
        fn, x = mk()
        t = timed(fn, x, args.rounds)
        print(f"  {name:24s} {t * 1e6:8.1f} us/dispatch")

    # 2. band sweep on the real image, chained to expose kernel time
    if os.path.exists(FUNDUS):
        image = load_image(FUNDUS)
    else:
        rng = np.random.default_rng(0)
        image = rng.integers(0, 256, size=(2336, 3504, 3), dtype=np.uint8)
    h, w, _ = image.shape

    for band in (56, 112, 224, 448):
        layout = make_layout(h, w, band=band)
        planar = jax.device_put(to_planar_padded(image, layout))
        results = {}
        ops = {
            "erosion-square": window.make_erosion(
                layout, window.mask_to_taps(np.ones((3, 3), bool))),
            "conv5x5": window.make_convolution(
                layout, 5, 5, spec.BLUR_5X5_SHIFT, spec.BLUR_5X5_INT),
            "blur3x3": window.make_gaussian_blur_3x3(layout),
        }
        for name, op in ops.items():
            # chain K applications in-graph: output shape == input valid
            # shape differs (banded), so re-wrap via dynamic_update_slice of
            # the valid region back into the padded buffer.
            def once(x, op=op):
                return op(x)
            k = args.chain

            def chained(x, op=op):
                def body(i, v):
                    out = op(v)  # (C, banded, Wp)
                    return lax.dynamic_update_slice(
                        v, out.astype(v.dtype),
                        (0, layout.pad_y, 0))
                return lax.fori_loop(0, k, body, x)
            fn = jax.jit(chained).lower(planar).compile()
            t = timed(fn, planar, max(3, args.rounds // 10)) / k
            results[name] = t * 1e6
        row = "  ".join(f"{n}={v:7.1f}us" for n, v in results.items())
        # layout.band may be smaller than requested: make_layout caps the
        # band to the VMEM envelope (utils/image.py:fit_band) — print the
        # band actually measured so the table never lies.
        print(f"  band={layout.band:4d}  {row}"
              + ("" if layout.band == band else f"  (requested {band})"))
    return 0


if __name__ == "__main__":
    sys.exit(main())
