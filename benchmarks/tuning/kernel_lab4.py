#!/usr/bin/env python3
"""Kernel lab 4: true windowed-kernel times with an ALIGNED chain copy.

lab3 exposed that the chained-K harness's dynamic_update_slice at row
offset pad_y=2 is sublane-misaligned on the (8,128)(4,1)-tiled u8 buffer,
costing ~450 us/pass by itself and polluting every windowed measurement.
Chaining with the update at row 0 (tile-aligned) reduces the chain copy to
a plain aligned region copy; this lab re-measures every windowed kernel
(current + lab variants) with the aligned chain, plus the passthrough
floor so the chain cost itself is visible.

(The real benchmark never does any DUS — this is purely measurement
hygiene for the lab harness.)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np  # noqa: E402

import jax  # noqa: E402
from jax import lax  # noqa: E402

from dip_benchmark_tpu import oracle, spec  # noqa: E402
from dip_benchmark_tpu.ops.pallas import window  # noqa: E402
from dip_benchmark_tpu.runtime.cache import enable_compilation_cache  # noqa: E402
from dip_benchmark_tpu.utils.image import load_image, make_layout, \
    to_planar_padded  # noqa: E402

import benchmarks.tuning.kernel_lab as lab1  # noqa: E402
import benchmarks.tuning.kernel_lab2 as lab2  # noqa: E402

FUNDUS = "/root/reference/assets/fundus.jpg"
K1, K2 = 30, 300


def main() -> int:
    enable_compilation_cache()
    if os.path.exists(FUNDUS):
        image = load_image(FUNDUS)
    else:
        rng = np.random.default_rng(0)
        image = rng.integers(0, 256, size=(2336, 3504, 3), dtype=np.uint8)
    h, w, _ = image.shape
    layout = make_layout(h, w)
    planar = jax.block_until_ready(
        jax.device_put(to_planar_padded(image, layout)))

    def chained(op, k):
        def body(i, v):
            out = op(v)
            # row 0 is tile-aligned: plain aligned region copy, ~65 us
            return lax.dynamic_update_slice(v, out.astype(v.dtype),
                                            (0, 0, 0))
        return jax.jit(lambda v: lax.fori_loop(0, k, body, v)
                       ).lower(planar).compile()

    def t_sync(fn, n=5):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            y = fn(planar)
            np.asarray(y[0, 0, 0])
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    O = oracle.IMAGE_OPS
    taps_sq = window.mask_to_taps(np.ones((3, 3), bool))
    taps_cross = window.mask_to_taps(
        np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]], bool))

    cases = {
        "passthrough (floor)": (None, lab2.make_passthrough(layout)),
        "erosion-sq/cur": (O["Erosion-3x3-Square"],
                           window.make_erosion(layout, taps_sq)),
        "erosion-sq/sep-i32": (O["Erosion-3x3-Square"],
                               lab1.make_erosion_square_i32_sep(layout)),
        "erosion-cross/cur": (O["Erosion-3x3-Cross"],
                              window.make_erosion(layout, taps_cross)),
        "erosion-cross/4min": (O["Erosion-3x3-Cross"],
                               lab1.make_erosion_cross_f32(layout)),
        "erosion-sep/cur": (O["Erosion-1x3+3x1-Square"],
                            window.make_erosion_separated_fused(layout)),
        "conv3x3/cur-i32": (O["Convolution-3x3"], window.make_convolution(
            layout, 3, 3, spec.BLUR_3X3_SHIFT, spec.BLUR_3X3_INT)),
        "conv3x3/packed16": (O["Convolution-3x3"],
                             lab2.make_conv3x3_packed16(layout)),
        "conv5x5/cur-i32": (O["Convolution-5x5"], window.make_convolution(
            layout, 5, 5, spec.BLUR_5X5_SHIFT, spec.BLUR_5X5_INT)),
        "conv-sep3/cur": (O["Convolution-1x3+3x1"],
                          window.make_convolution_separated_fused(
                              layout, 3, spec.BLUR_1X3_INT,
                              spec.BLUR_SEP3_SHIFT)),
        "conv-sep5/cur": (O["Convolution-1x5+5x1"],
                          window.make_convolution_separated_fused(
                              layout, 5, spec.BLUR_1X5_INT,
                              spec.BLUR_SEP5_SHIFT)),
        "blur3x3/cur": (O["Gaussian-Blur-3x3"],
                        window.make_gaussian_blur_3x3(layout)),
    }
    for name, (check, op) in cases.items():
        try:
            ok = "   "
            if check is not None:
                arr = np.asarray(jax.jit(op)(planar))
                got = np.transpose(
                    arr[:, :h, layout.pad_x:layout.pad_x + w], (1, 2, 0))
                ok = "OK " if np.array_equal(got, check(image)) else "BAD"
            else:
                jax.block_until_ready(jax.jit(op)(planar))
            f1, f2 = chained(op, K1), chained(op, K2)
            t1, t2 = t_sync(f1), t_sync(f2)
            te = (t2 - t1) / (K2 - K1)
            print(f"  {name:22s} [{ok}] exec {te * 1e6:7.1f} us/pass "
                  f"(T{K1}={t1 * 1e3:6.1f} T{K2}={t2 * 1e3:6.1f} ms)")
        except Exception as e:
            print(f"  {name:22s} FAILED: {str(e)[:110]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
