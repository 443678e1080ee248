#!/usr/bin/env python3
"""Round-2 lab 10: windowed-kernel cost LAW — per-op slope vs fixed
per-step overhead, and band-size scaling.

Lab 9 refuted the relayout hypothesis: a 5-op E/O identity costs ~66 us,
same as widen+narrow, while lab 8 measured marginal ALU ops at 2-4 us.
That pattern fits a FIXED per-grid-step cost (63 steps at band=112) that
the DMA-only copy-through (7.8 us) avoids by never touching vregs.

Measures:
  1. N-op ladder (N xor passes over the bitcast window, N=0..16) at
     band=112 -> slope (per-op) + intercept (fixed) of vreg compute.
  2. The same ladder at band=336 and band=784 (21 and 9 grid steps).
  3. The shipped erosion-square / conv3x3 / conv5x5 / blur at each band.
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/benchmarks/", 1)[0])

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from dip_benchmark_tpu import oracle, spec  # noqa: E402
from dip_benchmark_tpu.ops.pallas.window import (  # noqa: E402
    _windowed_call, make_convolution, make_erosion,
    make_gaussian_blur_3x3, mask_to_taps)
from dip_benchmark_tpu.runtime.cache import enable_compilation_cache  # noqa: E402
from dip_benchmark_tpu.utils import image as image_mod  # noqa: E402
from dip_benchmark_tpu.utils.image import load_image, to_planar_padded  # noqa: E402

from kernel_lab7 import exec_time2  # noqa: E402


def make_xor_ladder(layout, n_ops):
    """n_ops xor passes over the raw window's i32 bitcast (pure vreg ALU,
    no casts, no rolls, no unaligned slices), output = aligned slice."""
    band = layout.band
    qb = band // 4
    q0 = 8 // 4

    def body(xw, out_ref, *_):
        v = pltpu.bitcast(xw, jnp.int32)
        for i in range(n_ops):
            v = v ^ np.int32(0x01010101 * (i + 1))
        out_ref[0] = pltpu.bitcast(v[q0:q0 + qb], jnp.uint8)

    return _windowed_call(layout, 1, body, raw_window=True)


def main():
    enable_compilation_cache()
    image = load_image("/root/reference/assets/fundus.jpg")
    h, w = image.shape[:2]

    for band in (112, 336, 784):
        layout = image_mod.make_layout(h, w, band=band)
        planar = jax.device_put(to_planar_padded(image, layout))
        nb = layout.banded_height // band
        print(f"— band={band} ({3 * nb} grid steps) —")

        for n in (0, 2, 4, 8, 16):
            try:
                fn = make_xor_ladder(layout, n)
                med, lo = exec_time2(fn, planar)
                print(f"  xor x{n:2d}: {med * 1e6:8.1f} / {lo * 1e6:8.1f} us")
            except Exception as e:  # noqa: BLE001
                print(f"  xor x{n:2d}: FAIL {str(e).splitlines()[0][:90]}")

        ops = {
            "ero-square": (make_erosion(
                layout, mask_to_taps(np.ones((3, 3), bool))),
                "Erosion-3x3-Square"),
            "conv3x3": (make_convolution(
                layout, 3, 3, spec.BLUR_3X3_SHIFT, spec.BLUR_3X3_INT),
                "Convolution-3x3"),
            "conv5x5": (make_convolution(
                layout, 5, 5, spec.BLUR_5X5_SHIFT, spec.BLUR_5X5_INT),
                "Convolution-5x5"),
            "blur3x3": (make_gaussian_blur_3x3(layout),
                        "Gaussian-Blur-3x3"),
        }
        py, px = layout.pad_y, layout.pad_x
        for name, (fn, col) in ops.items():
            try:
                out = np.asarray(jax.block_until_ready(fn(planar)))
            except Exception as e:  # noqa: BLE001
                print(f"  {name:10s} FAIL {str(e).splitlines()[0][:90]}")
                continue
            got = np.transpose(out[:, py:py + h, px:px + w], (1, 2, 0))
            ok = np.array_equal(got, oracle.IMAGE_OPS[col](image))
            med, lo = exec_time2(fn, planar)
            print(f"  {name:10s} exact={ok} {med * 1e6:8.1f} / "
                  f"{lo * 1e6:8.1f} us")


if __name__ == "__main__":
    main()
