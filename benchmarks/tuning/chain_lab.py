#!/usr/bin/env python3
"""Generic fused-chain (models/chain.py) on hardware: bit-exactness on the
benchmark image + true-execution time vs dispatching the chain's ops as
individual kernels (each paying its own HBM round-trip and ~39 us fixed
vreg floor, DESIGN.md §2c)."""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/benchmarks/", 1)[0])

import numpy as np  # noqa: E402

import jax  # noqa: E402

from dip_benchmark_tpu import oracle  # noqa: E402
from dip_benchmark_tpu.models.chain import make_fused_chain  # noqa: E402
from dip_benchmark_tpu.ops.pallas import build_ops  # noqa: E402
from dip_benchmark_tpu.runtime.cache import enable_compilation_cache  # noqa: E402
from dip_benchmark_tpu.utils.image import (  # noqa: E402
    load_image, make_layout, to_planar_padded)

from kernel_lab7 import exec_time2  # noqa: E402

CHAINS = [
    (["Grayscale", "Threshold", "Erosion-3x3-Square",
      "Gaussian-Blur-3x3"], None),                  # flagship; i32 (erosion)
    (["Inversion", "Convolution-3x3"], None),       # packed
    (["Convolution-5x5", "Convolution-3x3", "Erosion-3x3-Square",
      "Threshold"], 4),                             # i32 (erosion)
    (["Convolution-5x5", "Convolution-3x3", "Inversion",
      "Threshold"], 3),                             # packed, conv-heavy
    (["Grayscale", "Threshold", "Convolution-3x3",
      "Gaussian-Blur-3x3"], None),                  # packed, gray-first
]


def main():
    enable_compilation_cache()
    image = load_image("/root/reference/assets/fundus.jpg")
    h, w = image.shape[:2]

    for cols, halo in CHAINS:
        kw = {"halo": halo} if halo else {}
        layout = make_layout(h, w, **kw)
        planar = jax.device_put(to_planar_padded(image, layout))
        name = "+".join(c.split("-")[0][:4] for c in cols)
        try:
            fn = make_fused_chain(layout, cols)
            out = np.asarray(jax.block_until_ready(fn(planar)))
        except Exception as e:  # noqa: BLE001
            print(f"  {name:24s} FAIL {str(e).splitlines()[0][:90]}")
            continue
        py, px = layout.pad_y, layout.pad_x
        got = np.transpose(out[:, py:py + h, px:px + w], (1, 2, 0))
        want = image
        for c in cols:
            want = oracle.IMAGE_OPS[c](want)
        ok = np.array_equal(got, want)
        med, lo = exec_time2(fn, planar)
        # sequential comparison: chain the individual op kernels in-graph
        ops = build_ops(layout)

        def seq(v, _cols=tuple(cols)):
            for c in _cols:
                v = ops[c](v)
            return v
        smed, slo = exec_time2(seq, planar)
        print(f"  {name:24s} exact={ok} fused {med * 1e6:7.1f} us  "
              f"sequential {smed * 1e6:7.1f} us  ({smed / med:4.1f}x)")


if __name__ == "__main__":
    main()
