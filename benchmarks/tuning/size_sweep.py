#!/usr/bin/env python3
"""Round-2 lab: spatial-scaling sweep — the framework's answer to the
reference's only scaling axis (image size; SURVEY.md §5 'long-context'
analogue). The banded Pallas grid tiles any (H, W): this sweep measures
true execution time (chained-K marginal, kernel_lab7 protocol) for
representative ops across image sizes spanning the ~128 MB on-chip cache
level found in round 1 (DESIGN.md §2c bandwidth calibration), and reports
effective sustained bandwidth (u8 read+write bytes / time).

Expected shape: flat us-per-byte inside the cache level, a drop to
~670 GB/s HBM-bound beyond it; windowed ops stay VPU-op-bound (their
per-byte cost should be roughly size-independent once bands amortize).
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/benchmarks/", 1)[0])

import numpy as np  # noqa: E402

import jax  # noqa: E402

from dip_benchmark_tpu import oracle  # noqa: E402
from dip_benchmark_tpu.ops.pallas import build_ops  # noqa: E402
from dip_benchmark_tpu.runtime.cache import enable_compilation_cache  # noqa: E402
from dip_benchmark_tpu.utils.image import make_layout, to_planar_padded  # noqa: E402

from kernel_lab7 import exec_time2  # noqa: E402

# Kept small: every new (op, layout) pair is a fresh Mosaic compile
# through the rig's remote compiler (minutes when cold).
OPS = ["Inversion", "Grayscale", "Erosion-3x3-Square",
       "Convolution-5x5", "Fused-Pipeline"]

# (H, W): u8 HWC working set = H*W*3 bytes input + same output.
# 3504x2336 is the benchmark image (cache-resident, ~25 MB); 4096^2 is
# ~50 MB (still inside the ~128 MB cache level with in+out); 7168^2 is
# ~154 MB/image (in+out ~308 MB — past it).
SIZES = [(1024, 1024), (3504, 2336), (4096, 4096), (7168, 7168)]


def main():
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    verify_limit = 3504 * 2336  # keep oracle time bounded; verify small/med
    for h, w in SIZES:
        mb = h * w * 3 / 1e6
        image = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        layout = make_layout(h, w)
        try:
            planar = jax.device_put(to_planar_padded(image, layout))
            ops = build_ops(layout)
        except Exception as e:  # noqa: BLE001
            print(f"— {h}x{w} ({mb:.1f} MB) BUILD FAIL "
                  f"{str(e).splitlines()[0][:80]}")
            continue
        print(f"— {h}x{w} ({mb:.1f} MB/image) —")
        py, px = layout.pad_y, layout.pad_x
        for col in OPS:
            fn = ops[col]
            try:
                out = np.asarray(jax.block_until_ready(fn(planar)))
            except Exception as e:  # noqa: BLE001
                print(f"  {col:22s} FAIL {str(e).splitlines()[0][:80]}")
                continue
            tag = ""
            if h * w <= verify_limit:
                got = np.transpose(out[:, py:py + h, px:px + w], (1, 2, 0))
                ok = np.array_equal(got, oracle.IMAGE_OPS[col](image))
                tag = "" if ok else "  ***NOT EXACT***"
            med, lo = exec_time2(fn, planar, k1=20,
                                 k2=max(60, int(180 * 8.2e6 / (h * w))))
            gbs = 2 * h * w * 3 / med / 1e9 if med else float("inf")
            print(f"  {col:22s} {med * 1e6:9.1f} us  {gbs:7.0f} GB/s "
                  f"eff{tag}")


if __name__ == "__main__":
    main()
