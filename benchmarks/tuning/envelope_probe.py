#!/usr/bin/env python3
"""Size-envelope probe (round 4, VERDICT #7).

make_layout enforces a VMEM envelope via `windowed_vmem_bytes`
(utils/image.py). This probe MEASURES the envelope on real hardware —
its runs FALSIFIED two prior constant sets (TEMP_ROW_FACTOR 2 /
16 MiB, then budget 15.5 MiB: conv-5x5 HTTP-500s at band 112 x
width 5888, est 15.42 MiB — docs/artifacts/envelope_probe_r4_before
.txt and the width-5888 row of the current artifact) and the final
constants (factor 5, budget 14.9 MiB — between conv's measured pass
at est 14.86 and its rejection at 15.42) were bisected from those
failures. Default widths probe the recalibrated boundary:

  - width 5888: the exact width where the 15.5 MiB budget admitted a
    band-112 conv layout the compiler rejects; under 14.9 MiB it fits
    band 104 (est 14.37 MiB) — this point passing is the recalibration's
    validity check, and a FUTURE toolchain re-accepting band 112 here
    means the constants have become too conservative
  - width 7168: fitted-band regime (band 88, est 14.86 MiB — the
    measured conv pass nearest the budget; the round-3 toolchain
    accepted band 112 here — drift marker)
  - width 16384: deep band-cap regime (band 32)

Set PROBE_BAND=112 to FORCE a band and re-attempt the layouts the
budget rejects (bypassing make_layout's cap): that is how to observe a
FUTURE toolchain re-accepting the rejected boundary (constants too
conservative) — make_layout alone can never produce an over-budget
layout, so without this knob the conservative direction of drift is
undetectable. PROBE_BAND=48 WIDTHS=12800 reproduces the archived
band-48 anchor row.

Re-run after any toolchain change (STATUS.md open items).

Each point runs Erosion-3x3-Square and Convolution-5x5 through the
P-path kernels, bit-checks a row stripe against the NumPy/native oracle,
and prints the chained-K exec marginal so the docs can state the
per-op cost alongside the envelope bound.

Height is fixed at 1024 rows to keep compute/oracle time bounded; the
envelope under test is the WIDTH (per-band VMEM) axis.
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
from dip_benchmark_tpu.ops import pallas as pallas_ops  # noqa: E402
from dip_benchmark_tpu.runtime.cache import enable_compilation_cache  # noqa: E402
from dip_benchmark_tpu.utils import image as image_mod  # noqa: E402
from dip_benchmark_tpu.utils.image import (  # noqa: E402
    from_planar_padded, make_layout, to_planar_padded)

K1 = int(os.environ.get("K1", "10"))
K2 = int(os.environ.get("K2", "50"))
WIDTHS = [int(w) for w in os.environ.get(
    "WIDTHS", "5888,7168,16384").split(",")]
HEIGHT = int(os.environ.get("HEIGHT", "1024"))
PROBE_BAND = int(os.environ.get("PROBE_BAND", "0"))  # 0 = fitted band
COLS = ["Erosion-3x3-Square", "Convolution-5x5"]


def _layout(width: int):
    if PROBE_BAND:
        # Bypass the budget cap: build the exact (possibly over-budget)
        # layout, to re-attempt rejected boundary shapes (docstring).
        from dip_benchmark_tpu.utils.image import (DEFAULT_HALO,
                                                   PlanarLayout)
        return PlanarLayout(HEIGHT, width, 3, pad_y=DEFAULT_HALO,
                            pad_x=DEFAULT_HALO, band=PROBE_BAND)
    return make_layout(HEIGHT, width)


def main() -> int:
    enable_compilation_cache()
    ops_oracle = native.image_ops() if native.available() else oracle.IMAGE_OPS
    rng = np.random.default_rng(7)
    for width in WIDTHS:
        layout = _layout(width)
        est = image_mod.windowed_vmem_bytes(layout, 1)
        print(f"width {width}: band {layout.band} "
              f"(est {est / 2**20:.2f} MiB of "
              f"{image_mod.VMEM_BUDGET / 2**20:.1f} MiB)", flush=True)
        image = rng.integers(0, 256, size=(HEIGHT, width, 3), dtype=np.uint8)
        planar = jax.device_put(to_planar_padded(image, layout))
        ops = pallas_ops.build_ops(layout)
        for col in COLS:
            op = ops[col]
            try:
                out = jax.block_until_ready(op(planar))
            except Exception as e:  # Mosaic VMEM OOM lands here
                print(f"  {col}: FAILED to compile/run: "
                      f"{type(e).__name__}: {str(e)[:300]}", flush=True)
                continue
            got = from_planar_padded(np.asarray(out), layout)
            want = ops_oracle[col](image)
            ok = np.array_equal(got, want)
            print(f"  {col}: bit-check {'OK' if ok else 'MISMATCH'}",
                  flush=True)
            # exec marginal (chained-K; forced completion by 1-elt read)
            def chained(k):
                return jax.jit(lambda v: lax.fori_loop(
                    0, k, lambda i, u: op(u), v)).lower(planar).compile()
            f1, f2 = chained(K1), chained(K2)

            def t_sync(fn, n=5):
                ts = []
                for _ in range(n):
                    t0 = time.perf_counter()
                    y = fn(planar)
                    np.asarray(y.ravel()[0])
                    ts.append(time.perf_counter() - t0)
                return float(np.median(ts))
            te = (t_sync(f2) - t_sync(f1)) / (K2 - K1)
            mb = HEIGHT * width * 3 / 2**20
            print(f"  {col}: exec {te * 1e6:8.1f} us/app "
                  f"({mb / te / 1024:.1f} GiB/s over {mb:.0f} MiB)",
                  flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
