#!/usr/bin/env python3
"""Fused-kernel VMEM envelope probe (round 4, review finding #1).

The fused-channels kernels (Fused-Pipeline, arbitrary `--fuse` chains —
ops/pallas/window.py:204-209) carry a (2, c, blen, wp) DMA window and a
(c, band, wp) out block: 3x the per-channel kernels' exact VMEM terms
that `windowed_vmem_bytes` models. Their compute temps also differ
structurally: the pipeline goes Grayscale-first (3ch -> 1ch, so its
downstream i32 temps are single-channel), while a chain WITHOUT a
leading Grayscale keeps 3 channels live through every stage.

This probe MEASURES each fused form's acceptance boundary on the
current remote compiler, at the band the per-channel envelope fits
(so: exactly what a user gets today), across widths. Completion is
FORCED by a device->host row fetch (on this rig `block_until_ready`
acks enqueue only — an enqueue-OK proves nothing about execution), and
the fetched row is bit-checked against the sequential oracle
composition, so an OK is compile + execute + correct-values.

H=512 keeps oracle time bounded and forces fresh compiles (the cache
holds fundus-height programs).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np  # noqa: E402

import jax  # noqa: E402

from dip_benchmark_tpu.models.chain import make_fused_chain  # noqa: E402
from dip_benchmark_tpu.models.pipeline import (  # noqa: E402
    make_fused_pipeline_pallas)
from dip_benchmark_tpu.runtime.cache import enable_compilation_cache  # noqa: E402
from dip_benchmark_tpu.utils import image as image_mod  # noqa: E402
from dip_benchmark_tpu.utils.image import (  # noqa: E402
    make_layout, to_planar_padded)

HEIGHT = int(os.environ.get("HEIGHT", "512"))
WIDTHS = [int(w) for w in os.environ.get(
    "WIDTHS", "2560,3504,4608,5888,7168").split(",")]
CHAIN3 = ["Inversion", "Convolution-5x5"]      # 3 channels throughout
CHAIN1 = ["Grayscale", "Convolution-5x5"]      # 1 channel after stage 1


def try_form(name, build, planar, layout, want_img):
    t0 = time.perf_counter()
    try:
        fn = build()
        out = fn(planar)
        # Force completion + check values: fetch the middle VALID row of
        # channel 0 (tiny D2H; PJRT cannot serve it before execution).
        y = layout.pad_y + layout.height // 2
        row = np.asarray(out[0, y, layout.pad_x:layout.pad_x
                             + layout.width])
    except Exception as e:  # Mosaic VMEM rejection lands here
        print(f"  {name}: FAIL {type(e).__name__}: {str(e)[:120]}",
              flush=True)
        return
    # want_img is HWC; planar channel 0 = R (or the broadcast gray)
    ok = np.array_equal(row, want_img[layout.height // 2, :, 0])
    print(f"  {name}: {'OK row-exact' if ok else '***ROW MISMATCH***'} "
          f"({time.perf_counter() - t0:.0f}s incl. compile)", flush=True)


def main() -> int:
    enable_compilation_cache()
    from dip_benchmark_tpu import native, oracle
    ops = native.image_ops() if native.available() else oracle.IMAGE_OPS
    rng = np.random.default_rng(11)
    for width in WIDTHS:
        layout = make_layout(HEIGHT, width)
        est = image_mod.windowed_vmem_bytes(layout, 1)
        print(f"width {width}: band {layout.band} "
              f"(per-channel est {est / 2**20:.2f} MiB)", flush=True)
        image = rng.integers(0, 256, size=(HEIGHT, width, 3),
                             dtype=np.uint8)
        planar = jax.device_put(to_planar_padded(image, layout))
        want_pipe = oracle.fused_pipeline(image)
        want3 = ops[CHAIN3[1]](ops[CHAIN3[0]](image))
        want1 = ops[CHAIN1[1]](ops[CHAIN1[0]](image))
        try_form("Fused-Pipeline",
                 lambda: make_fused_pipeline_pallas(layout), planar, layout,
                 want_pipe)
        try_form("chain3 Inv+Conv5x5",
                 lambda: make_fused_chain(layout, CHAIN3), planar, layout,
                 want3)
        try_form("chain1 Gray+Conv5x5",
                 lambda: make_fused_chain(layout, CHAIN1), planar, layout,
                 want1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
