"""Shared Pallas-path plumbing: interpret-mode selection and tile constants.

The P-path is the TPU-native analogue of the reference's hand-written kernel
backends (CUDA.jl kernels at cuda/benchmark.jl:11-133, SYCL kernels at
sycl/benchmark.cpp:41-252): Pallas (Mosaic) kernels over VMEM row-band tiles
of a planar, mirror-pre-padded (C, Hp, Wp) uint8 image (see
utils.image.PlanarLayout). Because the mirror halo is baked into the padding
at upload time, every kernel is pure shift-MAC / shift-min with zero
boundary logic — the TPU replacement for the reference kernels' per-pixel
index-mirroring branches [sycl/benchmark.cpp:143-146].
"""

from __future__ import annotations

import jax

# Row-band sizes, constrained by the 16 MB VMEM budget at full image width
# (Wp = 3584): Pallas double-buffers each pipelined block, and 32-bit compute
# temps cost 4x the uint8 block size. POINT_BAND: u8 elementwise blocks.
# GRAY_BAND: 3-channel blocks + f32 temps, so smaller.
POINT_BAND = 256
GRAY_BAND = 128


def interpret_mode() -> bool:
    """Run kernels in the Pallas interpreter off-TPU (the race-detector/
    sanitizer analogue, SURVEY.md §5) so the suite runs on CPU."""
    return jax.default_backend() != "tpu"



