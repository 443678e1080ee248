"""dip_benchmark_tpu: a TPU-native digital image processing benchmark framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the
jusqua/dip-benchmark suite: the 14-operation matrix (memory / point /
erosion / convolution ops) over uint8 RGB images, the once-vs-repeatedly
timing harness, the CLI and CSV/plot reporting contract — designed TPU-first:

- P-path: hand-written fused Pallas (Mosaic) kernels over VMEM row-band tiles
  of a planar mirror-pre-padded uint8 layout (the CUDA.jl/SYCL hand-written
  kernel analogue, SURVEY.md §2.2).
- X-path: jitted jax.numpy / lax library calls (the OpenCV/MATLAB/VisionGL
  library-call analogue).

Both paths are bit-exact against the NumPy oracle in dip_benchmark_tpu.oracle,
which encodes the 4-of-5 consensus semantics of the reference backends.
"""

__version__ = "0.1.0"

from . import spec  # noqa: F401
