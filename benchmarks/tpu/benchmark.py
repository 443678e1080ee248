#!/usr/bin/env python3
"""TPU backend for the dip-benchmark suite — drop-in sixth sibling.

Usage (identical contract to the other backends):
    python benchmark.py <infile> <outdir> [--rounds N]

Implementation lives in the dip_benchmark_tpu package at the repo root.

Documented timing-protocol deviations from the reference siblings (both
honest-measurement changes, both revertible by flag):
  - measurements are ordered so no device->host transfer precedes a timed
    loop (D2H flips relay rigs into a degraded dispatch mode; README);
  - each op's timed loop is preceded by a default 10 untimed post-compile
    calls that drain the compile transport burst (--warmup 0 restores the
    strict reference protocol of timing immediately after the 'once' call).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from dip_benchmark_tpu.cli import main  # noqa: E402

if __name__ == "__main__":
    sys.exit(main())
