#!/usr/bin/env python3
"""TPU backend for the dip-benchmark suite — drop-in sixth sibling.

Usage (identical contract to the other backends):
    python benchmark.py <infile> <outdir> [--rounds N]

Implementation lives in the dip_benchmark_tpu package at the repo root.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from dip_benchmark_tpu.cli import main  # noqa: E402

if __name__ == "__main__":
    sys.exit(main())
