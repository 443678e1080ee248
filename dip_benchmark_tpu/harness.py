"""L3 harness: the operations table and the benchmark loop.

Reproduces the reference contract [opencv/benchmark.py:41-114,
sycl/benchmark.cpp:254-387]: build a list of (description, prefix, thunk),
time each with the two-phase timer, print a markdown row, and dump each op's
result image as <prefix>-<filename> (skipping memory ops with empty prefix,
the 4-of-5 consensus — the OpenCV backend's stray empty-prefix write is a
known reference bug, SURVEY.md §2.4.7).

On top of the reference contract this harness adds: programmatic results.csv
writing, optional bit-exact output verification against the NumPy oracle
(the reference had only manual golden-image eyeballing, SURVEY.md §4), and an
optional jax.profiler trace hook.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any, Callable

import numpy as np

from . import oracle, spec
from .utils import reporting
from .utils.image import save_image
from .utils.timing import measure_time


@dataclass
class Operation:
    description: str
    prefix: str
    csv_column: str
    run: Callable[[], Any]          # one timed round; must sync the device
    fetch: Callable[[], np.ndarray]  # last result as uint8 HWC (untimed)


class BenchmarkRunner:
    """Runs an operations table with the reference timing/reporting protocol."""

    def __init__(self, operations: list[Operation], rounds: int = 10000):
        self.operations = operations
        self.rounds = rounds
        self.results: list[reporting.OpResult] = []

    def run(self, filename: str | None = None, outdir: str | None = None,
            verify_against: np.ndarray | None = None,
            quiet: bool = False) -> list[reporting.OpResult]:
        width = max(len(op.description) for op in self.operations)
        self.results = []
        failures: list[str] = []
        if verify_against is not None:
            # Prefer the native C++ oracle (bit-identical to oracle.py,
            # tested) — NumPy is too slow for per-run checks at 8 Mpx.
            from . import native
            ref_ops = (native.image_ops() if native.available()
                       else oracle.IMAGE_OPS)
        for op in self.operations:
            time_once, time_rounds = measure_time(op.run, self.rounds)
            result = reporting.OpResult(op.description, op.prefix,
                                        op.csv_column, time_once, time_rounds)
            self.results.append(result)
            if not quiet:
                print(reporting.format_row(result, self.rounds, width))
            if op.prefix:
                output = op.fetch()
                if outdir is not None and filename is not None:
                    save_image(os.path.join(outdir, f"{op.prefix}-{filename}"),
                               output)
                if verify_against is not None:
                    expected = ref_ops[op.csv_column](verify_against)
                    if not np.array_equal(output, expected):
                        diff = int(
                            np.sum(output.astype(np.int32) != expected))
                        failures.append(f"{op.csv_column}: {diff} px differ")
        if failures:
            raise AssertionError(
                "Output verification against oracle FAILED: "
                + "; ".join(failures))
        return self.results

    def write_csv(self, path: str, tool: str = "TPU") -> None:
        reporting.write_csv(path, tool, self.results)


def op_matrix_entry(csv_column: str) -> tuple[str, str, str]:
    for desc, prefix, col in spec.OPERATION_MATRIX:
        if col == csv_column:
            return desc, prefix, col
    raise KeyError(csv_column)
