"""AOT compilation and export: the production-serving warm path.

The benchmark contract keeps compile cost in each op's "once" column (like
every reference backend's JIT). Production serving wants the opposite:
compile everything ahead of time — and optionally persist the compiled
programs as serialized StableHLO (jax.export) so a serving process starts
without any tracing/compilation at all.

- warm(session): trace+compile every op of a session's table up front.
- export_ops / load_exported: serialize the ops of a session to a directory
  and call them back without the framework (only jax + the artifact).
"""

from __future__ import annotations

import os

import jax
import numpy as np


def warm(session) -> dict:
    """Compile all of a BenchmarkSession's device ops ahead of time.
    Returns {csv_column: jax.stages.Compiled}."""
    src = session._device_input()
    compiled = {}
    for col, fn in session._ops_impl.items():
        compiled[col] = fn.lower(src).compile()
    return compiled


def export_ops(session, outdir: str) -> list[str]:
    """Serialize every device op (StableHLO via jax.export) for the
    session's input shape. Returns written paths."""
    from jax import export as jax_export

    os.makedirs(outdir, exist_ok=True)
    src = session._device_input()
    spec = jax.ShapeDtypeStruct(src.shape, src.dtype)
    written = []
    for col, fn in session._ops_impl.items():
        exported = jax_export.export(fn)(spec)
        path = os.path.join(outdir, f"{col}.stablehlo")
        with open(path, "wb") as f:
            f.write(exported.serialize())
        written.append(path)
    return written


def load_exported(path: str):
    """Load a serialized op; returns a callable (device array -> array)."""
    from jax import export as jax_export

    with open(path, "rb") as f:
        exported = jax_export.deserialize(f.read())

    def call(x):
        return jax.jit(exported.call)(x)

    return call
