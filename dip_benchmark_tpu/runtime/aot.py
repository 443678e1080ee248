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


def _table(session):
    """(ops_dict, device_src) for any session flavor: the single-device
    BenchmarkSession keeps its jitted ops in `_ops_impl` with the input from
    `_device_input()`; the ShardedBenchmarkSession keeps its shard_map
    programs in `_ops` operating on the resident `planar_dev` buffer; the
    WideBenchmarkSession keeps its strip-list ops in `_ops` over the
    resident `strips_dev` list (the ops take the list as ONE pytree
    argument, so lower/compile/export apply unchanged)."""
    if hasattr(session, "_ops_impl"):
        return session._ops_impl, session._device_input()
    if hasattr(session, "_ops"):
        if hasattr(session, "planar_dev"):
            return session._ops, session.planar_dev
        if hasattr(session, "strips_dev"):
            return session._ops, session.strips_dev
    raise TypeError(
        f"unsupported session type for AOT warm/export: "
        f"{type(session).__name__} (want BenchmarkSession, "
        f"ShardedBenchmarkSession, WideBenchmarkSession, or "
        f"ShardedWideBenchmarkSession)")


def warm(session) -> dict:
    """Compile all of a session's device ops ahead of time — works for both
    the single-device session and the sharded session (the shard_map
    programs are jitted, so `.lower().compile()` applies unchanged; the
    compile captures the mesh + sharding of the resident buffer).
    Returns {csv_column: jax.stages.Compiled}. The executables are also
    SEEDED into the session's AotOp cache (session.aot_wrap), so the
    benchmark table's first timed call dispatches them directly instead
    of re-lowering and re-compiling what was just built."""
    from ..session import AotOp
    ops, src = _table(session)
    cache = getattr(session, "_aot_ops", None)
    if cache is None:
        cache = session._aot_ops = {}
    compiled = {}
    for col, fn in ops.items():
        compiled[col] = fn.lower(src).compile()
        warmed = AotOp(fn)
        warmed._compiled = compiled[col]
        cache[id(fn)] = warmed
    return compiled


def export_ops(session, outdir: str) -> list[str]:
    """Serialize every device op (StableHLO via jax.export) for the
    session's input shape. For a sharded session the input spec carries the
    mesh sharding, so the artifact embeds the SPMD partitioning and replays
    on any same-size mesh. Returns written paths."""
    from jax import export as jax_export

    os.makedirs(outdir, exist_ok=True)
    ops, src = _table(session)

    def _leaf_spec(x):
        if hasattr(x, "sharding") and getattr(x.sharding, "mesh", None):
            return jax.ShapeDtypeStruct(x.shape, x.dtype,
                                        sharding=x.sharding)
        return jax.ShapeDtypeStruct(x.shape, x.dtype)

    # src may be one array or a pytree (the wide session's strip list).
    spec = jax.tree.map(_leaf_spec, src)
    written = []
    for col, fn in ops.items():
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

    # Hoisted: one jit wrapper for the callable's lifetime. Wrapping per
    # call would hand every invocation a fresh (empty-cache) wrapper and
    # retrace each request — the opposite of what this module is for.
    return jax.jit(exported.call)
