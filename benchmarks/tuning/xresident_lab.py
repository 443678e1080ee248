#!/usr/bin/env python3
"""Resident X-path lab (round 4, VERDICT #4).

The shipped sharded X-path (parallel/ops.py) deliberately keeps the
concat-per-application lift: exchange_row_halo concatenates halo rows onto
the shard, _mirror_cols concatenates halo columns, the op slices valid
output back out — three whole-shard materializations per application, the
same pattern whose ~2.5x cost over the bare kernel motivated the P-path's
round-3 padded-resident redesign (sharded_resident_lab.py). The question
this lab answers with numbers: would a PADDED-RESIDENT X-path variant be
faster too, or does XLA's fusion already hide the lift?

Candidates, chained-K marginal at 1 shard on the real TPU (fundus size),
all inside shard_map on a (space=1,) mesh so collective/edge code paths
match the shipped ops:

  A  shipped lift      build_sharded_ops body: halo-row concat +
                       mirror-col concat + slice per application
  B  resident-roll     (C, Hp, Wp) padded-resident buffer; per app:
                       refresh_resident_halo + refresh_resident_cols
                       (strip DUS from the buffer's own rows at 1 shard),
                       then FULLY shape-preserving compute — every tap is
                       a 2-D jnp.roll of the whole buffer, garbage lands
                       in the halo ring and is re-refreshed next app.
                       Zero whole-buffer concats, zero output re-slices.
  C  resident-DUS      same refresh; compute VALID rows only from row
                       slices (full Wp width via lane rolls), write back
                       with one dynamic_update_slice at row pad_y
                       (sublane-unaligned — its real cost is part of what
                       this lab prices).
  D  bare local body   the lift's compute without any halo logic — the
                       floor both residents chase.

Bit-checks: B and C valid regions equal A's output after 1 and 3 chained
applications (the resident refresh must reproduce the lift's re-mirroring
semantics exactly).

Results land in docs/DESIGN.md §5 and decide whether parallel/ops.py grows
a resident variant or records the measured justification for the lift.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from dip_benchmark_tpu import spec  # noqa: E402
from dip_benchmark_tpu.parallel.halo import (  # noqa: E402
    make_mesh, refresh_resident_cols, refresh_resident_halo)
from dip_benchmark_tpu.parallel.ops import (  # noqa: E402
    build_sharded_ops)
from dip_benchmark_tpu.runtime.cache import enable_compilation_cache  # noqa: E402
from dip_benchmark_tpu.utils.image import (  # noqa: E402
    make_layout, to_planar_padded)
from dip_benchmark_tpu.utils.testimage import resolve_image  # noqa: E402

K1 = int(os.environ.get("K1", "20"))
K2 = int(os.environ.get("K2", "100"))
COLS = os.environ.get("COLS", "Erosion-3x3-Square,Convolution-5x5,"
                             "Gaussian-Blur-3x3").split(",")


def _roll2(buf, dy, dx):
    return jnp.roll(buf, (-dy, -dx), axis=(1, 2))


def _erode_roll(buf, kh, kw):
    """Shape-preserving min over kh x kw: separable rolls (rows then
    cols), same tap count as the lift's slice formulation."""
    rows = None
    for dy in range(-(kh // 2), kh // 2 + 1):
        t = jnp.roll(buf, -dy, axis=1)
        rows = t if rows is None else jnp.minimum(rows, t)
    acc = None
    for dx in range(-(kw // 2), kw // 2 + 1):
        t = jnp.roll(rows, -dx, axis=2)
        acc = t if acc is None else jnp.minimum(acc, t)
    return acc


def _conv_roll(buf, int_mask, shift):
    """Shape-preserving integer-exact correlation via 2-D rolls."""
    kh, kw = int_mask.shape
    x = buf.astype(jnp.int32)
    acc = None
    for ky in range(kh):
        for kx in range(kw):
            t = int(int_mask[ky, kx]) * _roll2(x, ky - kh // 2,
                                               kx - kw // 2)
            acc = t if acc is None else acc + t
    half = 1 << (shift - 1)
    return jnp.clip((acc + half) >> shift, 0, 255).astype(jnp.uint8)


def _erode_rows_valid(buf, py, h, kh, kw):
    """Valid rows only (row slices at full Wp width, lane-roll cols)."""
    c, hp, wp = buf.shape
    rows = None
    for dy in range(-(kh // 2), kh // 2 + 1):
        t = lax.slice(buf, (0, py + dy, 0), (c, py + dy + h, wp))
        rows = t if rows is None else jnp.minimum(rows, t)
    acc = None
    for dx in range(-(kw // 2), kw // 2 + 1):
        t = jnp.roll(rows, -dx, axis=2)
        acc = t if acc is None else jnp.minimum(acc, t)
    return acc


def _conv_rows_valid(buf, py, h, int_mask, shift):
    c, hp, wp = buf.shape
    kh, kw = int_mask.shape
    acc = None
    for ky in range(kh):
        base = lax.slice(buf, (0, py + ky - kh // 2, 0),
                         (c, py + ky - kh // 2 + h, wp)).astype(jnp.int32)
        for kx in range(kw):
            t = int(int_mask[ky, kx]) * jnp.roll(base, -(kx - kw // 2),
                                                 axis=2)
            acc = t if acc is None else acc + t
    half = 1 << (shift - 1)
    return jnp.clip((acc + half) >> shift, 0, 255).astype(jnp.uint8)


_MASKS = {
    "Convolution-5x5": (spec.BLUR_5X5_INT, spec.BLUR_5X5_SHIFT),
    "Convolution-3x3": (spec.BLUR_3X3_INT, spec.BLUR_3X3_SHIFT),
    "Gaussian-Blur-3x3": (spec.BLUR_3X3_INT, spec.BLUR_3X3_SHIFT),
}


def bodies_for(col, layout, h):
    """(roll_body, dus_body, bare_body) for one CSV column."""
    py, px, w = layout.pad_y, layout.pad_x, layout.width

    if col.startswith("Erosion"):
        kh = kw = 3  # square; lab covers the windowed shape class

        def compute_roll(buf):
            return _erode_roll(buf, kh, kw)

        def compute_valid(buf):
            return _erode_rows_valid(buf, py, h, kh, kw)
    else:
        mask, shift = _MASKS[col]

        def compute_roll(buf):
            return _conv_roll(buf, mask, shift)

        def compute_valid(buf):
            return _conv_rows_valid(buf, py, h, mask, shift)

    def refresh(buf):
        buf = refresh_resident_halo(buf, py, h)
        return refresh_resident_cols(buf, px, w)

    def roll_body(buf):
        return compute_roll(refresh(buf))

    def dus_body(buf):
        buf = refresh(buf)
        return lax.dynamic_update_slice(buf, compute_valid(buf),
                                        (0, py, 0))

    def bare_body(buf):  # floor: compute only, halos assumed fresh
        return compute_roll(buf)

    return roll_body, dus_body, bare_body


def main() -> int:
    enable_compilation_cache()
    image, src = resolve_image()
    h, w, _ = image.shape
    print(f"image {h}x{w} ({src}); K1={K1} K2={K2}", flush=True)
    mesh = make_mesh(n_space=1)
    sharding = NamedSharding(mesh, P(None, "space", None))
    layout = make_layout(h, w)
    py, px = layout.pad_y, layout.pad_x

    planar = np.transpose(image, (2, 0, 1))
    xa = jax.device_put(np.ascontiguousarray(planar), sharding)
    xr = jax.device_put(to_planar_padded(image, layout), sharding)

    shipped = build_sharded_ops(mesh)

    def lift_sm(body):
        return jax.jit(jax.shard_map(body, mesh=mesh,
                                     in_specs=P(None, "space", None),
                                     out_specs=P(None, "space", None),
                                     check_vma=False))

    def chained(op, x, k):
        return jax.jit(lambda v: lax.fori_loop(
            0, k, lambda i, u: op(u), v)).lower(x).compile()

    def t_sync(fn, x, n=5):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            y = fn(x)
            np.asarray(y.ravel()[0])
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    for col in COLS:
        roll_body, dus_body, bare_body = bodies_for(col, layout, h)
        op_a = shipped[col]
        op_b, op_c, op_d = (lift_sm(b) for b in (roll_body, dus_body,
                                                 bare_body))

        # bit-checks: valid region of B/C == A after 1 and 3 applications
        for napp in (1, 3):
            va = np.asarray(jax.jit(lambda v: lax.fori_loop(
                0, napp, lambda i, u: op_a(u), v))(xa))
            for name, op in (("B", op_b), ("C", op_c)):
                vr = np.asarray(jax.jit(lambda v, op=op: lax.fori_loop(
                    0, napp, lambda i, u: op(u), v))(xr))[
                    :, py:py + h, px:px + w]
                ok = np.array_equal(va, vr)
                print(f"  [{col}] {name} bit-check after {napp} app(s): "
                      f"{'OK' if ok else 'MISMATCH'}", flush=True)

        for name, op, x in (("A shipped lift ", op_a, xa),
                            ("B resident-roll", op_b, xr),
                            ("C resident-DUS ", op_c, xr),
                            ("D bare compute ", op_d, xr)):
            f1, f2 = chained(op, x, K1), chained(op, x, K2)
            t1, t2 = t_sync(f1, x), t_sync(f2, x)
            te = (t2 - t1) / (K2 - K1)
            print(f"  [{col}] {name} exec {te * 1e6:7.1f} us/app",
                  flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
