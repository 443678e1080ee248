#!/usr/bin/env python3
"""Sharded-lift assembly cost lab (round 3).

The ROUND-2 sharded Pallas lift assembled a fresh local padded buffer
per application: concat ICI/mirror halo rows + jnp.pad to padded_height,
run the kernel, re-slice valid rows. Measured on fundus at 1 shard that
cost ~230-270 us/op over the bare kernel
(runs at 335-472 us vs the kernels' 107-200 — docs/RESULTS_ROUND3.md §9):
by the X-path cost law each materialized whole-shard pass is ~2
traversals.

Candidate: PADDED-RESIDENT ops — the sharded global array stores each
shard's FULL padded local layout (C, Hp, Wp); an application updates only
the 2*pad_y halo rows (ppermute of neighbor valid-edge rows +
dynamic_update_slice) and runs the shape-preserving kernel directly. Per
application: two small row-strip copies instead of two whole-shard
materializations. This keeps composability (chains re-exchange the halo
of the PREVIOUS output every iteration, same semantics as the shipped
lift).

This lab measures, on the real TPU at 1 shard (fundus size), the
chained-K marginal of:
  A  the ROUND-2 lift (concat + pad + kernel + slice), reconstructed
     inline — the shipped build_sharded_pallas_ops has since moved to
     the resident model this lab motivated
  B  padded-resident (DUS halo rows + kernel)
  C  bare kernel (no halo logic at all — the floor)
and bit-checks B == A on the valid rows after each application count.
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

from dip_benchmark_tpu.ops import pallas as pallas_ops  # noqa: E402
from dip_benchmark_tpu.parallel.halo import (  # noqa: E402
    exchange_row_halo, make_mesh)
from dip_benchmark_tpu.parallel.pallas_ops import _shard_layout  # noqa: E402
from dip_benchmark_tpu.runtime.cache import enable_compilation_cache  # noqa: E402
from dip_benchmark_tpu.utils.image import bake_mirror_cols  # noqa: E402
from dip_benchmark_tpu.utils.image import load_image  # noqa: E402

FUNDUS = "/root/reference/assets/fundus.jpg"
K1, K2 = int(os.environ.get("K1", "20")), int(os.environ.get("K2", "100"))
COL = os.environ.get("COL", "Erosion-3x3-Square")


def main() -> int:
    enable_compilation_cache()
    if os.path.exists(FUNDUS):
        image = load_image(FUNDUS)
    else:
        rng = np.random.default_rng(0)
        image = rng.integers(0, 256, size=(2336, 3504, 3), dtype=np.uint8)
    h, w, _ = image.shape
    mesh = make_mesh(n_space=1)
    planar = np.transpose(image, (2, 0, 1))

    # A: the round-2 assemble-per-call lift, reconstructed INLINE (the
    # shipped build_sharded_pallas_ops has since MOVED to the resident
    # model this lab motivated, so the historical baseline is kept here
    # for reproducibility): halo concat + pad to padded_height + kernel +
    # valid-row re-slice per application, on a (C, H, Wp) global array.
    lay = _shard_layout(h, w)
    hp = lay.padded_height
    local_a = pallas_ops.build_ops(lay)[COL]

    def old_lift_body(x):  # (C, h_loc, Wp) unpadded shard
        xh = exchange_row_halo(x, lay.pad_y)
        buf = jnp.pad(xh, ((0, 0), (0, hp - xh.shape[1]), (0, 0)))
        out = local_a(buf)
        return out[:, lay.pad_y:lay.pad_y + x.shape[1]]

    op_a = jax.jit(jax.shard_map(
        old_lift_body, mesh=mesh, in_specs=P(None, "space", None),
        out_specs=P(None, "space", None), check_vma=False))
    xa = jax.device_put(bake_mirror_cols(planar, lay),
                        NamedSharding(mesh, P(None, "space", None)))

    # B: padded-resident — per-shard (C, Hp, Wp), halo rows refreshed by
    # DUS from the buffer's own valid rows (1-shard: the mirror rule).
    # The kernel is the plain single-device one; shape-preserving, so the
    # output IS the next padded buffer.
    local = pallas_ops.build_ops(lay)[COL]
    py = lay.pad_y

    def attach_halo(buf):
        # 1-shard edge rule: top halo = mirror of first valid rows,
        # bottom halo = mirror of last valid rows (spec.mirror_index).
        top = jnp.flip(buf[:, py + 1:py + 1 + py], axis=1)
        bot = jnp.flip(buf[:, py + h - py:py + h], axis=1)
        buf = lax.dynamic_update_slice(buf, top, (0, 0, 0))
        return lax.dynamic_update_slice(buf, bot, (0, py + h, 0))

    def op_b(buf):
        return local(attach_halo(buf))

    from dip_benchmark_tpu.utils.image import to_planar_padded
    xb = jax.device_put(to_planar_padded(image, lay))

    # C: bare kernel
    op_c = local

    def chained(op, x, k):
        return jax.jit(lambda v: lax.fori_loop(
            0, k, lambda i, u: op(u), v)).lower(x).compile(), x

    def t_sync(fn, x, n=5):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            y = fn(x)
            np.asarray(y.ravel()[0])
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    # bit-check: B's valid rows == A's valid rows after 1 and 3 apps
    for napp in (1, 3):
        va = np.asarray(jax.jit(lambda v: lax.fori_loop(
            0, napp, lambda i, u: op_a(u), v))(xa))[:, :h,
                                                    lay.pad_x:lay.pad_x + w]
        vb = np.asarray(jax.jit(lambda v: lax.fori_loop(
            0, napp, lambda i, u: op_b(u), v))(xb))[
            :, py:py + h, lay.pad_x:lay.pad_x + w]
        same = np.array_equal(va, vb)
        print(f"  bit-check after {napp} applications: "
              f"{'OK' if same else 'MISMATCH'}", flush=True)

    for name, op, x in (("A round-2 lift", op_a, xa),
                        ("B padded-resident", op_b, xb),
                        ("C bare kernel", op_c, xb)):
        (f1, _), (f2, _) = chained(op, x, K1), chained(op, x, K2)
        t1, t2 = t_sync(f1, x), t_sync(f2, x)
        te = (t2 - t1) / (K2 - K1)
        print(f"  {name:20s} exec {te * 1e6:7.1f} us/app  [{COL}]",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
