"""Sharded ops backed by the hand-written Pallas kernels.

parallel/ops.py lifts plain jnp/lax bodies over the mesh — the library-call
analogue. This module lifts the P-path kernels themselves: rows shard over
the mesh's space axis, `lax.ppermute` exchanges halo rows over ICI
(parallel/halo.py), and each shard assembles a LOCAL planar padded buffer
(the same layout the single-device kernels run on) with the received halo
occupying the mirror-pad rows — the kernels cannot tell a neighbor's rows
from baked mirror rows, so they run unmodified and stay bit-exact:

    shard rows:  [top halo (pad_y) | valid h_loc | bottom halo | zero slack]
                  ^ from prev dev / global mirror on the edge shard

Data model: the global device array is (C, H, Wp) uint8 — columns mirror-
padded and lane-aligned exactly like the single-device planar layout, rows
UNPADDED and sharded evenly (pad_y rows of halo travel over ICI instead of
living in HBM). Assembly is a bottom-only jnp.pad (row 0 stays tile-aligned;
an unaligned row offset would cost a whole-array sublane shuffle,
docs/DESIGN.md §4.4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..utils.image import PlanarLayout, make_layout
from .halo import exchange_row_halo


def build_sharded_pallas_ops(mesh: Mesh, height: int, width: int,
                             axis: str = "space") -> tuple[dict, PlanarLayout]:
    """CSV-column-keyed jitted ops over (C, height, Wp) uint8 arrays row-
    sharded on `axis`. height must divide the axis size. Returns the op
    dict and the per-shard layout (whose padded_width defines Wp)."""
    from ..ops import pallas as pallas_ops

    n = mesh.shape[axis]
    assert height % n == 0, f"height {height} must divide {n} shards"
    h_loc = height // n
    layout = make_layout(h_loc, width)
    local = pallas_ops.build_ops(layout)
    hp = layout.padded_height
    point_cols = set(pallas_ops.POINT_COLS)

    def lift(col):
        op = local[col]
        windowed = col not in point_cols

        def body(x):  # x: (C, h_loc, Wp) local shard
            if windowed:
                x = exchange_row_halo(x, layout.pad_y, axis)
            buf = jnp.pad(x, ((0, 0), (0, hp - x.shape[1]), (0, 0)))
            out = op(buf)
            # windowed outputs put valid row 0 at row 0 (the kernels' crop
            # contract); point outputs are elementwise so rows align too.
            return out[:, :h_loc]

        # check_vma=False: pallas_call's ShapeDtypeStruct outputs carry no
        # varying-mesh-axes annotation; the specs above state it explicitly.
        return jax.jit(jax.shard_map(
            body, mesh=mesh,
            in_specs=P(None, axis, None),
            out_specs=P(None, axis, None),
            check_vma=False))

    return {col: lift(col) for col in local}, layout
