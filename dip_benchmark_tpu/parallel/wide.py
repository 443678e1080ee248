"""2-D spatial scaling: column strips PER ROW SHARD (wide x sharded).

Round 3 scaled HEIGHT across devices (the padded-resident row shards of
parallel/pallas_ops.py); round 4 scaled WIDTH within one device (the
column-strip resident model of models/wide.py). This module composes the
two, closing the round-4 verdict's open seam: a beyond-envelope width now
also row-scales across a mesh.

Data model: the global image is N column strips; strip i is stored as the
row-sharded PADDED-RESIDENT buffer (C, n*Hp, Wp_i), sharded
P(None, axis, None) — each device's block of each strip is a bog-standard
per-shard `PlanarLayout` buffer, so the UNMODIFIED single-device Pallas
kernels run per strip at the strip plan's full band. The two refresh
primitives compose orthogonally per windowed application, inside one
shard_map:

  1. rows:    `refresh_resident_halo` per strip — the 2*pad_y halo-row
              strips travel over ICI (lax.ppermute), exactly as in the
              single-strip sharded model (each strip's columns exchange
              with the SAME columns of the vertical neighbor);
  2. columns: `models.wide.refresh_cols` across the shard's local strip
              blocks — strips of one row-shard live on the SAME device,
              so the seam copies are local lane-dim update-slices, no
              collective (the rank-agnostic wide rule applied to the
              (C, Hp, Wp_i) local blocks).

Rows-then-columns ordering gives exact corners: the column copy reads the
horizontal neighbor's valid columns over the full padded height, whose
row-pad rows already hold the vertical neighbor's (or the global mirror's)
values — the same argument that makes each constituent model bit-exact at
arbitrary composition depth carries over unchanged (tests/test_wide.py).

[reference: the benchmark never shards nor exceeds 3504x2336 — this is
the 2-D spatial-scaling extension SURVEY.md §5 leaves as the framework's
seam, composed from the round-3 and round-4 primitives.]
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, PartitionSpec as P

from .. import spec
from ..models import wide as wide_mod
from ..models.wide import WideLayout
from ..utils import image as image_mod
from .halo import refresh_resident_halo


def make_sharded_wide_plan(height: int, width: int, n: int,
                           channels: int = 3,
                           halo: int = image_mod.DEFAULT_HALO,
                           strip_width: int | None = None,
                           itemsize: int = 1) -> WideLayout:
    """The strip plan for an n-row-shard, beyond-envelope-width image:
    a per-SHARD `WideLayout` (wl.height = the local shard height). height
    must divide n, and shards must carry at least halo + 1 valid rows
    (the row refresh builds mirror rows from the valid interior, like
    parallel/pallas_ops._shard_layout)."""
    if height % n:
        raise ValueError(f"{n} row shards must divide height {height}")
    h_loc = height // n
    wl = wide_mod.make_wide_layout(h_loc, width, channels, halo=halo,
                                   strip_width=strip_width,
                                   itemsize=itemsize)
    if h_loc < wl.halo + 1:
        raise ValueError(
            f"shards of {h_loc} rows are too small for the row-halo "
            f"refresh (need >= {wl.halo + 1}); use fewer devices")
    return wl


def to_sharded_wide_resident(image: np.ndarray, wl: WideLayout,
                             n: int) -> list[np.ndarray]:
    """uint8 HWC -> list of (C, n*Hp, Wp_i) strip buffers: per strip, the
    row-sharded padded-resident stack (block j = shard j's full padded
    local layout — halo rows from the vertical neighbor / global mirror),
    with columns indexed by the GLOBAL wide rule (interior seams hold
    true neighbor columns, outer edges the spec mirror). Exact from the
    first application, like both constituent bakes."""
    h, w, c = image.shape
    assert (w, c) == (wl.width, wl.channels) and h == n * wl.height
    planar = np.transpose(image, (2, 0, 1))  # (C, H, W)
    strips = []
    for i, lo in enumerate(wl.layouts):
        hp = lo.padded_height
        xs = np.clip(spec.mirror_index(
            wl.col0(i) + np.arange(lo.padded_width) - lo.pad_x, w), 0, w - 1)
        blocks = []
        for j in range(n):
            ys = np.clip(spec.mirror_index(
                j * wl.height + np.arange(hp) - lo.pad_y, h), 0, h - 1)
            blocks.append(planar[:, ys[:, None], xs[None, :]])
        strips.append(np.ascontiguousarray(np.concatenate(blocks, axis=1)))
    return strips


def from_sharded_wide_resident(strips, wl: WideLayout, n: int) -> np.ndarray:
    """List of (C, n*Hp, Wp_i) strip buffers -> uint8 HWC: per strip,
    extract each shard block's valid rows (utils.image.from_resident_planar),
    then concatenate the strips' valid columns."""
    parts = [image_mod.from_resident_planar(np.asarray(s), lo, n, wl.height)
             for s, lo in zip(strips, wl.layouts)]
    return np.ascontiguousarray(
        np.transpose(np.concatenate(parts, axis=-1), (1, 2, 0)))


def to_sharded_wide_resident_f32(image: np.ndarray, wl: WideLayout,
                                 n: int) -> list[np.ndarray]:
    """uint8 HWC -> f32 [0,1] sharded-wide strip buffers (exact: u8/255
    commutes with all the bake indexing)."""
    return [s.astype(np.float32) / np.float32(255)
            for s in to_sharded_wide_resident(image, wl, n)]


def from_sharded_wide_resident_f32(strips, wl: WideLayout,
                                   n: int) -> np.ndarray:
    """f32 strip buffers -> (C, H, W) f32 planar (the f32 model's native
    shape)."""
    parts = [image_mod.from_resident_planar(np.asarray(s), lo, n, wl.height)
             for s, lo in zip(strips, wl.layouts)]
    return np.ascontiguousarray(np.concatenate(parts, axis=-1))


def put_sharded_wide(strips, mesh: Mesh, axis: str = "space"):
    """Host strip list -> device-resident, each strip row-sharded over
    the mesh axis."""
    from jax.sharding import NamedSharding
    sh = NamedSharding(mesh, P(None, axis, None))
    return [jax.device_put(s, sh) for s in strips]


def build_sharded_wide_ops(mesh: Mesh, height: int, width: int,
                           channels: int = 3, axis: str = "space",
                           dtype: str = "uint8",
                           strip_width: int | None = None
                           ) -> tuple[dict, WideLayout]:
    """CSV-column-keyed jitted ops over the sharded-wide model. Each op
    takes and returns the strip LIST (one shard_map over the whole list,
    so the row refreshes of all strips share one program); kernels build
    once per DISTINCT strip layout. Windowed ops refresh rows (ICI) then
    columns (local) first; point ops skip both (elementwise maps commute
    with halo content on both axes). Returns (ops, per-shard plan)."""
    from ..ops import pallas as pallas_ops

    n = mesh.shape[axis]
    if dtype == "float32":
        itemsize, builder = 4, pallas_ops.build_f32_ops
    elif dtype == "uint8":
        itemsize, builder = 1, pallas_ops.build_ops
    else:
        raise ValueError(f"Unknown dtype: {dtype!r}")
    wl = make_sharded_wide_plan(height, width, n, channels=channels,
                                strip_width=strip_width, itemsize=itemsize)
    per_layout: dict = {}
    for lo in wl.layouts:
        if lo not in per_layout:
            per_layout[lo] = builder(lo)
    h_loc = wl.height

    def lift(col):
        windowed = col in wide_mod.WINDOWED_COLS

        def body(strips):  # list of (C, Hp, Wp_i) local blocks
            if windowed:
                strips = [refresh_resident_halo(s, lo.pad_y, h_loc, axis)
                          for s, lo in zip(strips, wl.layouts)]
                strips = wide_mod.refresh_cols(list(strips), wl)
            return [per_layout[lo][col](s)
                    for s, lo in zip(strips, wl.layouts)]

        # check_vma=False: pallas_call outputs carry no varying-mesh-axes
        # annotation (same note as parallel/pallas_ops.build_sharded_pallas_ops)
        return jax.jit(jax.shard_map(
            body, mesh=mesh,
            in_specs=P(None, axis, None),
            out_specs=P(None, axis, None),
            check_vma=False))

    return {col: lift(col) for col in wide_mod.WIDE_COLS}, wl
