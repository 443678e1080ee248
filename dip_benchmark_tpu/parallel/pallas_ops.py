"""Sharded ops backed by the hand-written Pallas kernels.

parallel/ops.py lifts plain jnp/lax bodies over the mesh — the library-call
analogue. This module runs the P-path kernels themselves on the
PADDED-RESIDENT sharded model (round 3): every shard's block of the global
array IS its full padded local layout,

    shard block: [top halo (pad_y) | valid h_loc | bottom halo | slack]
                  ^ refreshed per application from the neighbor's valid
                    edge rows over ICI (lax.ppermute + update-slice), or
                    the global mirror rule on edge shards

so an application costs only the 2*pad_y halo-row strip refresh
(parallel/halo.refresh_resident_halo) plus the local column-halo
re-mirror (refresh_resident_cols; point ops skip both) plus the
UNMODIFIED single-device kernel — the kernels cannot tell a neighbor's
rows from refreshed mirror rows, so everything stays bit-exact, and
because the kernels are shape-preserving on the padded layout, sharded
ops compose bit-exactly at ARBITRARY depth (exec chains, fused chains)
with strip-sized upkeep per stage.
Assemble device buffers with utils.image.to_resident_planar; read back
with from_resident_planar. Measured on hardware: the distributed table
runs at single-device kernel cost, 2.3-4.6x over the round-2
assemble-per-call lift (docs/RESULTS_ROUND3.md §9, DESIGN.md §5).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, PartitionSpec as P

from ..utils.image import PlanarLayout, make_layout, round_up
from .halo import refresh_resident_cols, refresh_resident_halo


def _shard_layout(h_loc: int, width: int, halo: int | None = None,
                  what: str = "halo exchange",
                  itemsize: int = 1) -> PlanarLayout:
    """Per-shard layout. The band tracks the shard height (instead of the
    default 112) so windowed kernels don't compute up to a full band of
    discarded zero-padding rows per shard; and halo exchange needs at
    least pad_y + 1 valid rows per shard to build its mirror rows.
    halo overrides the default op halo (chains need their total radius);
    itemsize sizes the VMEM envelope check (4 for the f32 model)."""
    kw = {} if halo is None else {"halo": halo}
    layout = make_layout(h_loc, width,
                         band=min(112, round_up(max(h_loc, 1), 8)),
                         itemsize=itemsize, **kw)
    if h_loc < layout.pad_y + 1:
        raise ValueError(
            f"shards of {h_loc} rows are too small for {what} "
            f"(need >= {layout.pad_y + 1}); use fewer devices")
    return layout


def build_sharded_pallas_ops(mesh: Mesh, height: int, width: int,
                             axis: str = "space", dtype: str = "uint8"
                             ) -> tuple[dict, PlanarLayout]:
    """CSV-column-keyed jitted ops over the PADDED-RESIDENT sharded model:
    the global array is (C, n*Hp, Wp) with each shard's block its FULL
    padded local layout (assemble with utils.image.to_resident_planar).
    The mesh axis size must divide height. Returns the op dict and the
    per-shard layout (Hp/Wp = its padded_height/padded_width).

    Round-3 redesign: the previous lift assembled a fresh padded buffer
    per application (halo concat + jnp.pad + output re-slice — three
    whole-shard materializations, ~2.5x the kernel's own cost at fundus
    size). Resident buffers make an application exactly
    refresh_resident_halo (2*pad_y-row ICI strips, windowed ops only) +
    the unmodified shape-preserving kernel — measured 387 -> 152 us for
    erosion at 1 shard (benchmarks/tuning/sharded_resident_lab.py),
    bit-exact through chained applications. Point ops skip the refresh
    entirely: elementwise maps commute with the mirror/neighbor halo
    content, so their halo rows stay consistent by construction.

    dtype "uint8" (primary) or "float32": the CUDA.jl-parity planar [0,1]
    model runs the SAME scheme over ops/pallas/f32.py's kernels —
    ppermute/update-slice are dtype-generic."""
    from ..ops import pallas as pallas_ops

    n = mesh.shape[axis]
    assert height % n == 0, (
        f"the {n}-shard axis must divide height {height}")
    h_loc = height // n
    layout = _shard_layout(h_loc, width,
                           itemsize=4 if dtype == "float32" else 1)
    if dtype == "float32":
        local = pallas_ops.build_f32_ops(layout)
    elif dtype == "uint8":
        local = pallas_ops.build_ops(layout)
    else:
        raise ValueError(f"Unknown dtype: {dtype!r}")
    point_cols = set(pallas_ops.POINT_COLS)

    def lift(col):
        op = local[col]
        windowed = col not in point_cols

        def body(buf):  # buf: (C, Hp, Wp) resident local block
            if windowed:
                buf = refresh_resident_halo(buf, layout.pad_y, h_loc, axis)
                buf = refresh_resident_cols(buf, layout.pad_x, width)
            return op(buf)

        # check_vma=False: pallas_call's ShapeDtypeStruct outputs carry no
        # varying-mesh-axes annotation; the specs above state it explicitly.
        return jax.jit(jax.shard_map(
            body, mesh=mesh,
            in_specs=P(None, axis, None),
            out_specs=P(None, axis, None),
            check_vma=False))

    return {col: lift(col) for col in local}, layout


def sharded_pallas_chain(mesh: Mesh, cols: list[str], height: int,
                         width: int, axis: str = "space", batch: int = 0,
                         data_axis: str = "data", dtype: str = "uint8"):
    """A GENERIC fused op chain (models/chain.py) sharded over the mesh's
    `axis`: rows shard, `lax.ppermute` exchanges a halo sized to the
    CHAIN's total radius (not just one op's), and each shard runs the
    whole chain as ONE kernel — multi-chip scale-out of --fuse. Bit-exact
    vs the single-device chain: the exchanged halo rows are the
    neighbor's real rows, so every stage's halo outputs equal the
    neighbor's interior computation, and the global mirror rule applies
    only on edge shards (the models/chain.py induction argument).

    Input/output (batch=0): the PADDED-RESIDENT model — (C, n*Hp, Wp)
    with each shard's block its full padded local layout at the CHAIN's
    halo (assemble with to_resident_planar(planar, layout, n)); per
    application only the chain-radius halo strips travel
    (refresh_resident_halo), like build_sharded_pallas_ops. The mesh
    axis size must divide height and each shard must be taller than the
    chain radius.

    batch=B serves a (B, C, n*Hp, Wp) RESIDENT stack over the full 2-D
    (data, space) mesh — batch shards over `data_axis`, rows over `axis`,
    each image's row-shards stored as their padded local layouts
    (to_resident_planar on the stack); per application the halo strips
    refresh (vmapped over the local batch) and each shard runs the
    BATCHED chain kernel (make_fused_chain(batch=b_loc), leading batch
    grid axis) on its local stack: the chain analogue of
    sharded_pallas_pipeline, serving whole directories of images across
    chips in one dispatch per chunk.

    dtype "float32" shards the f32-model chain (make_fused_chain_f32) the
    same way — the exchanged halo rows are the neighbor's real f32 rows,
    so the single-device chain's halo-propagation argument carries over
    unchanged (ppermute/pad/slice are dtype-generic)."""
    from ..models.chain import (check_chain, make_fused_chain,
                                make_fused_chain_f32)

    if dtype == "float32":
        def make(layout_, cols_, batch_=0):
            return make_fused_chain_f32(layout_, cols_, batch=batch_)
    elif dtype == "uint8":
        def make(layout_, cols_, batch_=0):
            return make_fused_chain(layout_, cols_, batch=batch_)
    else:
        raise ValueError(f"Unknown dtype: {dtype!r}")

    n = mesh.shape[axis]
    assert height % n == 0, (
        f"the {n}-shard axis must divide height {height}")
    h_loc = height // n
    ry, rx = check_chain(cols)
    halo = max(2, ry, rx)
    layout = _shard_layout(h_loc, width, halo=halo,
                           what=f"a radius-{halo} chain's halo exchange",
                           itemsize=4 if dtype == "float32" else 1)
    windowed = ry > 0  # point-only chains need no ICI halo (cf. lift())

    if batch:
        n_data = mesh.shape[data_axis]
        assert batch % n_data == 0, (
            f"the {n_data}-shard data axis must divide batch {batch}")
        b_loc = batch // n_data
        op = make(layout, cols, b_loc)

        def body_b(x):  # (b_loc, C, Hp, Wp) resident local stack
            if windowed:
                x = jax.vmap(lambda im: refresh_resident_halo(
                    im, layout.pad_y, h_loc, axis))(x)
                x = refresh_resident_cols(x, layout.pad_x, width)
            return op(x)

        fn = jax.jit(jax.shard_map(
            body_b, mesh=mesh,
            in_specs=P(data_axis, None, axis, None),
            out_specs=P(data_axis, None, axis, None),
            check_vma=False))
        return fn, layout

    op = make(layout, cols)

    def body(buf):  # buf: (C, Hp, Wp) resident local block
        if windowed:
            buf = refresh_resident_halo(buf, layout.pad_y, h_loc, axis)
            buf = refresh_resident_cols(buf, layout.pad_x, width)
        return op(buf)

    fn = jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=P(None, axis, None),
        out_specs=P(None, axis, None),
        check_vma=False))
    return fn, layout


def sharded_pallas_pipeline(mesh: Mesh, batch: int, height: int, width: int,
                            data_axis: str = "data",
                            space_axis: str = "space"):
    """The flagship fused pipeline on a 2-D (data, space) mesh with the
    Pallas kernel: batch shards over `data_axis`, rows over `space_axis`,
    and each shard runs the natively BATCHED pipeline kernel
    (models.pipeline batch= grid dim) on its local RESIDENT stack —
    (B, C, n*Hp, Wp) with to_resident_planar-assembled blocks, halo
    strips refreshed per application (vmapped refresh_resident_halo),
    like the batched sharded chain. Returns (apply_fn, per-shard
    layout)."""
    from ..models.pipeline import make_fused_pipeline_pallas

    n_space = mesh.shape[space_axis]
    n_data = mesh.shape[data_axis]
    assert height % n_space == 0 and batch % n_data == 0
    h_loc = height // n_space
    b_loc = batch // n_data
    layout = _shard_layout(h_loc, width)
    op = make_fused_pipeline_pallas(layout, batch=b_loc)

    def body(x):  # (b_loc, C, Hp, Wp) resident local stack
        xh = jax.vmap(lambda im: refresh_resident_halo(
            im, layout.pad_y, h_loc, space_axis))(x)
        xh = refresh_resident_cols(xh, layout.pad_x, width)
        return op(xh)

    fn = jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=P(data_axis, None, space_axis, None),
        out_specs=P(data_axis, None, space_axis, None),
        check_vma=False))
    return fn, layout
