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
    # Check BEFORE building the layout: make_wide_layout's own min-dims
    # guard fires first otherwise, hiding the actionable remedy.
    if h_loc < halo + 1:
        raise ValueError(
            f"shards of {h_loc} rows are too small for the row-halo "
            f"refresh (need >= {halo + 1}); use fewer devices")
    return wide_mod.make_wide_layout(h_loc, width, channels, halo=halo,
                                     strip_width=strip_width,
                                     itemsize=itemsize)


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
    per_layout = wide_mod.kernels_per_layout(wl, builder)
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


def sharded_wide_chain(mesh: Mesh, wl: WideLayout, cols: tuple[str, ...],
                       axis: str = "space"):
    """The --fuse row over the sharded-wide model: the whole chain as ONE
    fused Pallas kernel per strip per shard, with one rows-then-columns
    seam refresh per chain application. Requires wl.halo >= the chain's
    total radius (the fused kernel consumes radius-deep taps in one
    application; build the plan with make_sharded_wide_plan(halo=r)) —
    then applications compose bit-exactly at arbitrary depth by the same
    two-axis induction as build_sharded_wide_ops' windowed lift."""
    from ..models import chain as chain_model

    ry, rx = chain_model.check_chain(list(cols))
    if max(ry, rx) > wl.halo:
        raise ValueError(
            f"chain radius (ry={ry}, rx={rx}) exceeds the strip halo "
            f"({wl.halo}); build the plan with make_sharded_wide_plan("
            f"halo={max(ry, rx)})")
    make = (chain_model.make_fused_chain_f32 if wl.itemsize == 4
            else chain_model.make_fused_chain)
    per_layout = wide_mod.kernels_per_layout(
        wl, lambda lo: make(lo, list(cols)))
    h_loc = wl.height

    def body(strips):
        strips = [refresh_resident_halo(s, lo.pad_y, h_loc, axis)
                  for s, lo in zip(strips, wl.layouts)]
        strips = wide_mod.refresh_cols(list(strips), wl)
        return [per_layout[lo](s) for s, lo in zip(strips, wl.layouts)]

    return jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=P(None, axis, None),
        out_specs=P(None, axis, None), check_vma=False))


class ShardedWideBenchmarkSession(wide_mod.WideBenchmarkSession):
    """The benchmark op table over the sharded-wide model: beyond-envelope
    widths under --shards (cli.py routes here when both apply). Same 14-op
    contract as every other session: Upload scatters the f32/uint8 planar
    payload over the mesh rows, device ops run the strips-per-shard
    shard_map programs (row halos over ICI, column seams local), Download
    gathers; --verify reassembles via from_sharded_wide_resident. Knob
    parity follows from the shared surfaces: --warm (aot._table sees
    _ops + strips_dev like the wide session), --chained / --exec (the
    fori_loop carries the strip pytree through the shard_map programs),
    --fuse (sharded_wide_chain, re-planned at the chain's halo when its
    radius exceeds the default).

    Heights that don't divide the shard count get high-side mirror rows
    (pad >= 2 so windowed taps past the valid edge read true mirror
    values — the ShardedBenchmarkSession rule), cropped on fetch.

    [reference: no counterpart — the 2-D spatial-scaling seam SURVEY.md
    §5 leaves to the framework, now a full benchmark surface.]
    """

    def __init__(self, host_image: np.ndarray, n_devices: int | None = None,
                 mesh: Mesh | None = None, dtype: str = "uint8",
                 strip_width: int | None = None):
        image_mod.check_uint8_hwc(host_image)
        if min(host_image.shape[:2]) < 5:
            # Same minimum-size contract as WideBenchmarkSession.
            raise ValueError("image must be at least 5x5")
        if dtype not in ("uint8", "float32"):
            raise ValueError(f"Unknown dtype: {dtype!r}")
        from jax.sharding import NamedSharding

        from .halo import make_mesh
        self.host_image = np.ascontiguousarray(host_image)
        self.path = "pallas"
        self.dtype = dtype
        self.device = None  # scratch transfers use the default device
        self._extra_oracles: dict = {}
        self._chain_exec: tuple | None = None
        self._sample = None
        self._chunked_dl = None
        self.mesh = mesh or make_mesh(n_space=n_devices
                                      or len(jax.devices()))
        n = self.n_shards = self.mesh.shape["space"]
        h, w, c = host_image.shape
        self.valid_height = h
        # High-side mirror rows so H divides n; pad >= 2 keeps windowed
        # taps up to 2 rows past the valid region bit-exact (the padded
        # rows hold TRUE mirror values; outputs are cropped on fetch).
        pad = (-h) % n
        if pad == 1:
            pad += n
        if pad > h:
            # The mirror slice below reads the last `pad` valid rows; a
            # deeper pad would wrap. Same rule as chain_operation's.
            raise ValueError(
                f"image of {h} rows is too small for {n} row shards "
                f"(needs {pad} mirror rows); use fewer devices")
        img = host_image
        if pad:
            img = np.concatenate([img, img[h - pad:][::-1]], axis=0)
        self.sharding = NamedSharding(self.mesh, P(None, "space", None))
        self._ops, self.wl = build_sharded_wide_ops(
            self.mesh, img.shape[0], w, channels=c, dtype=dtype,
            strip_width=strip_width)
        planar = np.ascontiguousarray(np.transpose(img, (2, 0, 1)))
        if dtype == "float32":
            self._mem_host = planar.astype(np.float32) / np.float32(255)
            strips = to_sharded_wide_resident_f32(img, self.wl, n)
        else:
            self._mem_host = planar
            strips = to_sharded_wide_resident(img, self.wl, n)
        self.strips_dev = jax.block_until_ready(
            put_sharded_wide(strips, self.mesh))
        self._mem_dev = jax.block_until_ready(
            jax.device_put(self._mem_host, self.sharding))

    # -- memory ops over the mesh (scatter / gather payloads) --------------

    def _upload(self):
        return jax.block_until_ready(
            jax.device_put(self._mem_host, self.sharding))

    def _download(self):
        if self._chunked_dl is None:
            from ..runtime.transfer import make_chunked_download
            self._chunked_dl = make_chunked_download(self._mem_dev, axis=1)
        return self._chunked_dl()

    def _download_prepare(self):
        np.asarray(jax.block_until_ready(jax.device_put(
            np.zeros((1, self.n_shards, 128), np.uint8), self.sharding)))

    # -- fetch / chain over the sharded-wide buffers ------------------------

    def _fetch(self) -> np.ndarray:
        if self.dtype == "float32":
            from .. import oracle_f32
            arr = from_sharded_wide_resident_f32(
                self._sample, self.wl, self.n_shards)
            return oracle_f32.to_uint8_hwc(arr[:, :self.valid_height])
        return np.ascontiguousarray(from_sharded_wide_resident(
            self._sample, self.wl, self.n_shards)[:self.valid_height])

    def chain_operation(self, cols: list[str]):
        """--fuse over the sharded-wide model (sharded_wide_chain). A
        chain whose total radius exceeds the session halo gets a
        deeper-halo plan + re-bake as untimed session state — with the
        row padding re-grown so baked mirror rows cover the radius (the
        ShardedBenchmarkSession.chain_operation rule)."""
        from ..harness import Operation
        from ..models import chain as chain_model
        ry, rx = chain_model.check_chain(cols)
        r, n = max(ry, rx), self.n_shards
        f32 = self.dtype == "float32"
        if r <= self.wl.halo:
            # session halo is DEFAULT_HALO=2 and the constructor's pad>=2
            # rule covers mirror taps to that depth — reuse the residents
            wl, strips = self.wl, self.strips_dev
        else:
            h = self.valid_height
            need = max(r, 2)
            pad = (-h) % n
            while (0 < pad < need) or (h + pad) // n < need + 1:
                pad += n
            if pad > h:
                raise ValueError(
                    f"image of {h} rows is too small for a chain needing "
                    f"{need}-row halos (ry={ry}, rx={rx}) over {n} shards")
            img = (self.host_image if pad == 0 else np.concatenate(
                [self.host_image, self.host_image[h - pad:][::-1]], axis=0))
            wl = make_sharded_wide_plan(
                img.shape[0], self.wl.width, n, channels=self.wl.channels,
                halo=r, strip_width=self.wl.strip_width,
                itemsize=4 if f32 else 1)
            host = (to_sharded_wide_resident_f32(img, wl, n) if f32
                    else to_sharded_wide_resident(img, wl, n))
            strips = jax.block_until_ready(
                put_sharded_wide(host, self.mesh))
        fn = sharded_wide_chain(self.mesh, wl, tuple(cols))
        self._chain_exec = (fn, strips)  # exposed to execution_table

        def run():
            self._sample = jax.block_until_ready(fn(strips))

        if f32:
            def fetch():
                from .. import oracle_f32
                arr = from_sharded_wide_resident_f32(self._sample, wl, n)
                return oracle_f32.to_uint8_hwc(arr[:, :self.valid_height])
        else:
            def fetch():
                return np.ascontiguousarray(from_sharded_wide_resident(
                    self._sample, wl, n)[:self.valid_height])

        desc, col, seq_oracle = chain_model.chain_row_parts(
            cols, dtype=self.dtype)
        self._extra_oracles[col] = seq_oracle
        return Operation(desc, "chain", col, run, fetch)
