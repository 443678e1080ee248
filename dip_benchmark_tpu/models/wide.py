"""Beyond-envelope widths: the column-strip RESIDENT model.

`make_layout` enforces the single-buffer width envelope (utils/image.py:
the windowed kernels' per-band VMEM working set scales with padded
width, so past ~52.7k uint8 columns no 8-row band fits the measured
compiler budget — docs/DESIGN.md §1). Whole-slide medical scans routinely
exceed that. This module removes the width bound the same way round 3
removed the height bound for multi-chip: keep the image RESIDENT in N
column strips, each a bog-standard `PlanarLayout` buffer (so the
EXISTING Pallas kernels run unchanged, at full band — no new kernel
code, at most two distinct strip layouts and therefore two compiles per
op), and re-establish each strip's halo pads from its neighbors'
interiors before every windowed application.

Design notes (TPU-first):
- Strips are the column analogue of the round-3 padded-resident row
  shards (`utils/image.to_resident_planar`), but live on ONE device, so
  the per-application halo refresh is two lane-dim `dynamic_update_slice`
  copies per seam — no collective, no host round-trip. The refresh is
  the column counterpart of `parallel/halo.refresh_resident_halo` +
  `refresh_resident_cols`, giving the same contract those bought the
  sharded model in round 4: applications compose BIT-EXACTLY at
  arbitrary depth (the single-device reference re-establishes borders
  every dispatch: sycl/benchmark.cpp:341-356).
- Strip width defaults to the widest LANE multiple that keeps the
  default 112-row band (the envelope's sweet spot), so a 100k-wide scan
  runs the very same band-112 kernels the 3504-wide benchmark image
  measures.
- Interior seams bake TRUE neighbor columns (not mirrors): strip pads
  index the GLOBAL mirror rule, so a single application is bit-identical
  to the (hypothetical) single-buffer op, and the refresh keeps it so
  under composition.

[reference: the benchmark never exceeds 3504x2336 — this surface is the
width-scaling extension SURVEY.md §5 leaves as the framework's seam.]
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from .. import spec
from ..ops import pallas as pallas_ops
from ..utils import image as image_mod
from ..utils.image import LANE, PlanarLayout, make_layout

#: Ops that read neighbor pixels (halo refresh required before applying).
WINDOWED_COLS = frozenset((
    "Erosion-3x3-Cross", "Erosion-3x3-Square", "Erosion-1x3+3x1-Square",
    "Convolution-3x3", "Convolution-1x3+3x1", "Convolution-5x5",
    "Convolution-1x5+5x1", "Gaussian-Blur-3x3", "Fused-Pipeline"))

#: Device ops the wide model serves (memory rows are transfer benchmarks
#: of the single-buffer session, not image ops).
WIDE_COLS = ("Copy", "Inversion", "Grayscale", "Threshold") + tuple(
    c for c in spec.CSV_COLUMNS if c in WINDOWED_COLS) + ("Fused-Pipeline",)
WIDE_COLS = tuple(dict.fromkeys(WIDE_COLS))


# Widest uint8 strip at a MEASURED compiler pass point: the 5x5 SWAR
# convolution (the tightest op; it overrides to a 224-row band on band-112
# layouts) compiled at Wp 5248 and was rejected at Wp 6016 on this
# toolchain (envelope_probe r4 bisect) — the budget-admitted Wp 5760 sits
# in the UNMEASURED gap, so the default strips stop at the pass point
# (width 5120 -> Wp 5248) rather than gamble a fresh whole-slide run on
# it. Costs ~10% more strips; re-probe on toolchain change.
MEASURED_SAFE_STRIP_U8 = 5120


def default_strip_width(halo: int = image_mod.DEFAULT_HALO,
                        itemsize: int = 1) -> int:
    """Widest LANE multiple whose strip layout keeps the full default
    band (112) under the measured VMEM budget, for this data model's
    device itemsize (1 = uint8, 4 = f32 — the f32 windows are 4x wider
    in bytes, so its strips are narrower), capped at the measured
    compiler pass point for uint8 (MEASURED_SAFE_STRIP_U8)."""
    sw = LANE
    while image_mod.fit_band(sw + LANE, halo=halo, itemsize=itemsize) == 112:
        sw += LANE
    if itemsize == 1:
        sw = min(sw, MEASURED_SAFE_STRIP_U8)
    return sw


@dataclass(frozen=True)
class WideLayout:
    """Geometry of the column-strip resident model.

    Strip i holds global columns [i*strip_width, i*strip_width + w_i)
    with w_i = strip_width for interior strips and the remainder for the
    last. All strips share the SAME band (the interior layout's), hence
    the same padded height — seam copies are plain full-height slices.
    """
    height: int
    width: int
    channels: int
    halo: int
    strip_width: int
    layouts: tuple[PlanarLayout, ...]  # one per strip (<= 2 distinct)
    itemsize: int = 1

    @property
    def n_strips(self) -> int:
        return len(self.layouts)

    def col0(self, i: int) -> int:
        return i * self.strip_width


def make_wide_layout(height: int, width: int, channels: int = 3,
                     halo: int = image_mod.DEFAULT_HALO,
                     strip_width: int | None = None,
                     itemsize: int = 1) -> WideLayout:
    """Build the strip plan. strip_width is clamped to a LANE multiple;
    the default keeps every strip at the full 112-row band for this
    itemsize (pass itemsize=4 for the f32 model — its strips and bands
    must fit 4-byte windows, exactly like make_layout's knob).

    A remainder narrower than the halo is MERGED into the previous
    strip (the seam refresh reads `halo` valid columns from each side,
    so every strip must carry at least that many; the merged width stays
    within the same lane-padded Wp, hence the same band)."""
    if min(height, width) < halo + 1:
        # The refresh's flip-based mirrors (and spec.mirror_index
        # itself) are only defined for offsets <= dim-1; deep-halo
        # plans on smaller images would silently corrupt halos.
        raise ValueError(
            f"{height}x{width} is too small for a halo-{halo} strip "
            f"plan (the halo refresh mirrors rows/cols 1..{halo}; need "
            f"both dims >= {halo + 1})")
    sw = (strip_width if strip_width is not None
          else default_strip_width(halo, itemsize))
    sw = max(LANE, sw // LANE * LANE)
    n = max(1, -(-width // sw))
    w_last = width - (n - 1) * sw
    if n > 1 and w_last < halo:
        n -= 1
        w_last += sw
    interior = make_layout(height, min(sw, width), channels, halo=halo,
                           itemsize=itemsize)
    layouts = [interior] * (n - 1)
    layouts.append(interior if w_last == interior.width else make_layout(
        height, w_last, channels, halo=halo, band=interior.band,
        itemsize=itemsize))
    assert all(lo.padded_height == interior.padded_height for lo in layouts)
    total = sum(lo.padded_height * lo.padded_width for lo in layouts
                ) * channels * itemsize
    if total > image_mod.HBM_BUFFER_CAP:
        raise ValueError(
            f"{height}x{width}x{channels} at itemsize {itemsize} needs "
            f"{total / 2**30:.1f} GiB of resident strip buffers (cap "
            f"{image_mod.HBM_BUFFER_CAP // 2**30} GiB leaves room for "
            f"outputs/workspace in ~16 GiB HBM) — shard rows across "
            f"devices (--shards) or stream row blocks "
            f"(models/wide.apply_streaming)")
    return WideLayout(height, width, channels, halo, sw, tuple(layouts),
                      itemsize)


def to_wide_resident(image: np.ndarray, wl: WideLayout,
                     row0: int = 0) -> list[np.ndarray]:
    """uint8 HWC -> list of (C, Hp, Wp_i) strip buffers. Pads bake the
    GLOBAL mirror rule: interior seams hold true neighbor columns, outer
    edges the spec mirror — so the resident state is exact from the
    first application.

    row0: for the streaming row-block path (apply_streaming), `image`
    is the FULL image while the plan covers rows [row0, row0 +
    wl.height) — row indices resolve against the full image, so
    interior block edges bake true neighbor rows (not mirrors)."""
    h, w, c = image.shape
    assert (w, c) == (wl.width, wl.channels) and row0 + wl.height <= h
    planar = np.transpose(image, (2, 0, 1))  # (C, H, W)
    strips = []
    for i, lo in enumerate(wl.layouts):
        hp = lo.padded_height
        ys = np.clip(spec.mirror_index(
            row0 + np.arange(hp) - lo.pad_y, h), 0, h - 1)
        xs = np.clip(spec.mirror_index(
            wl.col0(i) + np.arange(lo.padded_width) - lo.pad_x, w), 0, w - 1)
        strips.append(np.ascontiguousarray(planar[:, ys[:, None], xs[None, :]]))
    return strips


def _crop_concat(strips, wl: WideLayout) -> np.ndarray:
    """Strip buffers -> (C, H, W) planar: crop pads per strip, concat."""
    parts = []
    for s, lo in zip(strips, wl.layouts):
        s = np.asarray(s)
        parts.append(s[:, lo.pad_y:lo.pad_y + lo.height,
                       lo.pad_x:lo.pad_x + lo.width])
    return np.concatenate(parts, axis=2)


def from_wide_resident(strips, wl: WideLayout) -> np.ndarray:
    """List of strip buffers -> uint8 HWC, cropping pads per strip."""
    return np.ascontiguousarray(
        np.transpose(_crop_concat(strips, wl), (1, 2, 0)))


def _refresh_rows(buf: jnp.ndarray, lo: PlanarLayout) -> jnp.ndarray:
    """Local row-pad re-mirror (the n=1 case of refresh_resident_halo):
    rows [0, pad_y) <- flip of valid rows [1, pad_y], rows
    [pad_y + H, pad_y + H + pad_y) <- flip of the last pad_y valid rows.
    Runs over the full strip width so already-correct column pads keep
    consistent corners."""
    py, h = lo.pad_y, lo.height
    valid = buf[:, py:py + h]
    top = jnp.flip(valid[:, 1:py + 1], axis=1)
    bot = jnp.flip(valid[:, h - py:h], axis=1)
    buf = lax.dynamic_update_slice(buf, top, (0, 0, 0))
    return lax.dynamic_update_slice(buf, bot, (0, py + h, 0))


def refresh_cols(rowed: list[jnp.ndarray], wl: WideLayout):
    """The column half of the strip refresh: column pads from the
    NEIGHBOR strip's edge interior (outer edges: local mirror), over
    buffers whose ROW pads are already current ('rowed') so the copied
    seam columns carry correct corners. Rank-agnostic over leading dims
    (works on the (C, Hp, Wp_i) resident strips AND on the sharded-wide
    model's per-shard local blocks, parallel/wide.py)."""
    px = wl.halo
    out = []
    for i, (s, lo) in enumerate(zip(rowed, wl.layouts)):
        if i == 0:
            left = jnp.flip(s[..., px + 1:2 * px + 1], axis=-1)
        else:
            prev, plo = rowed[i - 1], wl.layouts[i - 1]
            left = prev[..., plo.pad_x + plo.width - px:plo.pad_x + plo.width]
        if i == wl.n_strips - 1:
            right = jnp.flip(s[..., lo.width:px + lo.width], axis=-1)
        else:
            right = rowed[i + 1][..., px:2 * px]
        s = lax.dynamic_update_slice_in_dim(s, left, 0, axis=-1)
        s = lax.dynamic_update_slice_in_dim(s, right, lo.pad_x + lo.width,
                                            axis=-1)
        out.append(s)
    return out


def refresh_wide(strips: list[jnp.ndarray], wl: WideLayout):
    """Re-establish every strip's halo pads from the current valid
    pixels: row pads by the local mirror rule, column pads from the
    NEIGHBOR strip's edge interior (outer edges: mirror). Purely
    functional — all sources are valid-region slices of the inputs, so
    there is no intra-refresh ordering hazard. After any op (windowed
    ops shrink pad validity; point ops leave pads stale), one refresh
    restores the exact resident invariant — applications therefore
    compose bit-exactly at arbitrary depth (tests/test_wide.py)."""
    return refresh_cols([_refresh_rows(s, lo)
                         for s, lo in zip(strips, wl.layouts)], wl)


def kernels_per_layout(wl: WideLayout, build) -> dict:
    """One kernel set per DISTINCT strip layout: strips sharing a layout
    (all interior strips, usually) share compiled kernels; only a
    different-width remainder strip builds its own. The single
    kernel-sharing policy for every wide surface (resident ops, fused
    chains, and their sharded composition in parallel/wide.py)."""
    per_layout: dict[PlanarLayout, object] = {}
    for lo in wl.layouts:
        if lo not in per_layout:
            per_layout[lo] = build(lo)
    return per_layout


def _build_wide(wl: WideLayout, builder, refresh: bool = True) -> dict:
    per_layout = kernels_per_layout(wl, builder)

    def make(col):
        needs_halo = refresh and col in WINDOWED_COLS

        @jax.jit
        def op(strips):
            if needs_halo:
                strips = refresh_wide(list(strips), wl)
            return [per_layout[lo][col](s)
                    for s, lo in zip(strips, wl.layouts)]
        return op

    return {col: make(col) for col in WIDE_COLS}


def build_wide_ops(wl: WideLayout) -> dict:
    """CSV-column-keyed callables over the strip list. Kernels are built
    once per DISTINCT strip layout (interior + possibly the last strip)
    and shared across strips; windowed ops refresh the halo pads first,
    inside the same jit."""
    assert wl.itemsize == 1, "uint8 ops need an itemsize=1 strip plan"
    return _build_wide(wl, pallas_ops.build_ops)


def build_wide_ops_f32(wl: WideLayout) -> dict:
    """The f32 planar-[0,1] data model over the strip list (the CUDA.jl
    parity variant) — same strip plan, same refresh (the halo logic is
    dtype-agnostic), f32 kernels per distinct layout. The plan MUST be
    built with itemsize=4: f32 windows are 4x the bytes, so uint8-sized
    strips would exceed the VMEM envelope on hardware."""
    assert wl.itemsize == 4, (
        "f32 ops need make_wide_layout(..., itemsize=4)")
    return _build_wide(wl, pallas_ops.build_f32_ops)


def to_wide_resident_f32(image: np.ndarray, wl: WideLayout,
                         row0: int = 0):
    """uint8 HWC -> f32 [0,1] strip buffers (exact: u8/255 commutes with
    the mirror/seam indexing). row0: streaming row-block offset, as in
    to_wide_resident."""
    return [s.astype(np.float32) / np.float32(255)
            for s in to_wide_resident(image, wl, row0=row0)]


def from_wide_resident_f32(strips, wl: WideLayout) -> np.ndarray:
    """f32 strip buffers -> (C, H, W) f32 planar (the f32 model's native
    shape), cropping pads per strip."""
    return np.ascontiguousarray(_crop_concat(strips, wl))


def wide_chain(wl: WideLayout, cols: tuple[str, ...]):
    """Compose device ops over the resident strips: one refresh per
    windowed stage (the composition contract), all stages in ONE jit.
    Stage radii must fit the strip halo per application — every matrix
    op does (max radius 2 == DEFAULT_HALO)."""
    ops = build_wide_ops(wl)
    for c in cols:
        assert c in ops, c

    @jax.jit
    def chain(strips):
        strips = list(strips)
        for c in cols:
            strips = ops[c](strips)
        return strips

    return chain


def put_wide(strips, device: jax.Device | None = None) -> list[jax.Array]:
    """Host strip list -> device-resident strip list (on `device`, or the
    default device — the session passes its --backend-gated device)."""
    return [jax.device_put(s, device) for s in strips]


def wide_fused_chain(wl: WideLayout, cols: tuple[str, ...]):
    """The --fuse row over the strip model: the WHOLE chain as ONE fused
    Pallas kernel per strip (models/chain.make_fused_chain), with one
    seam refresh per chain application — the wide analogue of
    BenchmarkSession.chain_operation. Requires wl.halo >= the chain's
    total radius: the fused kernel consumes radius-deep taps in one
    application, and the refresh re-establishes halo-deep pads, so
    applications compose bit-exactly at arbitrary depth like every wide
    op (tests/test_wide.py). Both data models (wl.itemsize selects the
    packed-16 uint8 or the f32 chain kernel)."""
    from . import chain as chain_model
    ry, rx = chain_model.check_chain(list(cols))
    if max(ry, rx) > wl.halo:
        raise ValueError(
            f"chain radius (ry={ry}, rx={rx}) exceeds the strip halo "
            f"({wl.halo}); build the plan with make_wide_layout(halo="
            f"{max(ry, rx)})")
    make = (chain_model.make_fused_chain_f32 if wl.itemsize == 4
            else chain_model.make_fused_chain)
    per_layout = kernels_per_layout(wl, lambda lo: make(lo, list(cols)))

    @jax.jit
    def chain(strips):
        strips = refresh_wide(list(strips), wl)
        return [per_layout[lo](s) for s, lo in zip(strips, wl.layouts)]

    return chain


def apply_streaming(image: np.ndarray, col: str,
                    block_rows: int = 2048,
                    strip_width: int | None = None,
                    dtype: str = "uint8") -> np.ndarray:
    """ONE application of a device op to an image of ANY size, streaming
    row blocks through the strip model — the remedy the aggregate-HBM
    ValueError names when even the strip plan exceeds resident memory.

    Each block bakes its halo rows from the FULL image (true neighbor
    rows at interior block edges, spec mirror at the top/bottom), so the
    stitched result is bit-identical to the whole-image op. Blocks share
    one plan (and therefore one compiled kernel set); a shorter last
    block gets its own. Single application per call by design; composing
    CALLS (out = apply_streaming(apply_streaming(img, c), c)) stays
    bit-exact — each pass is exactly the whole-image op — at the price
    of a host round-trip per pass, so for deep composition keep the
    strips RESIDENT (build_wide_ops) when the plan fits HBM.

    dtype "uint8" (primary, uint8 HWC in/out) or "float32" (the CUDA.jl-
    parity model: uint8 HWC in, f32 [0,1] (C, H, W) planar out — the f32
    model's native shape, like from_wide_resident_f32)."""
    if col not in WIDE_COLS:
        raise ValueError(f"unknown column {col!r}; valid: {WIDE_COLS}")
    if dtype not in ("uint8", "float32"):
        raise ValueError(f"Unknown dtype: {dtype!r}")
    f32 = dtype == "float32"
    h, w, _ = image.shape
    block_rows = min(block_rows, h)
    # Every block carries its own strip plan, and make_wide_layout's
    # mirror guard requires halo+1 rows — silently raise tiny block
    # heights to that minimum (halos are baked from the FULL image
    # either way, so the stitched result is unchanged; only the block
    # partitioning moves).
    block_rows = max(block_rows, min(h, image_mod.DEFAULT_HALO + 1))
    plans: dict[int, tuple[WideLayout, dict]] = {}

    def plan(hb: int):
        if hb not in plans:
            wl = make_wide_layout(hb, w, strip_width=strip_width,
                                  itemsize=4 if f32 else 1)
            # NO pre-refresh: the resident refresh re-mirrors row pads
            # LOCALLY (correct when a strip spans the full image height),
            # which would clobber a streaming block's baked TRUE-neighbor
            # row halos. Freshly baked states are exact as-is for one
            # application.
            plans[hb] = (wl, _build_wide(
                wl, pallas_ops.build_f32_ops if f32 else pallas_ops.build_ops,
                refresh=False))
        return plans[hb]

    starts = list(range(0, h, block_rows))
    # A remainder shorter than the strip plan's halo+1 minimum can't
    # carry its own layout (make_wide_layout's mirror guard); fold it
    # into the previous block, which gets its own slightly-taller plan.
    if len(starts) > 1 and h - starts[-1] < image_mod.DEFAULT_HALO + 1:
        starts.pop()
    parts = []
    for i, y0 in enumerate(starts):
        hb = (h - y0) if i == len(starts) - 1 else block_rows
        wl, ops = plan(hb)
        if f32:
            strips = put_wide(to_wide_resident_f32(image, wl, row0=y0))
            parts.append(from_wide_resident_f32(ops[col](strips), wl))
        else:
            strips = put_wide(to_wide_resident(image, wl, row0=y0))
            parts.append(from_wide_resident(ops[col](strips), wl))
    return np.concatenate(parts, axis=1 if f32 else 0)


class WideBenchmarkSession:
    """The benchmark op table over the column-strip resident model: the
    CLI's automatic fallback when the image width exceeds the
    single-buffer envelope on the Pallas path (cli.py; the X-path has no
    per-band VMEM window, so it takes any width directly).

    Same 14-op contract as BenchmarkSession: Upload/Download move the
    data model's working payload (uint8 HWC bytes, or the f32 planar for
    --dtype float32), device ops run over the strip list, image dumps
    and --verify reassemble via from_wide_resident. Full knob parity
    with the single-buffer session: --exec and --chained carry the strip
    pytree through the fori_loop, --warm AOT-compiles the strip ops
    (runtime/aot._table), --fuse runs one fused chain kernel per strip
    (wide_fused_chain, round 5)."""

    def __init__(self, host_image: np.ndarray, dtype: str = "uint8",
                 strip_width: int | None = None,
                 device: jax.Device | None = None):
        image_mod.check_uint8_hwc(host_image)
        if min(host_image.shape[:2]) < 5:
            raise ValueError("image must be at least 5x5")
        if dtype not in ("uint8", "float32"):
            raise ValueError(f"Unknown dtype: {dtype!r}")
        self.host_image = np.ascontiguousarray(host_image)
        self.path = "pallas"
        self.dtype = dtype
        self.device = device  # None = default (put_wide/device_put rule)
        self._extra_oracles: dict = {}
        self._chain_exec: tuple | None = None  # set by chain_operation
        h, w, c = host_image.shape
        self.wl = make_wide_layout(
            h, w, c, strip_width=strip_width,
            itemsize=4 if dtype == "float32" else 1)
        if dtype == "float32":
            from .. import oracle_f32
            self._mem_host = oracle_f32.from_uint8_hwc(self.host_image)
            strips = to_wide_resident_f32(self.host_image, self.wl)
            self._ops = build_wide_ops_f32(self.wl)
        else:
            self._mem_host = self.host_image
            strips = to_wide_resident(self.host_image, self.wl)
            self._ops = build_wide_ops(self.wl)
        self.strips_dev = jax.block_until_ready(put_wide(strips, device))
        self._mem_dev = jax.block_until_ready(
            jax.device_put(self._mem_host, device))
        self._sample = None
        self._chunked_dl = None  # lazy: Download's 'once' column

    # -- memory ops (same payload rule as BenchmarkSession) ----------------

    def _upload(self):
        return jax.block_until_ready(
            jax.device_put(self._mem_host, self.device))

    def _download(self):
        if self._chunked_dl is None:
            from ..runtime.transfer import make_chunked_download
            # f32's planar (C, H, W) payload must chunk along rows (the
            # ShardedWideBenchmarkSession rule) — axis 0 would clamp the
            # pipeline to 3 plane-reads.
            self._chunked_dl = make_chunked_download(
                self._mem_dev, axis=1 if self.dtype == "float32" else 0)
        return self._chunked_dl()

    def _download_prepare(self):
        np.asarray(jax.block_until_ready(
            jax.device_put(np.zeros((8, 128), np.uint8), self.device)))

    # -- table -------------------------------------------------------------

    def _make_run(self, fn):
        from ..session import aot_wrap
        src = self.strips_dev
        op = aot_wrap(self, fn)

        def run():
            self._sample = jax.block_until_ready(op(src))
        return run

    def _fetch(self) -> np.ndarray:
        if self.dtype == "float32":
            from .. import oracle_f32
            return oracle_f32.to_uint8_hwc(
                from_wide_resident_f32(self._sample, self.wl))
        return from_wide_resident(self._sample, self.wl)

    def _no_image(self) -> np.ndarray:
        raise RuntimeError("memory ops produce no image")

    def operations(self, include_pipeline: bool = False):
        from ..harness import Operation
        ops = []
        for desc, prefix, col in spec.OPERATION_MATRIX:
            if col == "Upload":
                ops.append(Operation(desc, prefix, col, self._upload,
                                     self._no_image))
            elif col == "Download":
                ops.append(Operation(desc, prefix, col, self._download,
                                     self._no_image,
                                     prepare=self._download_prepare,
                                     downloads=True))
            else:
                ops.append(Operation(desc, prefix, col,
                                     self._make_run(self._ops[col]),
                                     self._fetch))
        if include_pipeline:
            ops.append(Operation(
                "Fused Pipeline (Grayscale+Threshold+Erosion+Blur)",
                "pipeline", "Fused-Pipeline",
                self._make_run(self._ops["Fused-Pipeline"]), self._fetch))
        return ops

    def chained_operations(self, k: int, include_pipeline: bool = False):
        """Measurement-only chained-K table over the strip model: each
        timed round executes k in-graph applications of the op (the
        fori_loop carries the strip LIST as its pytree state — wide ops
        are shape-preserving lists->lists by construction). Same caveats
        as BenchmarkSession.chained_operations (relay rigs measure
        amortized submission; use --exec for completed work); no image
        dumps."""
        from jax import lax

        from ..harness import Operation
        ops = []
        cols = [t for t in spec.OPERATION_MATRIX
                if t[2] not in ("Upload", "Download")]
        if include_pipeline:
            cols.append((
                "Fused Pipeline (Grayscale+Threshold+Erosion+Blur)", "",
                "Fused-Pipeline"))
        for desc, _prefix, col in cols:
            fn = self._ops[col]
            chained = jax.jit(
                lambda s, fn=fn: lax.fori_loop(0, k, lambda i, v: fn(v), s))
            ops.append(Operation(desc, "", col, self._make_run(chained),
                                 self._no_image, time_scale=k))
        return ops

    def chain_operation(self, cols: list[str]):
        """--fuse over the strip model: the whole chain fused into ONE
        Pallas kernel per strip (wide_fused_chain). A chain whose total
        radius exceeds the strip halo gets a deeper-halo strip plan +
        re-bake here (untimed session state, mirroring
        BenchmarkSession.chain_operation)."""
        from ..harness import Operation
        from . import chain as chain_model
        ry, rx = chain_model.check_chain(cols)
        r = max(ry, rx)
        f32 = self.dtype == "float32"
        if r <= self.wl.halo:
            wl, strips = self.wl, self.strips_dev
        else:
            wl = make_wide_layout(self.wl.height, self.wl.width,
                                  self.wl.channels, halo=r,
                                  strip_width=self.wl.strip_width,
                                  itemsize=4 if f32 else 1)
            host = (to_wide_resident_f32(self.host_image, wl) if f32
                    else to_wide_resident(self.host_image, wl))
            strips = jax.block_until_ready(put_wide(host, self.device))
        fn = wide_fused_chain(wl, tuple(cols))
        # expose to execution_table (chains are shape-preserving lists)
        self._chain_exec = (fn, strips)

        def run():
            self._sample = jax.block_until_ready(fn(strips))

        if f32:
            def fetch():
                from .. import oracle_f32
                return oracle_f32.to_uint8_hwc(
                    from_wide_resident_f32(self._sample, wl))
        else:
            def fetch():
                return from_wide_resident(self._sample, wl)

        desc, col, seq_oracle = chain_model.chain_row_parts(
            cols, dtype=self.dtype)
        self._extra_oracles[col] = seq_oracle
        return Operation(desc, "chain", col, run, fetch)

    def execution_table(self, include_pipeline: bool = False,
                        k1: int = 30, k2: int = 300, samples: int = 5,
                        auto_scale: bool = False):
        """TRUE per-application execution over the strip model (the
        chained-K marginal carries the strip list as its fori_loop
        state; wide ops are shape-preserving by construction)."""
        from ..runtime.exec_timing import execution_time
        cols = [c for _, _, c in spec.OPERATION_MATRIX
                if c not in ("Upload", "Download")]
        if include_pipeline:
            cols.append("Fused-Pipeline")
        rows = [(c, execution_time(self._ops[c], self.strips_dev,
                                   k1=k1, k2=k2, samples=samples,
                                   auto_scale=auto_scale))
                for c in cols]
        if self._chain_exec is not None:
            fn, strips = self._chain_exec
            rows.append(("Fused-Chain", execution_time(
                fn, strips, k1=k1, k2=k2, samples=samples,
                auto_scale=auto_scale)))
        return rows

    @property
    def verify_atol(self) -> int:
        return 1 if self.dtype == "float32" else 0

    def oracle_ops(self) -> dict:
        if self.dtype == "float32":
            from .. import oracle_f32
            base = oracle_f32.uint8_verify_ops()
        else:
            from .. import native, oracle
            base = (native.image_ops() if native.available()
                    else oracle.IMAGE_OPS)
        if self._extra_oracles:  # chain rows' sequential oracles
            base = {**base, **self._extra_oracles}
        return base
