"""Image I/O and layout utilities (the L0 layer, SURVEY.md §1).

Internal color convention is RGB uint8 HWC at the framework edges. The Pallas
execution path additionally uses a planar, mirror-pre-padded, lane-aligned
(C, Hp, Wp) device layout built here on the host (one-time, untimed — the
same role as the reference backends' host-side layout conversion, e.g.
channelview at cuda/benchmark.jl:171-172).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

from .. import spec

try:  # cv2 matches the reference's JPEG decode exactly (opencv/benchmark.py:14)
    import cv2 as _cv2
except ImportError:  # pragma: no cover
    _cv2 = None


def load_image(path: str) -> np.ndarray:
    """Load an image file as uint8 RGB HWC."""
    if _cv2 is not None:
        bgr = _cv2.imread(path, _cv2.IMREAD_COLOR)
        if bgr is None:
            raise ValueError(f"Not a valid image file: {path}")
        return np.ascontiguousarray(bgr[..., ::-1])
    from PIL import Image  # pragma: no cover
    return np.asarray(Image.open(path).convert("RGB"))  # pragma: no cover


def save_image(path: str, image: np.ndarray) -> None:
    """Save a uint8 RGB HWC image."""
    assert image.dtype == np.uint8 and image.ndim == 3
    if _cv2 is not None:
        ok = _cv2.imwrite(path, np.ascontiguousarray(image[..., ::-1]))
        if not ok:
            raise IOError(f"Failed to write {path}")
        return
    from PIL import Image  # pragma: no cover
    Image.fromarray(image).save(path)  # pragma: no cover


def check_uint8_hwc(image: np.ndarray) -> None:
    """Session-constructor input contract, as a ValueError (not assert —
    python -O strips asserts, and CLI callers rely on these firing;
    models/chain.py states the convention)."""
    if (getattr(image, "dtype", None) != np.uint8
            or getattr(image, "ndim", 0) != 3
            or image.shape[2] != 3):
        # channels==3 matters too: grayscale's flat (H, W*3)%3 math and
        # the RGB spec silently produce garbage on RGBA input.
        raise ValueError(
            f"expected a uint8 HWC RGB image array (3 channels), got "
            f"dtype={getattr(image, 'dtype', type(image))} "
            f"shape={getattr(image, 'shape', '?')}")


def is_image_file(path: str) -> bool:
    if not os.path.isfile(path):
        return False
    if _cv2 is not None:
        return _cv2.haveImageReader(path)
    try:  # pragma: no cover
        from PIL import Image
        Image.open(path).verify()
        return True
    except Exception:
        return False


# ---------------------------------------------------------------------------
# Planar padded layout for the Pallas path
# ---------------------------------------------------------------------------

LANE = 128      # TPU lane width (minor dim tiling unit)
SUBLANE = 8     # float32 sublane unit


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclass(frozen=True)
class PlanarLayout:
    """Geometry of the planar padded device layout.

    Array shape is (C, Hp, Wp) uint8 where:
      - rows [pad_y, pad_y + height) are valid, with `pad_y` mirror halo rows
        above, and mirror + slack rows below;
      - cols [pad_x, pad_x + width) are valid, with mirror halo columns either
        side; Wp is rounded up to a LANE multiple.
    Mirror values follow spec.mirror_index, so windowed kernels need zero
    boundary logic: out[y, x] only ever reads in[y+dy, x+dx] for |dy|,|dx| <= 2.

    `band` is the row-band size of the windowed Pallas kernels' grid. Mosaic
    requires HBM DMA slices to start and end on 8-row tile boundaries, so
    each grid step DMAs padded rows [i*band, i*band + band + DMA_SLACK); the
    layout reserves banded_height + DMA_SLACK rows so every window is
    in-bounds (trailing rows are mirror-clipped junk, never used by compute).
    """
    height: int
    width: int
    channels: int
    pad_y: int
    pad_x: int
    band: int = 112  # multiple of 8; sized so windowed kernels'
    # double-buffered windows + i32 compute temps fit the 16 MB VMEM budget

    @property
    def n_bands(self) -> int:
        # Bands cover every padded row up to pad_y + height (windowed ops
        # are shape-preserving: band i computes padded rows [i*band,
        # (i+1)*band), including the top mirror-halo rows).
        return -(-(self.height + self.pad_y) // self.band)

    @property
    def banded_height(self) -> int:
        """Rows covered by windowed kernels' grids (>= pad_y + height)."""
        return self.n_bands * self.band

    @property
    def padded_height(self) -> int:
        return self.banded_height + DMA_SLACK

    @property
    def padded_width(self) -> int:
        return round_up(self.width + 2 * self.pad_x, LANE)

    @property
    def shape(self) -> tuple[int, int, int]:
        return (self.channels, self.padded_height, self.padded_width)


DEFAULT_HALO = 2   # max kernel radius in the op matrix (5x5 -> 2)
DMA_SLACK = 16     # >= 2*pad_y rounded up to the 8-row DMA tile

# Effective per-kernel VMEM ceiling. Hardware carries 16 MiB/core on the
# v4/v5 generations, but the envelope probe (round 4) pinned the remote
# Mosaic compiler's acceptance boundary below that: with the constants
# here, the 5x5 SWAR convolution (the tightest op) passes at an
# estimated 14.86 MiB and is rejected at 15.42 MiB; erosion passes up
# to 15.59 and is rejected at 16.76 (benchmarks/tuning/
# envelope_probe.py — one budget must carry the whole matrix, so the
# conv boundary governs). The same band-112 width-7296 conv kernel
# COMPILED in round 3, so this is a toolchain property to re-probe on
# compiler updates, not physics.
VMEM_BUDGET = int(14.9 * 2**20)
# Live i32/f32 compute temps per output row in the widest windowed body,
# as a multiple of (band + 2*pad_y) x Wp x 4-byte rows. The DMA window and
# output block below are exact (they are the kernels' scratch_shapes);
# this factor covers the 5x5 convolution's SWAR accumulators — measured
# round 4: fresh conv-5x5 compiles pass at band 112 x Wp 5248 and band 88
# x Wp 7296 but fail at band 112 x Wp 6272, bracketing the factor in
# (4.8, 5.25]; simpler ops (erosion) measure ~2 but the layout is shared
# across the op matrix, so the widest op governs.
TEMP_ROW_FACTOR = 5
HBM_BUFFER_CAP = 4 * 2**30  # one resident planar buffer (HBM is ~16 GiB;
# in + out + XLA workspace want several buffers resident)


def windowed_vmem_bytes(layout: PlanarLayout, itemsize: int = 1) -> int:
    """Estimated per-grid-step VMEM working set of the windowed Pallas
    kernels: the double-buffered DMA window + the output block (both exact
    — ops/pallas/window.py scratch/out specs) + widened compute temps
    (TEMP_ROW_FACTOR). itemsize is the device dtype's (1 = uint8 model,
    4 = f32 model)."""
    wp = layout.padded_width
    blen = layout.band + DMA_SLACK
    window = 2 * blen * wp * itemsize
    out = layout.band * wp * itemsize
    temps = TEMP_ROW_FACTOR * (layout.band + 2 * layout.pad_y) * wp * 4
    return window + out + temps


# Multi-stage fused kernels (flagship pipeline, fused chains) hold more
# live VMEM than the single-op model above: fused_channels bodies DMA all
# C channels of the band window and the grayscale stage keeps several
# full-window i32 temps before packing halves the height.
FUSED_TEMP_ROW_FACTOR = 6


def fused_vmem_bytes(layout: PlanarLayout, band: int,
                     itemsize: int = 1, channels: int = 3) -> int:
    """Estimated per-grid-step VMEM working set of a fused multi-stage
    kernel running at `band` (channels=3: fused_channels bodies; 1: the
    per-channel chain path)."""
    wp = layout.padded_width
    blen = band + DMA_SLACK
    window = 2 * channels * blen * wp * itemsize
    out = channels * band * wp * itemsize
    temps = FUSED_TEMP_ROW_FACTOR * (band + 2 * layout.pad_y) * wp * 4
    return window + out + temps


def fused_effective_band(layout: PlanarLayout, itemsize: int = 1,
                         channels: int = 3, start: int | None = None) -> int:
    """The band fused multi-stage kernels run at on this layout: the
    largest 8-multiple divisor of banded_height (= layout.band at every
    published geometry — the hardware-validated configs are unchanged)
    whose modeled working set fits VMEM_BUDGET. Near-envelope widths that
    make_layout admits on the single-op model could otherwise push the
    C-channel fused window past the measured Mosaic acceptance boundary —
    the same failure class conv5_effective_band caps for the 5x5 conv.
    start: begin the search below layout.band (the f32 pipeline starts at
    its halved _divisor_band pick)."""
    for b in range(layout.band if start is None else start, 7, -8):
        if layout.banded_height % b:
            continue
        if fused_vmem_bytes(layout, b, itemsize, channels) <= VMEM_BUDGET:
            return b
    # Even the minimum band models over budget (reachable for wide f32
    # fused kernels: fit_band admits the single-op model, but the
    # C-channel multi-stage window is ~4x the bytes). Refuse with remedy
    # text rather than handing Mosaic a kernel the measured acceptance
    # boundary says it will reject.
    need = fused_vmem_bytes(layout, 8, itemsize, channels) / 2**20
    raise ValueError(
        f"fused kernel at width {layout.width} (itemsize {itemsize}) is "
        f"outside the VMEM envelope: even an 8-row band models "
        f"{need:.1f} MiB of {VMEM_BUDGET / 2**20:.1f} MiB — run the ops "
        "unfused, or use a narrower image")


# The packed 5x5 convolution's preferred EFFECTIVE bands (largest first):
# its unrolled body amortizes better at a band LARGER than the default 112
# (ops/pallas/window.py, kernel_lab10: 198 -> ~176 us), so it overrides the
# layout band to the first of these that divides banded_height.
CONV5_EFFECTIVE_BANDS = (336, 224, 168)


def conv5_effective_band(layout: PlanarLayout, itemsize: int = 1) -> int:
    """The band the packed 5x5 convolution ACTUALLY runs at on this layout
    — the one place deciding the override for both the kernel
    (ops/pallas/window.make_convolution) and the VMEM envelope model.

    The override depends on banded_height divisibility, i.e. on image
    HEIGHT — e.g. the benchmark image (2336x3504, banded 2352 = 7*336)
    takes 336 while a 1024-row layout (banded 1120) takes 224 — so a
    candidate is accepted only if its modeled working set ALSO fits the
    VMEM budget; otherwise make_layout's fit (computed at layout.band)
    could admit near-boundary widths whose 5x5 the Mosaic compiler then
    rejects at 1.5x the modeled temps. The model maps an effective band B
    to windowed_vmem_bytes at band B/2: packing halves temp heights, so
    the round-4 calibration anchor (layout band 112 -> effective 224,
    measured pass at Wp 5248 / rejection at Wp 6272) is EXACTLY the
    existing formula at band 112 — candidate 224 keeps the measured
    boundary, and the other candidates scale linearly in B with the same
    window/out/temps composition. Falls back to layout.band (which
    make_layout already guaranteed fits)."""
    for b in CONV5_EFFECTIVE_BANDS:
        if layout.banded_height % b:
            continue
        probe = PlanarLayout(layout.height, layout.width, layout.channels,
                             pad_y=layout.pad_y, pad_x=layout.pad_x,
                             band=b // 2)
        if windowed_vmem_bytes(probe, itemsize) <= VMEM_BUDGET:
            return b
    return layout.band


def fit_band(width: int, halo: int = DEFAULT_HALO, itemsize: int = 1,
             cap: int = 112) -> int:
    """Largest 8-row band <= cap whose windowed working set fits VMEM at
    this width, or 0 if even band=8 exceeds the budget."""
    for band in range(max(8, cap // 8 * 8), 7, -8):
        probe = PlanarLayout(8, width, 1, pad_y=halo, pad_x=halo, band=band)
        if windowed_vmem_bytes(probe, itemsize) <= VMEM_BUDGET:
            return band
    return 0


def make_layout(height: int, width: int, channels: int = 3,
                halo: int = DEFAULT_HALO, band: int = 112,
                itemsize: int = 1) -> PlanarLayout:
    """Build the planar padded layout, enforcing the size envelope
    (docs/DESIGN.md §1): the requested `band` acts as a cap — it shrinks
    (in 8-row steps) until the windowed kernels' per-step VMEM working set
    fits the measured VMEM budget, widening the supported width envelope at a
    per-op cost of more grid steps. Beyond help (no band fits, or the
    device buffer alone exceeds HBM_BUFFER_CAP) raises ValueError."""
    assert band % SUBLANE == 0 and 2 * halo <= DMA_SLACK
    fitted = fit_band(width, halo=halo, itemsize=itemsize, cap=band)
    if fitted == 0:
        est = windowed_vmem_bytes(
            PlanarLayout(height, width, channels, pad_y=halo, pad_x=halo,
                         band=8), itemsize)
        raise ValueError(
            f"width {width} is outside the single-buffer envelope: even "
            f"an 8-row band needs ~{est / 2**20:.1f} MiB of VMEM per "
            f"kernel step (budget {VMEM_BUDGET / 2**20:.1f} MiB) — use "
            f"the column-strip resident model (models/wide.make_wide_layout, "
            f"docs/DESIGN.md §1), which runs the same kernels at full "
            f"band on arbitrary widths")
    layout = PlanarLayout(height, width, channels, pad_y=halo, pad_x=halo,
                          band=fitted)
    buf = layout.padded_height * layout.padded_width * channels * itemsize
    if buf > HBM_BUFFER_CAP:
        raise ValueError(
            f"{height}x{width}x{channels} at itemsize {itemsize} needs a "
            f"{buf / 2**30:.1f} GiB device buffer (cap "
            f"{HBM_BUFFER_CAP // 2**30} GiB leaves room for in/out/"
            f"workspace in ~16 GiB HBM) — shard rows across devices "
            f"(--shards) or tile the image (docs/DESIGN.md §1)")
    return layout


def to_planar_padded(image: np.ndarray, layout: PlanarLayout) -> np.ndarray:
    """HWC uint8 -> (C, Hp, Wp) uint8 with mirror halo baked in."""
    h, w, c = image.shape
    assert (h, w, c) == (layout.height, layout.width, layout.channels)
    hp = layout.padded_height
    ys = spec.mirror_index(np.arange(hp) - layout.pad_y, h)
    # Alignment slack beyond h + pad_y mirrors too (harmless; never read).
    ys = np.clip(ys, 0, h - 1)
    xs = mirror_col_index(layout)
    planar = np.transpose(image, (2, 0, 1))  # (C, H, W)
    return np.ascontiguousarray(planar[:, ys[:, None], xs[None, :]])


def mirror_col_index(layout: PlanarLayout) -> np.ndarray:
    """Column gather indices for the lane-padded width: source column of
    every padded column (mirror halo + clamped alignment slack). The ONE
    copy of the padded-column rule — bake_mirror_cols, to_resident_planar
    and the batch tool all index through it."""
    return np.clip(spec.mirror_index(
        np.arange(layout.padded_width) - layout.pad_x, layout.width),
        0, layout.width - 1)


def bake_mirror_cols(planar: np.ndarray, layout: PlanarLayout) -> np.ndarray:
    """(C, H, W) -> (C, H, Wp): mirror halo columns baked, lane-aligned.
    Rows untouched (the sharded path receives row halo over ICI instead)."""
    assert planar.shape[-1] == layout.width
    return np.ascontiguousarray(planar[..., mirror_col_index(layout)])


def to_resident_planar(planar: np.ndarray, layout: PlanarLayout,
                       n: int) -> np.ndarray:
    """(..., H, W) -> (..., n*Hp, Wp): the PADDED-RESIDENT sharded layout —
    each of the n row-shards stored as its FULL padded local layout
    (mirror columns baked; halo rows filled with the neighbor's rows, or
    the global mirror on edge shards), stacked along rows so a
    P(..., 'space', None) sharding gives every shard exactly its own
    padded buffer. Per-application halo upkeep is then only the 2*pad_y
    strip refresh (parallel/halo.refresh_resident_halo) instead of a
    whole-shard reassembly. H must divide by n; leading dims (channels,
    batch stacks) pass through."""
    h, w = planar.shape[-2:]
    assert h % n == 0, f"{n} shards must divide height {h}"
    h_loc = h // n
    assert (layout.height, layout.width) == (h_loc, w), (
        "layout must be the per-shard layout")
    hp = layout.padded_height
    xs = mirror_col_index(layout)
    blocks = []
    for i in range(n):
        ys = np.clip(spec.mirror_index(
            i * h_loc + np.arange(hp) - layout.pad_y, h), 0, h - 1)
        blocks.append(planar[..., ys[:, None], xs[None, :]])
    return np.ascontiguousarray(np.concatenate(blocks, axis=-2))


def from_resident_planar(resident: np.ndarray, layout: PlanarLayout,
                         n: int, h_loc: int,
                         height: int | None = None) -> np.ndarray:
    """(..., n*Hp, Wp) resident array -> (..., height, W) planar: extract
    each shard's valid rows ([pad_y, pad_y + h_loc) of its block),
    concatenate, crop the lane padding and any session row-padding
    (height < n*h_loc)."""
    *lead, total, wp = resident.shape
    hp = layout.padded_height
    assert total == n * hp, (total, n, hp)
    if h_loc != layout.height:
        # h_loc is redundant with the layout; a mismatch would silently
        # return wrongly-cropped rows.
        raise ValueError(f"h_loc {h_loc} != layout.height {layout.height}")
    py, px = layout.pad_y, layout.pad_x
    stacked = resident.reshape(*lead, n, hp, wp)
    valid = stacked[..., py:py + h_loc, :].reshape(*lead, n * h_loc, wp)
    if height is not None:
        valid = valid[..., :height, :]
    return np.ascontiguousarray(valid[..., px:px + layout.width])


def to_planar_padded_f32(image: np.ndarray, layout: PlanarLayout) -> np.ndarray:
    """uint8 HWC -> float32 [0,1] (C, Hp, Wp) with mirror halo baked in
    (the CUDA.jl load path normalization, cuda/benchmark.jl:171-172;
    exact: u8/255 commutes with mirror indexing)."""
    return to_planar_padded(image, layout).astype(np.float32) / np.float32(255)


def from_planar_padded(planar: np.ndarray, layout: PlanarLayout) -> np.ndarray:
    """(C, Hp, Wp) -> HWC uint8, cropping halo/alignment padding."""
    py, px = layout.pad_y, layout.pad_x
    valid = planar[:, py:py + layout.height, px:px + layout.width]
    return np.ascontiguousarray(np.transpose(valid, (1, 2, 0)))
