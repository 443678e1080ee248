"""Windowed-op Pallas kernels: erosion, convolution, specialized blur.

These replace the reference's hand-written window kernels
[sycl/benchmark.cpp:116-252, cuda/benchmark.jl:45-133]. TPU-first design:

- Grid over (channel, row-band); each step DMAs its band plus halo rows from
  the HBM-resident padded image into VMEM scratch (the Pallas analogue of the
  16x16 GPU thread-block tiling, SURVEY.md §2.2 'parallelism component'),
  then computes the band as pure shift-reduce: rows by sublane slicing, cols
  by lane rolls. Mirror borders are pre-baked in the padding, so there is no
  per-pixel boundary branching anywhere.
- Roll wrap-around garbage only ever lands in columns < hx or >= Wp-hx,
  which lie outside the valid region (pad_x >= hx), so full-width rolls are
  safe — no masked stores needed.
- Convolution is exact integer arithmetic: acc = sum(w_int * px), then
  (acc + half) >> shift (round-half-up), bit-identical to the reference's
  float path (see spec module docstring). All arithmetic is in int32: this
  Mosaic target legalizes only load/store/bitwise/casts on 8-bit vectors and
  aborts on int16 sub/shift/roll, so kernels widen u8 -> i32 at the VMEM
  boundary and narrow back at the store; HBM traffic stays uint8.
- Separable ops are FUSED: the 1xN pass runs over band+halo rows in VMEM and
  the Nx1 pass consumes it in-register — one HBM round-trip instead of the
  reference's two dispatches through an aux buffer [sycl/benchmark.cpp:341-356],
  while remaining bit-exact (the intermediate is held as exact small ints,
  and the baked mirror rows reproduce the aux re-mirroring of the two-pass
  scheme because all masks are symmetric).
- Generic convolutions take mask values at RUNTIME via SMEM scalars
  (mirroring the reference's runtime-mask kernels); gaussian_blur_3x3 bakes
  the 1-2-1 weights at compile time and factors them separably — the
  specialization op #14 exists to measure [SURVEY.md §2.1 op 14].
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ... import spec
from ...utils import image as image_mod
from ...utils.image import PlanarLayout
from .common import interpret_mode


def _windowed_call(layout: PlanarLayout, hy: int, body,
                   mask_args: tuple[np.ndarray, ...] = (),
                   band: int | None = None, dtype=jnp.uint8,
                   raw_window: bool = False, fused_channels: bool = False,
                   batch: int = 0):
    """Shared skeleton: double-buffered band DMA, then
    body(x, out_ref, *mask_refs) where x is a (band + 2*hy, Wp) halo window;
    bodies slice rows [k, k + band) for tap k in [0, 2*hy].

    fused_channels=True: grid over bands only; each step DMAs ALL C
    channels of the band window and the body's signature changes to
    body(x, write, *mask_refs) with x of shape (C, band + 2*hy, Wp) and
    write(ch, row_slice, val) storing into the (C, band, Wp) output block
    — for cross-channel bodies (the flagship pipeline, grayscale-leading
    chains). batch=B additionally prepends a batch grid axis over a
    (B, C, Hp, Wp) stack, one image per grid row — the serving path
    (jax.vmap cannot batch the ANY-memory-space input ref, so batching is
    a grid axis; models/pipeline.py). Same DMA invariants everywhere.

    SHAPE-PRESERVING (round 2): output has the SAME padded (Hp, Wp) shape
    and coordinates as the input — out row j holds the op result for padded
    row j. Band i computes padded rows [i*band, i*band + band), reading
    taps from the DMA window of padded rows [i*band - 8, i*band + band + 8)
    (Mosaic constrains HBM DMA slices to 8-row tiles; band 0's window
    cannot reach above row 0, so its DMA lands at VMEM offset 8 and the
    stale rows beneath corrupt only output rows < hy — which lie in the
    [0, pad_y) mirror-halo region the crop never reads). Because windowed
    ops map the padded layout to itself:
      - the exec-timing chain (runtime/exec_timing.py) composes ops
        directly — no dynamic_update_slice re-insert per iteration;
      - outputs carry op-consistent mirror halos (an op applied to mirror
        rows IS the mirror of the op, in[p-j] == in[p+j] within the baked
        margin), so ops compose with halo validity shrinking by hy per
        application — PROVIDED the accumulated radius stays within
        banded_height - (pad_y + height) rows of bottom slack: rows
        [banded_height, Hp) of the output are never written (junk,
        outside every crop), so once the shrinking validity frontier
        reaches them, further composed applications read junk into their
        bottom rows. The exec-timing chain doesn't care (outputs are
        discarded); the resident models never rely on this (they
        re-mirror halos from valid rows every application:
        parallel/halo.refresh_resident_halo, models/wide.refresh_cols). The NEXT band's DMA is issued before waiting on
    the current one, so the HBM read pipeline overlaps compute (Pallas
    already double-buffers the output writes).
    """
    c, hp, wp = layout.shape
    if band is None:
        band = layout.band
    else:
        # Per-op override for VMEM-heavy bodies: must preserve the DMA
        # window invariants (8-row tiles, in-bounds within padded_height).
        assert band % 8 == 0 and layout.banded_height % band == 0
    assert not (batch and not fused_channels), "batch needs fused_channels"
    blen = band + image_mod.DMA_SLACK
    nb = layout.banded_height // band
    nbatch = max(batch, 1)
    total = nbatch * nb if fused_channels else c * nb
    assert hy <= 8 and layout.pad_y >= hy
    assert hp >= layout.banded_height + 8  # last band's window tail
    n_mask = len(mask_args)
    base = 8 - hy  # in-window row of tap -hy for the band's first output row

    def kernel(*refs):
        in_hbm = refs[0]
        mask_refs = refs[1:1 + n_mask]
        out_ref = refs[1 + n_mask]
        x_vmem, sem = refs[2 + n_mask:]
        if fused_channels and batch:
            bi, i = pl.program_id(0), pl.program_id(1)
            step = bi * nb + i
        elif fused_channels:
            i = pl.program_id(0)
            step = i
        else:
            ch = pl.program_id(0)
            i = pl.program_id(1)
            step = ch * nb + i

        def src(cc, rows):
            if fused_channels and batch:
                return in_hbm.at[cc, :, rows, :]  # cc = batch index
            if fused_channels:
                return in_hbm.at[:, rows, :]
            return in_hbm.at[cc, rows, :]

        def dst0(slot):
            return (x_vmem.at[slot, :, pl.ds(8, blen - 8)] if fused_channels
                    else x_vmem.at[slot, pl.ds(8, blen - 8)])

        def dma0(slot, cc):
            # Band 0: window rows [0, 8) would be padded rows [-8, 0);
            # land the copy at VMEM offset 8, leave stale rows below.
            return pltpu.make_async_copy(
                src(cc, pl.ds(0, blen - 8)), dst0(slot), sem.at[slot])

        def dma(slot, cc, ii):  # ii >= 1
            return pltpu.make_async_copy(
                src(cc, pl.ds(pl.multiple_of(ii * band - 8, 8), blen)),
                x_vmem.at[slot], sem.at[slot])

        def step_cc(ss):
            # the DMA's major index: batch image (fused+batch), channel
            # (per-channel mode), or nothing (fused single-image)
            return 0 if (fused_channels and not batch) else ss // nb

        def start(slot, ss):
            cc, ii = step_cc(ss), ss % nb

            @pl.when(ii == 0)
            def _():
                dma0(slot, cc).start()

            @pl.when(ii > 0)
            def _():
                dma(slot, cc, ii).start()

        @pl.when(step == 0)
        def _():
            start(0, 0)

        @pl.when(step + 1 < total)
        def _():
            start((step + 1) % 2, step + 1)

        @pl.when(i == 0)
        def _():
            dma0(step % 2, step_cc(step)).wait()

        @pl.when(i > 0)
        def _():
            dma(step % 2, step_cc(step), i).wait()

        if raw_window:
            # Body gets the full (blen, Wp) window (4-row-packing aligned
            # at its start, for native-u8 bitcast tricks) and slices taps
            # itself at [base + k : base + k + band].
            body(x_vmem[step % 2], out_ref, *mask_refs)
        elif fused_channels:
            x = x_vmem[step % 2][:, base:base + band + 2 * hy]

            if batch:
                def write(chn, sl, val):
                    out_ref[0, chn, sl] = val
            else:
                def write(chn, sl, val):
                    out_ref[chn, sl] = val
            body(x, write, *mask_refs)
        else:
            # Slice the window down to exactly band + 2*hy rows so bodies
            # index taps as [k : k + band] for k in [0, 2*hy].
            x = x_vmem[step % 2][base:base + band + 2 * hy]
            body(x, out_ref, *mask_refs)

    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    in_specs += [pl.BlockSpec(memory_space=pltpu.SMEM)] * n_mask
    if fused_channels and batch:
        grid = (batch, nb)
        out_specs = pl.BlockSpec((1, c, band, wp),
                                 lambda bi, i: (bi, 0, i, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((batch, c, hp, wp), dtype)
        scratch = pltpu.VMEM((2, c, blen, wp), dtype)
    elif fused_channels:
        grid = (nb,)
        out_specs = pl.BlockSpec((c, band, wp), lambda i: (0, i, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((c, hp, wp), dtype)
        scratch = pltpu.VMEM((2, c, blen, wp), dtype)
    else:
        grid = (c, nb)
        out_specs = pl.BlockSpec((1, band, wp), lambda ch, i: (ch, i, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((c, hp, wp), dtype)
        scratch = pltpu.VMEM((2, blen, wp), dtype)

    @jax.jit
    def op(planar: jax.Array) -> jax.Array:
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[scratch,
                            pltpu.SemaphoreType.DMA((2,))],
            interpret=interpret_mode(),
        )(planar, *mask_args)

    return op


def _divisor_band(layout: PlanarLayout, factor: int) -> int:
    """Largest multiple of 8 that divides banded_height and is <= band/factor."""
    target = max(8, (layout.band // factor) // 8 * 8)
    for b in range(target, 7, -8):
        if layout.banded_height % b == 0:
            return b
    return 8


def _shift(v: jax.Array, dx: int) -> jax.Array:
    """out[..., x] = v[..., x + dx] (full-width lane roll; wrap cols are
    outside the valid region by construction)."""
    if dx == 0:
        return v
    size = v.shape[-1]
    return pltpu.roll(v, (-dx) % size, axis=v.ndim - 1)


# ---------------------------------------------------------------------------
# Erosion (min-reduce). Geometry is compile-time specialized per op, like the
# reference's per-mask dispatches. Structure detection picks the cheapest
# exact formulation (measured on hardware, benchmarks/tuning/kernel_lab*.py):
#   rectangle  -> separable row-min then col-min (4 mins for 3x3 square,
#                 2.3x faster than the 9-tap reduce: 344 -> 150 us/image)
#   plus-shape -> column-min + lane-shifted center row (4 mins for the cross)
#   generic    -> per-tap min reduce (any structuring element)
# ---------------------------------------------------------------------------

def _tap_structure(taps: tuple[tuple[int, int], ...]) -> str:
    s = set(taps)
    dys = sorted({dy for dy, _ in taps})
    dxs = sorted({dx for _, dx in taps})
    if s == {(dy, dx) for dy in dys for dx in dxs}:
        return "rect"
    if (0, 0) in s and s == {(dy, 0) for dy in dys} | {(0, dx) for dx in dxs}:
        return "plus"
    return "generic"


def _make_morphology(layout: PlanarLayout, taps: tuple[tuple[int, int], ...],
                     reduce):
    """Shared structure-aware builder: reduce is jnp.minimum (erosion) or
    jnp.maximum (dilation)."""
    hy = max(abs(dy) for dy, _ in taps)
    hx = max(abs(dx) for _, dx in taps)
    if hy > layout.pad_y or hx > layout.pad_x:
        # _shift's full-width lane roll only stays outside the valid
        # region when taps fit the baked halo; a wider element would
        # silently corrupt valid edge columns/rows.
        raise ValueError(
            f"structuring element radius (ry={hy}, rx={hx}) exceeds the "
            f"layout halo (pad_y={layout.pad_y}, pad_x={layout.pad_x}); "
            f"build the layout with halo={max(hy, hx)}")
    band = layout.band
    structure = _tap_structure(taps)
    dys = sorted({dy for dy, _ in taps})
    dxs = sorted({dx for _, dx in taps})

    def body_rect(x_vmem, out_ref, *_):
        # Column reduce FIRST (pure row slices), then lane rolls on the
        # (band, wp) column-reduced value: measured ~20% faster than
        # rolling the full (band + 2*hy, wp) window before reducing
        # (kernel_lab6: erosion-square 143-145 -> 112-121 us).
        v = x_vmem[:, :].astype(jnp.int32)  # (band + 2*hy, wp)
        cm = None
        for dy in dys:
            t = v[dy + hy:dy + hy + band]
            cm = t if cm is None else reduce(cm, t)
        acc = None
        for dx in dxs:
            t = _shift(cm, dx)
            acc = t if acc is None else reduce(acc, t)
        out_ref[0] = acc.astype(jnp.uint8)

    def body_plus(x_vmem, out_ref, *_):
        v = x_vmem[:, :].astype(jnp.int32)
        mid = v[hy:hy + band]
        acc = None
        for dy in dys:  # the dx == 0 column, slices only
            t = v[dy + hy:dy + hy + band]
            acc = t if acc is None else reduce(acc, t)
        for dx in dxs:
            if dx == 0:
                continue  # (0, 0) already covered by the dy loop
            acc = reduce(acc, _shift(mid, dx))
        out_ref[0] = acc.astype(jnp.uint8)

    def body_generic(x_vmem, out_ref, *_):
        by_dy: dict[int, list[int]] = {}
        for dy, dx in taps:
            by_dy.setdefault(dy, []).append(dx)
        acc = None
        for dy, dxs_ in sorted(by_dy.items()):
            v = x_vmem[dy + hy:dy + hy + band, :].astype(jnp.int32)
            for dx in sorted(dxs_):
                t = _shift(v, dx)
                acc = t if acc is None else reduce(acc, t)
        out_ref[0] = acc.astype(jnp.uint8)

    body = {"rect": body_rect, "plus": body_plus,
            "generic": body_generic}[structure]
    return _windowed_call(layout, hy, body)


def make_erosion(layout: PlanarLayout, taps: tuple[tuple[int, int], ...]):
    return _make_morphology(layout, taps, jnp.minimum)


def mask_to_taps(mask: np.ndarray) -> tuple[tuple[int, int], ...]:
    mh, mw = mask.shape
    return tuple((my - mh // 2, mx - mw // 2)
                 for my in range(mh) for mx in range(mw) if mask[my, mx])


def make_dilation(layout: PlanarLayout, taps: tuple[tuple[int, int], ...]):
    """Max-morphology counterpart of make_erosion (the reference defines
    but never benchmarks dilation, opencv/benchmark.py:80-82) — the shared
    structure-aware builder with max in place of min. NOTE: the baked halo
    is the spec's mirror border, so dilation here uses mirror borders like
    every op in this framework (documented deviation from OpenCV's
    erode/dilate default border for the unused helper surface)."""
    return _make_morphology(layout, taps, jnp.maximum)


def make_erosion_separated_fused(layout: PlanarLayout):
    """1x3 then 3x1 min, fused through VMEM (two-pass bit-exact: min is
    idempotent/associative and the baked mirror rows reproduce the aux
    re-mirroring). Pass order is swapped in-kernel (3x1 column min first,
    then the 1x3 lane rolls — exact: the passes commute), the same ~20%
    col-first win as body_rect (kernel_lab6)."""
    hy = 1
    band = layout.band

    def body(x_vmem, out_ref, *_):
        v = x_vmem[:, :].astype(jnp.int32)  # (band + 2, wp)
        cm = jnp.minimum(jnp.minimum(v[0:band], v[1:band + 1]),
                         v[2:band + 2])
        out_ref[0] = jnp.minimum(
            jnp.minimum(_shift(cm, -1), cm),
            _shift(cm, 1)).astype(jnp.uint8)

    return _windowed_call(layout, hy, body)


# ---------------------------------------------------------------------------
# Convolution (integer MAC, runtime mask values in SMEM).
#
# Packed-16 formulation (the default whenever exact): two output rows share
# one i32 lane as independent 16-bit fields (lo = rows [0, band/2), hi =
# rows [band/2, band)), so every roll/multiply/add processes two rows per
# vector op — measured 1.6x on the dense 3x3 (303 -> 187 us/image,
# benchmarks/tuning/kernel_lab4.py). Exactness: every field value is bounded
# by 255 * sum(mask) < 2^16 (checked at build time), fields are nonnegative,
# and no VPU op carries across bit 16; the hi field may reach the i32 sign
# bit, which is harmless modulo 2^32 as long as extraction uses a LOGICAL
# right shift. Falls back to the plain i32 body for masks where the bound
# fails (negative or large-sum masks).
# ---------------------------------------------------------------------------

def _packable(int_mask: np.ndarray) -> bool:
    return bool((int_mask >= 0).all()) and 255 * int(int_mask.sum()) < (1 << 16)


def swar_requant(shift: int, max_field: int):
    """THE cross-field-carry proof: in-place round-half-up of both 16-bit
    fields of a packed i32 accumulator with one add/shift/mask. Exact iff
    the rounding add cannot carry across the field boundary — asserted
    here, the single place the bound lives (used by _packed_quantizer and
    models/chain.py's packed stages)."""
    half = 1 << (shift - 1)
    assert max_field + half < (1 << 16), "SWAR rounding would carry"
    half2 = half * 0x00010001
    rmask2 = (0xFFFF >> shift) * 0x00010001

    def requant(acc):
        return jax.lax.shift_right_logical(acc + half2, shift) & rmask2

    return requant


def _packed_quantizer(int_mask: np.ndarray, shift: int):
    """(requant, store): the shared round-half-up + narrow logic for every
    packed-16 RUNTIME-mask body, so the cross-field-carry proof lives once.

    requant(acc) rounds both 16-bit fields of the i32 accumulator in place
    and returns the still-packed u8-valued fields; store(acc, out_ref, hb,
    band) requants and writes the two output halves. The SWAR fast path
    (one add/shift/mask for both fields, kernel_lab8) is exact when no
    clamp is needed AND the rounding add cannot carry across the field
    boundary: 255 * sum(mask) + half < 2^16. Masks that can leave [0, 255]
    (negative or large-sum) take the per-field extract+clamp path instead.
    The compile-time-specialized blur/pipeline kernels keep constant-folded
    copies of the SWAR sequence by design (op #14 measures specialization).
    """
    half = 1 << (shift - 1)
    lo_clip = bool((int_mask < 0).any())
    hi_clip = ((255 * int(int_mask.clip(min=0).sum()) + half) >> shift) > 255
    swar = (not (lo_clip or hi_clip)
            and 255 * int(int_mask.sum()) + half < (1 << 16))
    fast = swar_requant(shift, 255 * int(int_mask.sum())) if swar else None

    def clamp(vals):
        return jnp.clip(vals, 0, 255) if (lo_clip or hi_clip) else vals

    def requant(acc):
        if swar:
            return fast(acc)
        lo = clamp(((acc & 0xFFFF) + half) >> shift)
        hi = clamp((jax.lax.shift_right_logical(acc, 16) + half) >> shift)
        return lo + (hi << 16)

    def store(acc, out_ref, hb, band):
        t = requant(acc)
        out_ref[0, 0:hb] = t.astype(jnp.uint8)  # low byte = lo field (<=255)
        out_ref[0, hb:band] = jax.lax.shift_right_logical(
            t, 16).astype(jnp.uint8)

    return requant, store, clamp


def factor_rank1_int(int_mask: np.ndarray):
    """(u, v) integer factors with mask == outer(u, v) exactly, or None.

    A rank-1 integer mask lets the dense correlation run as an UNROUNDED
    row-MAC followed by a col-MAC with one final rounding — bit-identical
    to the kh*kw-tap dense form (integer arithmetic is associative;
    round-half-up applied once either way), at kh+kw MACs instead of
    kh*kw. Both Gaussian masks factor ([1,2,1] and [1,4,6,4,1] profiles).
    """
    m = int_mask.astype(np.int64)
    if (m < 0).any() or m.sum() == 0:
        return None
    r = next((row for row in m if row.any()), None)
    if r is None:
        return None
    g = np.gcd.reduce(r[r != 0]) if (r != 0).any() else 1
    v = r // g
    u = []
    for row in m:
        nz = v != 0
        if not nz.any():
            return None
        q, rem = np.divmod(row[nz], v[nz])
        if rem.any() or not (q == q[0]).all() or not (row[~nz] == 0).all():
            return None
        u.append(int(q[0]))
    u = np.array(u, dtype=np.int64)
    if not (np.outer(u, v) == m).all():
        return None
    return u.astype(np.int32), v.astype(np.int32)


def make_convolution(layout: PlanarLayout, kh: int, kw: int, shift: int,
                     int_mask: np.ndarray, acc_dtype=None):
    """Dense kh x kw correlation; mask values are a runtime SMEM argument
    (the reference's runtime-mask kernel, sycl/benchmark.cpp:159-202)."""
    assert int_mask.shape == (kh, kw)
    hy, hx = kh // 2, kw // 2
    assert hx <= layout.pad_x
    # The unrolled 5x5 body keeps several i32 temps live; shrink the band
    # so its VMEM stack fits the 16 MB budget (packing halves temp heights,
    # so the packed body affords a larger band than the legacy one).
    # An explicit accumulator dtype opts out of packing (packed bodies are
    # i32-only by construction; honoring the caller's wider/narrower choice
    # means taking the plain path).
    packed = acc_dtype is None and _packable(int_mask)
    uv = factor_rank1_int(int_mask) if packed else None
    if packed and kh * kw == 25:
        # Measured band sweep (kernel_lab10): the 5x5 bodies keep enough
        # live temps that a LARGER band amortizes better (198 -> ~176 us);
        # layouts at effective band 224 and 336 measure the same (lab10:
        # 177-178 us) — the win is "bigger than 112", not the specific
        # 336. 3x3-class bodies are flat in band, erosion slightly
        # prefers 112. The pick lives in utils/image.conv5_effective_band
        # (shared with the VMEM envelope model) and is capped by the
        # measured VMEM budget: the divisibility depends on image height,
        # so an uncapped upsize could exceed the envelope make_layout
        # guaranteed at layout.band (round-5 advisor finding).
        band = image_mod.conv5_effective_band(layout, itemsize=1)
    elif kh * kw <= 9 or (packed and kh * kw <= 25):
        band = layout.band  # packed halves temp heights: full band fits
    else:
        band = _divisor_band(layout, 2 if packed else 4)
    acc_dtype = acc_dtype or jnp.int32
    mask_flat = int_mask.astype(np.int32).reshape(-1)
    half = 1 << (shift - 1)
    hb = band // 2
    w_rows = hb + 2 * hy
    # Shared round/clamp/narrow logic (one carry proof): _packed_quantizer.
    # Clamps only fire when the mask can actually leave [0, 255] (the
    # benchmark's Gaussian masks sum to exactly 1<<shift, so for them both
    # clamps are statically provable no-ops and the SWAR path is taken —
    # kernel_lab8, conv3x3 128 -> 123 us measured).
    _, _pq_store, _pq_clamp = _packed_quantizer(int_mask, shift)

    def quantize(vals):
        return _pq_clamp(vals).astype(jnp.uint8)

    def store_packed(acc, out_ref):
        """Round + narrow both packed fields to the two output halves."""
        _pq_store(acc, out_ref, hb, band)

    def body_rank1(x_vmem, out_ref, mask_ref):
        # Rank-1 factoring (factor_rank1_int docstring): unrounded row-MAC
        # with the v profile, col-MAC with the u profile, ONE final
        # round-half-up — bit-identical to the dense form, kh+kw MACs.
        # Factor values stay runtime SMEM scalars (u at [0, kh), v at
        # [kh, kh+kw)). Field bound: rowsum <= 255*sum(v), colsum <=
        # 255*sum(mask) < 2^16 — the same packed-16 exactness proof.
        # Measured: 3x3 141 -> 117 us, 5x5 300 -> 215 us (kernel_lab5).
        lo = x_vmem[0:w_rows, :].astype(jnp.int32)
        hi = x_vmem[hb:hb + w_rows, :].astype(jnp.int32)
        p = lo + (hi << 16)
        rowsum = None
        for kx in range(kw):
            t = _shift(p, kx - hx) * mask_ref[kh + kx]
            rowsum = t if rowsum is None else rowsum + t
        acc = None
        for ky in range(kh):
            t = rowsum[ky:ky + hb, :] * mask_ref[ky]
            acc = t if acc is None else acc + t
        store_packed(acc, out_ref)

    def body_packed(x_vmem, out_ref, mask_ref):
        # Column-sums first (row slices, no rolls), then ONE lane roll per
        # mask column: kh*kw MACs + kw rolls instead of kh*kw rolls — rolls
        # are the most expensive VPU op in the loop (kernel_lab2 data).
        rows = [None] * kh
        acc = None
        for kx in range(kw):
            col = None
            for ky in range(kh):
                if rows[ky] is None:
                    lo = x_vmem[ky:ky + hb, :].astype(jnp.int32)
                    hi = x_vmem[hb + ky:hb + ky + hb, :].astype(jnp.int32)
                    rows[ky] = lo + (hi << 16)
                t = rows[ky] * mask_ref[ky * kw + kx]
                col = t if col is None else col + t
            col = _shift(col, kx - hx)
            acc = col if acc is None else acc + col
        store_packed(acc, out_ref)

    def body_i32(x_vmem, out_ref, mask_ref):
        rows = [None] * kh
        acc = None
        for kx in range(kw):
            col = None
            for ky in range(kh):
                if rows[ky] is None:
                    rows[ky] = x_vmem[ky:ky + band, :].astype(acc_dtype)
                t = rows[ky] * mask_ref[ky * kw + kx]
                col = t if col is None else col + t
            col = _shift(col, kx - hx)
            acc = col if acc is None else acc + col
        out_ref[0] = quantize((acc + half) >> shift)

    if uv is not None:
        body = body_rank1
        mask_flat = np.concatenate(uv).astype(np.int32)
    elif packed:
        body = body_packed
    else:
        body = body_i32
    return _windowed_call(layout, hy, body, mask_args=(mask_flat,),
                          band=band)


def make_convolution_separated_fused(layout: PlanarLayout, n: int,
                                     row_mask: np.ndarray, shift: int):
    """1xN pass then Nx1 pass fused in VMEM, runtime mask values.

    Bit-exact vs the reference's two dispatches: the intermediate is the
    exact pass-1 uint8 value held in int32 (pass 1 result is in [0,255]), and
    baked mirror rows reproduce the aux re-mirroring (masks are symmetric).
    [reference: sycl/benchmark.cpp:347-356, opencv/benchmark.py:84-90]

    Packed-16 (see make_convolution): halves overlap here — lo covers window
    rows [0, band/2 + 2*hy), hi covers [band/2, band + 2*hy) — so pass 2's
    row slices [ky, ky + band/2) read the right window rows for both output
    halves. The pass-1 field quantization extracts, shifts, and repacks.
    """
    hy = n // 2
    assert hy <= layout.pad_y and hy <= layout.pad_x
    band = layout.band
    mask_flat = row_mask.astype(np.int32).reshape(-1)
    half = 1 << (shift - 1)
    packed = _packable(row_mask)
    hb = band // 2
    w_rows = hb + 2 * hy
    # Shared per-pass round/clamp logic (one carry proof, SWAR fast path
    # when both benchmark row masks qualify): _packed_quantizer.
    _pq_requant, _pq_store, _pq_clamp = _packed_quantizer(row_mask, shift)

    def clamp(vals):  # pass-1 intermediate: exact u8 range held in i32
        return _pq_clamp(vals)

    def quantize(vals):
        return clamp(vals).astype(jnp.uint8)

    def body_packed(x_vmem, out_ref, mask_ref):
        lo = x_vmem[0:w_rows, :].astype(jnp.int32)
        hi = x_vmem[hb:hb + w_rows, :].astype(jnp.int32)
        v = lo + (hi << 16)
        aux = None
        for kx in range(n):
            w = mask_ref[kx]
            t = _shift(v, kx - hy) * w
            aux = t if aux is None else aux + t
        # pass-1 u8 quantization per field (packing preserved)
        aux = _pq_requant(aux)
        acc = None
        for ky in range(n):
            w = mask_ref[ky]
            t = aux[ky:ky + hb, :] * w
            acc = t if acc is None else acc + t
        _pq_store(acc, out_ref, hb, band)

    def body_i32(x_vmem, out_ref, mask_ref):
        v = x_vmem[:, :].astype(jnp.int32)  # (band + 2*hy, wp)
        aux = None
        for kx in range(n):
            w = mask_ref[kx]
            t = _shift(v, kx - hy) * w
            aux = t if aux is None else aux + t
        aux = clamp((aux + half) >> shift)  # exact pass-1 u8 values
        acc = None
        for ky in range(n):
            w = mask_ref[ky]
            t = aux[ky:ky + band, :] * w
            acc = t if acc is None else acc + t
        out_ref[0] = quantize((acc + half) >> shift)

    body = body_packed if packed else body_i32
    return _windowed_call(layout, hy, body, mask_args=(mask_flat,))


def make_gaussian_blur_3x3(layout: PlanarLayout):
    """Op #14: compile-time-specialized 3x3 blur. Weights are immediates and
    the binomial mask is factored separably IN-REGISTER (exact: integer sums
    are associative), so this runs 6 MACs/px instead of 9 — the
    specialization benefit the op exists to measure. Packed-16 with
    overlapping halves (fields <= 4*1020 + 8 < 2^16, exact).
    [reference: sycl/benchmark.cpp:204-252, cuda/benchmark.jl:105-133]
    """
    hy = 1
    band = layout.band
    hb = band // 2
    w_rows = hb + 2

    def body(x_vmem, out_ref, *_):
        lo = x_vmem[0:w_rows, :].astype(jnp.int32)
        hi = x_vmem[hb:hb + w_rows, :].astype(jnp.int32)
        v = lo + (hi << 16)
        # Vertical 1-2-1 pass FIRST: its row slices need no lane rolls, so
        # the horizontal pass rolls a computed i32 value. If the rolls
        # touched the bare widened input, Mosaic would hoist them onto the
        # uint8 source and fail with 'Rotate with non-32-bit data'.
        aux = v[0:hb] + (v[1:hb + 1] << 1) + v[2:hb + 2]  # fields <= 1020
        o = _shift(aux, -1) + (aux << 1) + _shift(aux, 1)  # fields <= 4088
        # SWAR round-half-up of both fields at once (4088 + 8 < 2^16).
        t = jax.lax.shift_right_logical(o + 0x00080008, 4) & 0x0FFF0FFF
        out_ref[0, 0:hb] = t.astype(jnp.uint8)
        out_ref[0, hb:band] = jax.lax.shift_right_logical(
            t, 16).astype(jnp.uint8)

    return _windowed_call(layout, hy, body)
