"""Generic op-chain fusion: ANY sequence of benchmark ops as ONE kernel.

`make_fused_chain(layout, cols)` compiles an arbitrary sequence of the
14-op matrix's on-device ops into a single Pallas kernel: one HBM read of
the band (+ the chain's total halo), every stage in VMEM/registers, one
HBM write. Running k ops separately costs k HBM round-trips plus k times
the ~39 us fixed vreg-path floor (DESIGN.md §2c); a fused chain pays both
once — each extra stage costs only its ALU.

This generalizes the hand-built flagship pipeline (models/pipeline.py,
which additionally exploits threshold's binary output; the generic chain
keeps every stage's full-domain form). Constraints, all checked at build
time:

- Total chain radius (sum of stage radii) <= layout.pad_y/pad_x. The
  default layout halo is 2 (sized for the 5x5 benchmark ops); bake a
  deeper chain's input with `make_layout(h, w, halo=R)` for total radius
  R, up to 8 — the banded DMA window reaches exactly 8 rows beyond the
  band (DMA_SLACK), and roll garbage propagates one column per
  horizontal tap. E.g. halo=4 fuses four 3x3 windowed stages or one 5x5
  + two 3x3, plus any number of point stages.
- "Grayscale" may appear only FIRST (it is cross-channel; everything
  after it runs once on the luma plane and is replicated to 3 channels
  at the store, which is cheaper than per-channel).
- Bit-exactness vs running the ops sequentially (each with fresh mirror
  borders on its input) holds because every benchmark mask/structuring
  element is symmetric: a symmetric stage applied to baked mirror rows
  IS the mirror of the stage, so in-VMEM halo propagation reproduces the
  standalone per-op border semantics (same argument as the fused
  separables, ops/pallas/window.py docstring). Asserted per stage.
- Mask VALUES are baked as compile-time immediates (like the specialized
  gaussian_blur_3x3) — a chain is a compiled model, not a runtime-mask
  benchmark op.

Stage algebra (i32 values in [0, 255] throughout, 1 px/lane):
point ops map rows->rows; a windowed stage with radius (ry, rx) consumes
ry rows each side (slices) and rx columns of halo validity (rolls).
Separated convolutions contribute their two per-pass-quantized stages;
Erosion-1x3+3x1 == Erosion-3x3-Square exactly (min separability), and
Gaussian-Blur-3x3 == Convolution-3x3 exactly (same mask, op #14 differs
only in specialization) — the chain uses the fused forms.
[reference: the op semantics being chained are sycl/benchmark.cpp:54-252]
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .. import spec
from ..ops.pallas.window import (_shift, _windowed_call, factor_rank1_int,
                                 mask_to_taps, swar_requant)
from ..utils.image import PlanarLayout


class _Stage:
    """fn: plain-i32 form (1 px/lane). pfn: packed-16 form (two u8-valued
    16-bit fields per i32 lane, the shipped conv kernels' density) or None
    when the op has no exact packed form (erosion: per-field min would
    cost more than the packing saves, DESIGN.md §2c). Chains with any
    packed MAC stage run packed, routing pfn-less stages through an
    unpack -> per-half i32 -> repack island — measured 1.3-2.8x on
    MAC-bearing chains (chain_lab.py)."""
    __slots__ = ("ry", "rx", "fn", "pfn")

    def __init__(self, ry, rx, fn, pfn=None):
        self.ry, self.rx, self.fn, self.pfn = ry, rx, fn, pfn


def _point(fn, pfn=None):
    return [_Stage(0, 0, lambda v, rows: fn(v),
                   None if pfn is None else (lambda v, rows: pfn(v)))]


def _erosion(taps):
    dys = sorted({dy for dy, _ in taps})
    dxs = sorted({dx for _, dx in taps})
    ry = max(abs(d) for d in dys)
    rx = max(abs(d) for d in dxs)
    rect = {(dy, dx) for dy in dys for dx in dxs} == set(taps)

    def fn(v, rows):
        if rect:  # separable row-min then col-min (col-first, lab6)
            cm = None
            for dy in dys:
                t = v[dy + ry:dy + ry + rows]
                cm = t if cm is None else jnp.minimum(cm, t)
            acc = None
            for dx in dxs:
                t = _shift(cm, dx)
                acc = t if acc is None else jnp.minimum(acc, t)
            return acc
        acc = None
        for dy, dx in sorted(taps):
            t = _shift(v[dy + ry:dy + ry + rows], dx)
            acc = t if acc is None else jnp.minimum(acc, t)
        return acc

    return [_Stage(ry, rx, fn)]


def _conv_rank1(int_mask: np.ndarray, shift: int):
    """Dense conv as unrounded col-MAC + row-MAC + one round — exact
    (factor_rank1_int docstring). Weights become immediates."""
    uv = factor_rank1_int(int_mask)
    assert uv is not None, "chain conv stages need a rank-1 mask"
    u, v = (x.tolist() for x in uv)
    assert u == u[::-1] and v == v[::-1], "chain stages must be symmetric"
    ry, rx = len(u) // 2, len(v) // 2
    half = 1 << (shift - 1)
    requant = swar_requant(shift, 255 * int(int_mask.sum()))

    def mac(val, rows):
        col = None
        for ky, w in enumerate(u):
            t = val[ky:ky + rows] * np.int32(w)
            col = t if col is None else col + t
        acc = None
        for kx, w in enumerate(v):
            t = _shift(col, kx - rx) * np.int32(w)
            acc = t if acc is None else acc + t
        return acc

    def fn(val, rows):
        return (mac(val, rows) + half) >> shift

    def pfn(val, rows):
        # packed fields: col sums <= 255*sum(u), acc <= 255*sum(mask),
        # both < 2^16 for the benchmark masks (asserted above) — the same
        # exactness proof as ops/pallas/window.body_rank1.
        return requant(mac(val, rows))

    return [_Stage(ry, rx, fn, pfn)]


def _conv_separated(row_mask: np.ndarray, shift: int):
    """The 1xN + Nx1 op's two per-pass-quantized stages (matching the
    benchmark op's intermediate u8 quantization exactly)."""
    w = row_mask.reshape(-1).tolist()
    assert w == w[::-1], "chain stages must be symmetric"
    r = len(w) // 2
    half = 1 << (shift - 1)

    requant = swar_requant(shift, 255 * int(row_mask.sum()))

    def hmac(val):
        acc = None
        for kx, wk in enumerate(w):
            # multiply BEFORE rolling (commutes): keeps the roll's input a
            # computed i32 value even when this is the chain's first stage
            # (Mosaic can hoist a roll through the u8->i32 widen into an
            # unsupported 8-bit rotate — see make_gaussian_blur_3x3).
            t = _shift(val * np.int32(wk), kx - r)
            acc = t if acc is None else acc + t
        return acc

    def vmac(val, rows):
        acc = None
        for ky, wk in enumerate(w):
            t = val[ky:ky + rows] * np.int32(wk)
            acc = t if acc is None else acc + t
        return acc

    return [_Stage(0, r, lambda v, rows: (hmac(v) + half) >> shift,
                   lambda v, rows: requant(hmac(v))),
            _Stage(r, 0, lambda v, rows: (vmac(v, rows) + half) >> shift,
                   lambda v, rows: requant(vmac(v, rows)))]


def _stages_for(col: str) -> list[_Stage]:
    if col == "Copy":
        return _point(lambda v: v, lambda v: v)
    if col == "Inversion":
        # packed: 255 - f per field; fields <= 255 so no cross-field borrow
        return _point(lambda v: 255 - v,
                      lambda v: np.int32(0x00FF00FF) - v)
    if col == "Threshold":
        # packed: f > 127 <=> bit 7 of the u8-valued field; extract both
        # fields' bit 7 and scale to 255 (the SWAR threshold trick at
        # 16-bit field granularity, ops/pallas/point.py)
        return _point(
            lambda v: jnp.where(
                v > spec.THRESHOLD_VALUE, spec.THRESHOLD_MAX, 0),
            lambda v: (jax.lax.shift_right_logical(v, 7)
                       & np.int32(0x00010001)) * np.int32(255))
    if col == "Erosion-3x3-Cross":
        return _erosion(mask_to_taps(spec.CROSS_MASK_3X3))
    if col in ("Erosion-3x3-Square", "Erosion-1x3+3x1-Square"):
        # min separability: the 1x3+3x1 two-pass op IS the 3x3 square.
        return _erosion(mask_to_taps(spec.SQUARE_MASK_3X3))
    if col in ("Convolution-3x3", "Gaussian-Blur-3x3"):
        # op #14 shares Convolution-3x3's semantics (it measures
        # specialization, which the chain does anyway: baked immediates).
        return _conv_rank1(spec.BLUR_3X3_INT, spec.BLUR_3X3_SHIFT)
    if col == "Convolution-5x5":
        return _conv_rank1(spec.BLUR_5X5_INT, spec.BLUR_5X5_SHIFT)
    if col == "Convolution-1x3+3x1":
        return _conv_separated(spec.BLUR_1X3_INT, spec.BLUR_SEP3_SHIFT)
    if col == "Convolution-1x5+5x1":
        return _conv_separated(spec.BLUR_1X5_INT, spec.BLUR_SEP5_SHIFT)
    raise ValueError(f"op not fusable in a chain: {col!r}")


def _conv_rank1_f32(int_mask: np.ndarray, shift: int):
    """f32-model dense conv stage: column-sums then lane-shifted column
    accumulation, the shared f32 order (oracle_f32.convolution)."""
    fmask = spec.mask_float(int_mask, shift)
    kh, kw = fmask.shape
    ry, rx = kh // 2, kw // 2

    def fn(val, rows):
        acc = None
        for kx in range(kw):
            col = None
            for ky in range(kh):
                t = val[ky:ky + rows] * jnp.float32(fmask[ky, kx])
                col = t if col is None else col + t
            col = _shift(col, kx - rx)
            acc = col if acc is None else acc + col
        return acc

    return [_Stage(ry, rx, fn)]


def _conv_separated_f32(row_mask: np.ndarray, shift: int):
    """f32-model separated conv: two MAC stages, f32 intermediate (the f32
    model has no per-pass quantization — oracle_f32 chains raw floats)."""
    fm = spec.mask_float(row_mask, shift).reshape(-1)
    n = len(fm)
    r = n // 2

    def hfn(val, rows):
        acc = None
        for kx in range(n):
            # multiply before rolling (commutes; same rationale as the
            # uint8 _conv_separated stages)
            t = _shift(val * jnp.float32(fm[kx]), kx - r)
            acc = t if acc is None else acc + t
        return acc

    def vfn(val, rows):
        acc = None
        for ky in range(n):
            t = val[ky:ky + rows] * jnp.float32(fm[ky])
            acc = t if acc is None else acc + t
        return acc

    return [_Stage(0, r, hfn), _Stage(r, 0, vfn)]


def _stages_for_f32(col: str) -> list[_Stage]:
    """f32-model [0,1] stage forms (CUDA.jl-parity data model). Erosion
    stages reuse the integer path's builders — min is dtype-generic."""
    if col == "Copy":
        return _point(lambda v: v)
    if col == "Inversion":
        return _point(lambda v: jnp.float32(1.0) - v)
    if col == "Threshold":
        return _point(lambda v: jnp.where(v > jnp.float32(0.5),
                                          jnp.float32(1.0), jnp.float32(0.0)))
    if col == "Erosion-3x3-Cross":
        return _erosion(mask_to_taps(spec.CROSS_MASK_3X3))
    if col in ("Erosion-3x3-Square", "Erosion-1x3+3x1-Square"):
        return _erosion(mask_to_taps(spec.SQUARE_MASK_3X3))
    if col in ("Convolution-3x3", "Gaussian-Blur-3x3"):
        return _conv_rank1_f32(spec.BLUR_3X3_INT, spec.BLUR_3X3_SHIFT)
    if col == "Convolution-5x5":
        return _conv_rank1_f32(spec.BLUR_5X5_INT, spec.BLUR_5X5_SHIFT)
    if col == "Convolution-1x3+3x1":
        return _conv_separated_f32(spec.BLUR_1X3_INT, spec.BLUR_SEP3_SHIFT)
    if col == "Convolution-1x5+5x1":
        return _conv_separated_f32(spec.BLUR_1X5_INT, spec.BLUR_SEP5_SHIFT)
    raise ValueError(f"op not fusable in a chain: {col!r}")


def _chain_stages(cols: list[str],
                  stages_for=_stages_for) -> tuple[bool, list[_Stage]]:
    # User-facing build-time validation raises ValueError (not assert:
    # `python -O` strips asserts, and CLI callers rely on these firing).
    if not cols:
        raise ValueError("empty chain")
    gray_first = cols[0] == "Grayscale"
    rest = cols[1:] if gray_first else cols
    if "Grayscale" in rest:
        raise ValueError("Grayscale may appear only as the first stage "
                         "of a fused chain (it is cross-channel)")
    stages: list[_Stage] = []
    for col in rest:
        stages.extend(stages_for(col))
    return gray_first, stages


def chain_radius(cols: list[str]) -> tuple[int, int]:
    """(ry, rx): the chain's total vertical/horizontal radius — the halo
    the input layout must be baked with (make_layout(h, w, halo=...))."""
    _, stages = _chain_stages(cols)
    return sum(s.ry for s in stages), sum(s.rx for s in stages)


def chain_row_parts(cols: list[str], dtype: str = "uint8"):
    """(description, csv_column, sequential_oracle) for a benchmark-table
    chain row — shared by the single-device and sharded sessions. The
    csv_column embeds the chain spec so each chain row verifies against
    ITS OWN sequential oracle (two chain rows in one table must not share
    an oracle key); non-matrix columns are ignored by the CSV writer.
    dtype "float32": the oracle chains the f32-model ops with the raw f32
    intermediate (no per-op quantization — the f32 device array never
    leaves the device between sequential ops either)."""
    desc = "Fused Chain (" + "+".join(
        c.replace("Convolution-", "Conv").replace("Erosion-", "Ero")
        for c in cols) + ")"
    col = "Fused-Chain(" + "+".join(cols) + ")"

    if dtype == "float32":
        def seq_oracle(im, _cols=tuple(cols)):
            from .. import oracle_f32
            x = oracle_f32.from_uint8_hwc(im)
            mask = None
            for i, c in enumerate(_cols):
                if c == "Threshold" and i > 0:
                    # Threshold on a COMPUTED f32 value: pixels within
                    # ulps of the 0.5 step may flip between association
                    # orders — exempt them from the bit-level check
                    # (oracle_f32.uint8_verify_ops has the full argument).
                    m = oracle_f32.near_threshold_mask(x)
                    mask = m if mask is None else (mask | m)
                x = oracle_f32.IMAGE_OPS_F32[c](x)
            out = oracle_f32.to_uint8_hwc(x)
            if mask is not None and mask.any():
                ry, rx = chain_radius(list(_cols))
                mask = oracle_f32.dilate_mask(mask, ry, rx)
                return out, np.broadcast_to(mask[..., None], out.shape)
            return out
    else:
        def seq_oracle(im, _cols=tuple(cols)):
            from .. import oracle
            for c in _cols:
                im = oracle.IMAGE_OPS[c](im)
            return im

    return desc, col, seq_oracle


def check_chain(cols: list[str]) -> tuple[int, int]:
    """Full up-front validation: fusability and stage order (via
    chain_radius/_chain_stages) plus the banded-DMA-window radius bound —
    the deepest halo any layout can carry (DMA_SLACK rows of window
    overreach, split across both sides). Raises ValueError with a
    descriptive message; returns (ry, rx)."""
    from ..utils import image as image_util
    ry, rx = chain_radius(cols)
    bound = image_util.DMA_SLACK // 2
    if max(ry, rx) > bound:
        raise ValueError(
            f"chain radius (ry={ry}, rx={rx}) exceeds the banded DMA "
            f"window bound ({bound}); shorten the chain")
    return ry, rx


def make_fused_chain(layout: PlanarLayout, cols: list[str],
                     batch: int = 0):
    """One Pallas kernel applying `cols` in order over the planar padded
    image; shape-preserving (C, Hp, Wp) -> (C, Hp, Wp) like every windowed
    op. cols may start with "Grayscale" (cross-channel; handled by the
    flagship-pipeline-style 3-channel kernel). batch=B serves a
    (B, C, Hp, Wp) stack in one dispatch (leading batch grid axis, the
    models/pipeline.py serving scheme); per-channel chains then run
    channel-looped inside the fused-channels body — same total work,
    batched dispatch."""
    gray_first, stages = _chain_stages(cols)
    hy = sum(s.ry for s in stages)
    hx = sum(s.rx for s in stages)
    if hy > layout.pad_y or hx > layout.pad_x:
        raise ValueError(
            f"chain radius (ry={hy}, rx={hx}) exceeds the layout halo "
            f"({layout.pad_y}); shorten the chain or enlarge the halo")
    from ..utils import image as image_util
    # Budget-capped like the flagship pipeline: multi-stage fused bodies
    # hold more live VMEM than the single-op envelope model admits near
    # the width boundary (fused_effective_band == layout.band at every
    # published geometry). Per-channel non-batched chains window one
    # channel; fused-channels paths window all three.
    band = image_util.fused_effective_band(
        layout, channels=3 if (gray_first or batch) else 1)
    # Packed pays off when any MAC stage can run at 2 rows/lane; a stage
    # with no packed form (erosion) runs as an unpack -> per-half i32 ->
    # repack island, costing ~4 cheap word-ops and nothing on the stage
    # itself (each half carries its own halo rows, so fn applies per half
    # unchanged). An all-erosion chain skips packing entirely.
    packed = any(s.pfn is not None and (s.ry or s.rx) for s in stages)
    ph = band // 2

    def run_stages(v):
        rows = band + 2 * hy
        for s in stages:
            rows -= 2 * s.ry
            v = s.fn(v, rows)
        return v

    def run_stages_packed(p):
        # p: two u8-valued 16-bit fields per lane — lo = output rows
        # [0, ph), hi = [ph, band), halves' windows overlapping by the
        # remaining halo (the shipped packed conv scheme). Every stage
        # requants to u8-valued fields, so packing safety holds at every
        # stage boundary.
        rows = ph + 2 * hy
        for s in stages:
            rows -= 2 * s.ry
            if s.pfn is not None:
                p = s.pfn(p, rows)
            else:
                lo = p & np.int32(0xFFFF)
                hi = jax.lax.shift_right_logical(p, 16)
                p = s.fn(lo, rows) + (s.fn(hi, rows) << 16)
        return p

    def pack(v):  # v: (band + 2*hy, :) i32 rows
        w_rows = ph + 2 * hy
        return v[0:w_rows] + (v[ph:ph + w_rows] << 16)

    def chan_packed(xc):
        # one channel's window rows -> packed chain -> (lo, hi) u8 halves
        w_rows = ph + 2 * hy
        lo = xc[0:w_rows, :].astype(jnp.int32)
        hi = xc[ph:ph + w_rows, :].astype(jnp.int32)
        p = run_stages_packed(lo + (hi << 16))
        return p.astype(jnp.uint8), jax.lax.shift_right_logical(
            p, 16).astype(jnp.uint8)

    if not gray_first and not batch:
        if packed:
            def body(x_vmem, out_ref, *_):
                lo, hi = chan_packed(x_vmem)
                out_ref[0, 0:ph] = lo
                out_ref[0, ph:band] = hi
        else:
            def body(x_vmem, out_ref, *_):
                v = x_vmem[:, :].astype(jnp.int32)
                out_ref[0] = run_stages(v).astype(jnp.uint8)

        return _windowed_call(layout, hy, body, band=band)

    if not gray_first:
        # Batched per-channel chain: fused-channels body, channels looped
        # in-kernel (same total work as the per-channel grid).
        if packed:
            def body(x, write, *_):
                for ch in range(layout.channels):
                    lo, hi = chan_packed(x[ch])
                    write(ch, slice(0, ph), lo)
                    write(ch, slice(ph, band), hi)
        else:
            def body(x, write, *_):
                for ch in range(layout.channels):
                    v = x[ch].astype(jnp.int32)
                    write(ch, slice(None), run_stages(v).astype(jnp.uint8))
        return _windowed_call(layout, hy, body, band=band,
                              fused_channels=True, batch=batch)

    # Grayscale-first: 3-channel window, luma once, single-plane chain,
    # replicate at the store (the dedicated 3-channel kernel below).
    if packed:
        def run_from_luma(luma):  # (band + 2*hy, :) i32, u8-valued
            return run_stages_packed(pack(luma))
        return _make_gray_chain(layout, hy, run_from_luma,
                                packed_store=(ph, band), batch=batch,
                                band=band)
    return _make_gray_chain(layout, hy, run_stages, batch=batch, band=band)


def make_fused_chain_f32(layout: PlanarLayout, cols: list[str],
                         batch: int = 0):
    """The f32-model (--dtype float32) fused chain: ONE Pallas kernel
    applying `cols` in order on the planar f32 [0,1] layout. Same stage
    algebra and halo-propagation argument as the uint8 chain; no packing
    (f32 is 1 px/lane natively) and no per-stage quantization (the f32
    model chains raw floats, like sequentially applied f32 ops whose
    intermediate stays on device). Shape-preserving (C, Hp, Wp) f32 ->
    (C, Hp, Wp) f32."""
    gray_first, stages = _chain_stages(cols, _stages_for_f32)
    hy = sum(s.ry for s in stages)
    hx = sum(s.rx for s in stages)
    if hy > layout.pad_y or hx > layout.pad_x:
        raise ValueError(
            f"chain radius (ry={hy}, rx={hx}) exceeds the layout halo "
            f"({layout.pad_y}); shorten the chain or enlarge the halo")
    from ..ops.pallas.window import _divisor_band
    from ..utils import image as image_util
    # Halved for the 4-byte windows AND budget-capped, exactly like the
    # f32 flagship pipeline (ops/pallas/f32._make_pipeline) and the uint8
    # chain above — multi-stage fused bodies escape the single-op
    # envelope model near the width boundary.
    band = image_util.fused_effective_band(
        layout, itemsize=4, channels=3 if (gray_first or batch) else 1,
        start=_divisor_band(layout, 2))

    def run_stages(v):
        rows = band + 2 * hy
        for s in stages:
            rows -= 2 * s.ry
            v = s.fn(v, rows)
        return v

    if not gray_first and not batch:
        def body(x_vmem, out_ref, *_):
            out_ref[0] = run_stages(x_vmem[:, :])
        return _windowed_call(layout, hy, body, band=band,
                              dtype=jnp.float32)

    if not gray_first:
        def body(x, write, *_):
            for ch in range(layout.channels):
                write(ch, slice(None), run_stages(x[ch]))
        return _windowed_call(layout, hy, body, band=band,
                              dtype=jnp.float32, fused_channels=True,
                              batch=batch)

    def gray_body(x, write, *_):
        wr, wg, wb = (jnp.float32(w) for w in spec.GRAYSCALE_WEIGHTS_RGB)
        out = run_stages(wr * x[0] + wg * x[1] + wb * x[2])
        for ch in range(layout.channels):
            write(ch, slice(None), out)
    return _windowed_call(layout, hy, gray_body, band=band,
                          dtype=jnp.float32, fused_channels=True,
                          batch=batch)


def _make_gray_chain(layout: PlanarLayout, hy: int, run_stages,
                     packed_store: tuple[int, int] | None = None,
                     batch: int = 0, band: int | None = None):
    """Cross-channel kernel via _windowed_call(fused_channels=True): DMA
    all 3 channels of the band window, compute the exact fixed-point luma,
    run the remaining stages once on the luma plane, write it to all 3
    output channels. packed_store=(ph, band): run_stages returns a
    packed-16 value whose fields are the two output halves."""
    assert layout.channels == 3

    def body(x, write, *_):
        r = x[0].astype(jnp.int32)
        g = x[1].astype(jnp.int32)
        b = x[2].astype(jnp.int32)
        lw_r, lw_g, lw_b = spec.GRAYSCALE_WEIGHTS_INT_RGB
        luma = (lw_r * r + lw_g * g + lw_b * b) >> spec.GRAYSCALE_SHIFT
        res = run_stages(luma)
        if packed_store is not None:
            ph, band_ = packed_store
            lo = res.astype(jnp.uint8)
            hi = jax.lax.shift_right_logical(res, 16).astype(jnp.uint8)
            for ch in range(3):
                write(ch, slice(0, ph), lo)
                write(ch, slice(ph, band_), hi)
        else:
            out = res.astype(jnp.uint8)
            for ch in range(3):
                write(ch, slice(None), out)

    return _windowed_call(layout, hy, body, band=band, fused_channels=True,
                          batch=batch)
