#!/usr/bin/env python3
"""Round-2 lab 9: cast-free windowed kernels on the NATIVE u8 packing.

Lab 8 inverted the round-1 cost model for this build: lane rolls and plain
ALU ops are nearly free (2-4 us full-height) while dtype-width casts and
vreg-UNALIGNED sublane slices are the expensive ops (~30 us each) — the
widen+narrow pair alone is 66 us of erosion's 146. So the fastest kernels
never leave the native (4,1) byte packing:

  - erosion: SWAR byte-min on the i32 bitcast words (14 cheap word-ops per
    min, 4 pixels/lane, ZERO casts). Round 1 rejected this on an op-count
    model that priced ALU at 25 us/op; at the measured 1-2 us/quarter-op it
    wins outright.
  - convs: E/O 16-bit-field split (3 masks) for the MACs, straddle combos
    for odd vertical taps, SWAR round-half-up, byte recombine — no widen,
    no narrow. Lab 6's E/O conv lost because every output slice sat at
    word offset q0=2, a vreg-unaligned slice per use; here the band DMA
    lands 32 rows (8 words) into VMEM so the output slice is ALIGNED.

Layout change under test: DMA_SLACK 16 -> 64 (window reaches 32 rows above
each band; monkeypatched here, promoted to utils/image.py if this wins).
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/benchmarks/", 1)[0])

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from dip_benchmark_tpu import oracle, spec  # noqa: E402
from dip_benchmark_tpu.ops.pallas import build_ops  # noqa: E402
from dip_benchmark_tpu.ops.pallas.window import (  # noqa: E402
    _shift, factor_rank1_int)
from dip_benchmark_tpu.runtime.cache import enable_compilation_cache  # noqa: E402
from dip_benchmark_tpu.utils import image as image_mod  # noqa: E402
from dip_benchmark_tpu.utils.image import load_image, to_planar_padded  # noqa: E402

from kernel_lab7 import exec_time2  # noqa: E402

H8 = np.int32(np.uint32(0x80808080).view(np.int32))   # byte sign bits
L7 = np.int32(0x7F7F7F7F)
EO = np.int32(0x00FF00FF)

LAND = 32        # DMA lands this many rows into VMEM (8 words: vreg-aligned)
Q0 = LAND // 4   # word row of each band's first output row


def windowed32(layout, body, mask_args=()):
    """Variant of window._windowed_call with a 32-row-aligned landing:
    the window covers padded rows [i*band - 32, i*band + band + 32) and the
    band's first output row sits at VMEM word row Q0 (vreg-aligned, so
    E/O output slices need no relayout). Requires DMA_SLACK >= 2*LAND."""
    c, hp, wp = layout.shape
    band = layout.band
    blen = band + 2 * LAND
    nb = layout.banded_height // band
    total = c * nb
    assert hp >= layout.banded_height + LAND, "needs DMA_SLACK >= 64"
    n_mask = len(mask_args)

    def kernel(*refs):
        in_hbm = refs[0]
        mask_refs = refs[1:1 + n_mask]
        out_ref = refs[1 + n_mask]
        x_vmem, sem = refs[2 + n_mask:]
        ch = pl.program_id(0)
        i = pl.program_id(1)
        step = ch * nb + i

        def dma0(slot, cc):
            return pltpu.make_async_copy(
                in_hbm.at[cc, pl.ds(0, blen - LAND), :],
                x_vmem.at[slot, pl.ds(LAND, blen - LAND)], sem.at[slot])

        def dma(slot, cc, ii):
            return pltpu.make_async_copy(
                in_hbm.at[cc, pl.ds(pl.multiple_of(ii * band - LAND, 8),
                                    blen), :],
                x_vmem.at[slot], sem.at[slot])

        def start(slot, ss):
            cc, ii = ss // nb, ss % nb

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
            dma0(step % 2, ch).wait()

        @pl.when(i > 0)
        def _():
            dma(step % 2, ch, i).wait()

        body(x_vmem[step % 2], out_ref, *mask_refs)

    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    in_specs += [pl.BlockSpec(memory_space=pltpu.SMEM)] * n_mask

    @jax.jit
    def op(planar):
        return pl.pallas_call(
            kernel,
            grid=(c, nb),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, band, wp), lambda ch, i: (ch, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((c, hp, wp), jnp.uint8),
            scratch_shapes=[pltpu.VMEM((2, blen, wp), jnp.uint8),
                            pltpu.SemaphoreType.DMA((2,))],
        )(planar, *mask_args)

    return op


def bmin(x, y):
    """Per-byte unsigned min of two i32 words (4 bytes each), 14 word-ops.
    Borrow-free compare: t = (x|H) - (y&~H) has bit7 per byte = (xl >= yl)
    on the low 7 bits; the sign bits are patched via e7 = (x^y)&H."""
    xy = x ^ y
    e7 = xy & H8
    t = (x | H8) - (y & L7)
    c = ((x & e7) | (t & ~e7)) & H8
    m = jax.lax.shift_right_logical(c, 7) * np.int32(255)
    return x ^ (xy & m)


def shift_bytes_up(w, w_next):
    """Byte k of result = byte k+1 of the 4-row column (row r+1)."""
    return jax.lax.shift_right_logical(w, 8) | (w_next << 24)


def shift_bytes_dn(w, w_prev):
    """Byte k of result = row r-1."""
    return (w << 8) | jax.lax.shift_right_logical(w_prev, 24)


def make_erosion_swar(layout, taps):
    """Structure-aware SWAR byte-min erosion for rect/plus 3x3 taps."""
    dys = sorted({dy for dy, _ in taps})
    dxs = sorted({dx for _, dx in taps})
    assert dys == [-1, 0, 1] and dxs == [-1, 0, 1]
    from dip_benchmark_tpu.ops.pallas.window import _tap_structure
    structure = _tap_structure(taps)
    band = layout.band
    qb = band // 4

    def body(xw, out_ref, *_):
        v = pltpu.bitcast(xw, jnp.int32)      # (blen/4, wp)
        if structure == "rect":
            rm = bmin(bmin(_shift(v, -1), v), _shift(v, 1))
        else:  # plus: horizontal taps apply to the center row only
            rm = v
        c = rm[Q0:Q0 + qb]
        nxt = rm[Q0 + 1:Q0 + 1 + qb]
        prv = rm[Q0 - 1:Q0 - 1 + qb]
        up = shift_bytes_up(c, nxt)
        dn = shift_bytes_dn(c, prv)
        acc = bmin(bmin(up, c), dn)
        if structure == "plus":
            mid = v[Q0:Q0 + qb]
            acc = bmin(acc, bmin(_shift(mid, -1), _shift(mid, 1)))
        out_ref[0] = pltpu.bitcast(acc, jnp.uint8)

    return windowed32(layout, body)


def _eo_split(v):
    e = v & EO
    o = jax.lax.shift_right_logical(v, 8) & EO
    return e, o


def _combo(a, b):
    """Fields (a.hi, b.lo): rows (4s+2+k) from arrays holding (4s+k)."""
    return jax.lax.shift_right_logical(a, 16) | (b << 16)


def _swar_round(acc, shift, half):
    t = acc + np.int32(half * 0x00010001)
    return jax.lax.shift_right_logical(t, shift) & np.int32(
        (0xFFFF >> shift) * 0x00010001)


def make_conv_rank1_eo32(layout, kh, kw, shift, int_mask):
    """Rank-1 factored conv on E/O fields, aligned landing, runtime SMEM
    factors (u at [0, kh), v at [kh, kh+kw))."""
    uv = factor_rank1_int(int_mask)
    assert uv is not None and 255 * int(int_mask.sum()) < (1 << 16)
    hx = kw // 2
    band = layout.band
    qb = band // 4
    half = 1 << (shift - 1)
    mask_flat = np.concatenate(uv).astype(np.int32)

    def body(xw, out_ref, mask_ref):
        v = pltpu.bitcast(xw, jnp.int32)
        E, O = _eo_split(v)

        def rowsum(p):
            acc = None
            for kx in range(kw):
                t = _shift(p, kx - hx) * mask_ref[kh + kx]
                acc = t if acc is None else acc + t
            return acc

        RE, RO = rowsum(E), rowsum(O)
        # Center + neighbor word slices (center aligned; +-1 unaligned).
        REc, ROc = RE[Q0:Q0 + qb], RO[Q0:Q0 + qb]
        REp, ROp = RE[Q0 - 1:Q0 - 1 + qb], RO[Q0 - 1:Q0 - 1 + qb]
        REn, ROn = RE[Q0 + 1:Q0 + 1 + qb], RO[Q0 + 1:Q0 + 1 + qb]
        combos = {}

        def pair(off, dy):
            """Packed rows (4s+off+dy, 4s+2+off+dy) for out word s."""
            d = off + dy
            q, r = divmod(d, 4)
            assert q in (-1, 0) or (q == 0 and r == 0), (off, dy)
            if r == 0:
                return (REp, REc, REn)[q + 1]
            if r == 1:
                return (ROp, ROc, ROn)[q + 1]
            key = (q, r)
            if key not in combos:
                if r == 2:
                    a, b = (REp, REc) if q == -1 else (REc, REn)
                else:
                    a, b = (ROp, ROc) if q == -1 else (ROc, ROn)
                combos[key] = _combo(a, b)
            return combos[key]

        outs = []
        for off in (0, 1):
            acc = None
            for i, dy in enumerate(range(-(kh // 2), kh // 2 + 1)):
                t = pair(off, dy) * mask_ref[i]
                acc = t if acc is None else acc + t
            outs.append(_swar_round(acc, shift, half))
        w = outs[0] | (outs[1] << 8)
        out_ref[0] = pltpu.bitcast(w, jnp.uint8)

    return windowed32(layout, body, mask_args=(mask_flat,))


def make_blur3x3_eo32(layout):
    """Compile-time 1-2-1 blur on E/O fields, aligned landing."""
    band = layout.band
    qb = band // 4

    def body(xw, out_ref, *_):
        v = pltpu.bitcast(xw, jnp.int32)
        E, O = _eo_split(v)
        RE = _shift(E, -1) + (E << 1) + _shift(E, 1)
        RO = _shift(O, -1) + (O << 1) + _shift(O, 1)
        REc, ROc = RE[Q0:Q0 + qb], RO[Q0:Q0 + qb]
        up_o = _combo(RO[Q0 - 1:Q0 - 1 + qb], ROc)   # rows (4s-1, 4s+1)
        dn_e = _combo(REc, RE[Q0 + 1:Q0 + 1 + qb])   # rows (4s+2, 4s+4)
        acc0 = up_o + (REc << 1) + ROc               # out rows (4s, 4s+2)
        acc1 = REc + (ROc << 1) + dn_e               # out rows (4s+1, 4s+3)
        w = _swar_round(acc0, 4, 8) | (_swar_round(acc1, 4, 8) << 8)
        out_ref[0] = pltpu.bitcast(w, jnp.uint8)

    return windowed32(layout, body)


def make_eo_identity32(layout):
    """Split + recombine + ALIGNED output slice (skeleton + E/O overhead)."""
    band = layout.band
    qb = band // 4

    def body(xw, out_ref, *_):
        v = pltpu.bitcast(xw, jnp.int32)
        e, o = _eo_split(v)
        w = (e | (o << 8))[Q0:Q0 + qb]
        out_ref[0] = pltpu.bitcast(w, jnp.uint8)

    return windowed32(layout, body)


def main():
    enable_compilation_cache()
    # Extended slack so the 32-row-aligned landing stays in bounds.
    image_mod.DMA_SLACK = 64
    image = load_image("/root/reference/assets/fundus.jpg")
    layout = image_mod.make_layout(*image.shape[:2])
    print(f"layout: {layout.shape}, band {layout.band}")
    planar = jax.device_put(to_planar_padded(image, layout))
    ops = build_ops(layout)  # shipped kernels on the same layout

    candidates = {
        "eo identity (aligned)": (make_eo_identity32(layout), None),
        "erosion-square SWAR": (make_erosion_swar(
            layout, tuple((dy, dx) for dy in (-1, 0, 1)
                          for dx in (-1, 0, 1))), "Erosion-3x3-Square"),
        "erosion-cross SWAR": (make_erosion_swar(
            layout, ((-1, 0), (0, -1), (0, 0), (0, 1), (1, 0))),
            "Erosion-3x3-Cross"),
        "conv3x3 rank1-eo32": (make_conv_rank1_eo32(
            layout, 3, 3, spec.BLUR_3X3_SHIFT, spec.BLUR_3X3_INT),
            "Convolution-3x3"),
        "conv5x5 rank1-eo32": (make_conv_rank1_eo32(
            layout, 5, 5, spec.BLUR_5X5_SHIFT, spec.BLUR_5X5_INT),
            "Convolution-5x5"),
        "blur3x3 eo32": (make_blur3x3_eo32(layout), "Gaussian-Blur-3x3"),
        "SHIPPED ero-square": (ops["Erosion-3x3-Square"],
                               "Erosion-3x3-Square"),
        "SHIPPED conv3x3": (ops["Convolution-3x3"], "Convolution-3x3"),
        "SHIPPED conv5x5": (ops["Convolution-5x5"], "Convolution-5x5"),
        "SHIPPED blur3x3": (ops["Gaussian-Blur-3x3"], "Gaussian-Blur-3x3"),
    }
    py, px = layout.pad_y, layout.pad_x
    h, w = image.shape[:2]

    live = {}
    for name, (fn, col) in candidates.items():
        try:
            out = np.asarray(jax.block_until_ready(fn(planar)))
        except Exception as e:  # noqa: BLE001
            print(f"  {name:26s} COMPILE FAIL — "
                  f"{str(e).splitlines()[0][:100]}")
            continue
        if col is None:
            live[name] = fn
            print(f"  {name:26s} (identity)")
            continue
        got = np.transpose(out[:, py:py + h, px:px + w], (1, 2, 0))
        ok = np.array_equal(got, oracle.IMAGE_OPS[col](image))
        print(f"  {name:26s} exact={ok}")
        if ok:
            live[name] = fn
        else:
            d = got.astype(int) - oracle.IMAGE_OPS[col](image).astype(int)
            print(f"    max|d|={np.abs(d).max()} npx={(d != 0).sum()}")

    print("chained-K execution (med us / min us), 2 rounds:")
    for rnd in range(2):
        for name, fn in live.items():
            med, lo = exec_time2(fn, planar)
            print(f"  [{rnd}] {name:26s} {med * 1e6:8.1f} / {lo * 1e6:8.1f}")


if __name__ == "__main__":
    main()
