#!/usr/bin/env python3
"""Round-2 lab 6: even/odd byte-split packing for the windowed kernels.

The native u8 VMEM tiling packs FOUR consecutive rows per 32-bit register
(little-endian; bitcast exposes it). Splitting that word with two masks

    E = v & 0x00FF00FF          # 16-bit fields (row 4s,   row 4s+2)
    O = (v >> 8) & 0x00FF00FF   # 16-bit fields (row 4s+1, row 4s+3)

yields packed-16 data in 3 quarter-height ops — versus the round-1 manual
packing (two u8->i32 widens + shift + add at half height) — and the output
recombines bytes with shifts/ors instead of field extraction + narrowing.
All arithmetic fields stay < 2^16 exactly as in the packed-16 proof
(window.py docstring); vertical taps at odd offsets cross the E/O arrays
via 3-op field combos, and the d=+-1 taps are FREE (they ARE the other
array).

Measures, oracle-checked then chained-K timed:
  infra     — DMA-in + write-out only (the windowed skeleton floor)
  pack16    — round-1 pack + unpack identity (no MACs)
  eo-split  — E/O split + byte recombine identity (no MACs)
  conv3/5 rank1-eo — the factored convs on E/O packing
  blur3-eo  — specialized const-weight blur on E/O packing
  erosion   — BASE vs qroll vs col-first (re-measure; lab5's BASE
              marginal returned 0.0 once, relay noise)
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/benchmarks/", 1)[0])

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from dip_benchmark_tpu import oracle, spec  # noqa: E402
from dip_benchmark_tpu.ops.pallas import build_ops  # noqa: E402
from dip_benchmark_tpu.ops.pallas.window import (  # noqa: E402
    _shift, _windowed_call)
from dip_benchmark_tpu.runtime.exec_timing import execution_time  # noqa: E402
from dip_benchmark_tpu.utils.image import (  # noqa: E402
    load_image, make_layout, to_planar_padded)

try:
    from kernel_lab5 import factor_rank1_int, make_erosion_square_qroll
except ImportError:  # run as a script from elsewhere
    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from kernel_lab5 import factor_rank1_int, make_erosion_square_qroll

MASK_EO = 0x00FF00FF


def make_infra_probe(layout):
    """DMA in, write the band out unchanged (u8 copy through VMEM)."""
    hy = 1
    band = layout.band

    def body(x, out_ref, *_):
        out_ref[0] = x[hy:hy + band]

    return _windowed_call(layout, hy, body)


def make_pack16_identity(layout):
    """Round-1 pack (widen+shift+add) + unpack (mask/shift + narrow)."""
    hy = 1
    band = layout.band
    hb = band // 2

    def body(x, out_ref, *_):
        lo = x[hy:hy + hb, :].astype(jnp.int32)
        hi = x[hy + hb:hy + band, :].astype(jnp.int32)
        p = lo + (hi << 16)
        out_ref[0, 0:hb] = (p & 0xFFFF).astype(jnp.uint8)
        out_ref[0, hb:band] = jax.lax.shift_right_logical(
            p, 16).astype(jnp.uint8)

    return _windowed_call(layout, hy, body)


def make_eo_identity(layout):
    """E/O split + byte recombine identity (no arithmetic)."""
    hy = 1
    band = layout.band
    qb = band // 4
    q0 = 8 // 4  # window quarter-row of the band's first output row

    def body(xw, out_ref, *_):
        v = pltpu.bitcast(xw, jnp.int32)  # (blen/4, wp)
        e = v & MASK_EO
        o = jax.lax.shift_right_logical(v, 8) & MASK_EO
        w = (e | (o << 8))[q0:q0 + qb]
        out_ref[0] = pltpu.bitcast(w, jnp.uint8)

    return _windowed_call(layout, hy, body, raw_window=True)


def _eo_split(xw):
    v = pltpu.bitcast(xw, jnp.int32)
    e = v & MASK_EO
    o = jax.lax.shift_right_logical(v, 8) & MASK_EO
    return e, o


def _combo(a, b):
    """(a.hi, b.lo) fields: rows (4s+2+k) from the pair holding (4s+k)."""
    return jax.lax.shift_right_logical(a, 16) | ((b & 0xFFFF) << 16)


def make_conv_rank1_eo(layout, kh, kw, shift, int_mask):
    """Rank-1 factored dense conv on E/O packing. Bit-identical to the
    dense form (unrounded row-MAC, col-MAC, single round-half-up)."""
    uv = factor_rank1_int(int_mask)
    assert uv is not None and 255 * int(int_mask.sum()) < (1 << 16)
    u, v = uv
    hy, hx = kh // 2, kw // 2
    band = layout.band
    qb = band // 4
    q0 = 8 // 4
    half = 1 << (shift - 1)
    mask_flat = np.concatenate([u, v]).astype(np.int32)

    def body(xw, out_ref, mask_ref):
        E, O = _eo_split(xw)

        def rowsum(p):
            acc = None
            for kx in range(kw):
                t = _shift(p, kx - hx) * mask_ref[kh + kx]
                acc = t if acc is None else acc + t
            return acc

        RE, RO = rowsum(E), rowsum(O)

        def pair(d, s):
            """Packed (R[4s+d], R[4s+2+d]) at quarter-sublane s + offset."""
            q, r = divmod(d, 4)
            base = RE if r in (0, 2) else RO
            if r in (0, 1):
                return base[q0 + q + s:q0 + q + s + qb]
            # r in (2, 3): fields straddle: (base[s].hi, base[s+1].lo)
            return _combo(base[q0 + q + s:q0 + q + s + qb],
                          base[q0 + q + s + 1:q0 + q + s + 1 + qb])

        def colsum(off):  # off 0 -> rows (4s, 4s+2); off 1 -> (4s+1, 4s+3)
            acc = None
            for ky in range(kh):
                t = pair(off + ky - hy, 0) * mask_ref[ky]
                acc = t if acc is None else acc + t
            return acc

        eo_out = []
        for off in (0, 1):
            acc = colsum(off)
            r_lo = ((acc & 0xFFFF) + half) >> shift
            r_hi = (jax.lax.shift_right_logical(acc, 16) + half) >> shift
            eo_out.append(r_lo | (r_hi << 16))
        w = eo_out[0] | (eo_out[1] << 8)
        out_ref[0] = pltpu.bitcast(w, jnp.uint8)

    return _windowed_call(layout, hy, body, mask_args=(mask_flat,),
                          raw_window=True)


def make_blur3_eo(layout):
    """Specialized const-weight 1-2-1 blur on E/O packing (op #14)."""
    hy = 1
    band = layout.band
    qb = band // 4
    q0 = 8 // 4

    def body(xw, out_ref, *_):
        E, O = _eo_split(xw)
        RE = _shift(E, -1) + (E << 1) + _shift(E, 1)
        RO = _shift(O, -1) + (O << 1) + _shift(O, 1)

        def pair(d):
            q, r = divmod(d, 4)
            base = RE if r in (0, 2) else RO
            if r in (0, 1):
                return base[q0 + q:q0 + q + qb]
            return _combo(base[q0 + q:q0 + q + qb],
                          base[q0 + q + 1:q0 + q + 1 + qb])

        outs = []
        for off in (0, 1):
            acc = pair(off - 1) + (pair(off) << 1) + pair(off + 1)
            r_lo = ((acc & 0xFFFF) + 8) >> 4
            r_hi = (jax.lax.shift_right_logical(acc, 16) + 8) >> 4
            outs.append(r_lo | (r_hi << 16))
        w = outs[0] | (outs[1] << 8)
        out_ref[0] = pltpu.bitcast(w, jnp.uint8)

    return _windowed_call(layout, hy, body, raw_window=True)


def make_erosion_square_colfirst(layout):
    """Column-min first (slices on the widened window), then lane rolls on
    the (band, wp) result — rolls touch 2 fewer rows than the rect body."""
    hy = 1
    band = layout.band

    def body(x, out_ref, *_):
        v = x[:, :].astype(jnp.int32)  # (band + 2, wp)
        cm = jnp.minimum(jnp.minimum(v[0:band], v[1:band + 1]),
                         v[2:band + 2])
        out = jnp.minimum(jnp.minimum(_shift(cm, -1), cm), _shift(cm, 1))
        out_ref[0] = out.astype(jnp.uint8)

    return _windowed_call(layout, hy, body)


def main():
    image = load_image("/root/reference/assets/fundus.jpg")
    layout = make_layout(*image.shape[:2])
    planar = jax.device_put(to_planar_padded(image, layout))
    ops = build_ops(layout)

    candidates = {
        "infra (copy-through)": (make_infra_probe(layout), "Copy"),
        "pack16 identity": (make_pack16_identity(layout), "Copy"),
        "eo-split identity": (make_eo_identity(layout), "Copy"),
        "conv3x3 rank1-eo": (make_conv_rank1_eo(
            layout, 3, 3, spec.BLUR_3X3_SHIFT, spec.BLUR_3X3_INT),
            "Convolution-3x3"),
        "conv5x5 rank1-eo": (make_conv_rank1_eo(
            layout, 5, 5, spec.BLUR_5X5_SHIFT, spec.BLUR_5X5_INT),
            "Convolution-5x5"),
        "blur3x3 eo": (make_blur3_eo(layout), "Gaussian-Blur-3x3"),
        "erosion BASE": (ops["Erosion-3x3-Square"], "Erosion-3x3-Square"),
        "erosion qroll": (make_erosion_square_qroll(layout),
                          "Erosion-3x3-Square"),
        "erosion col-first": (make_erosion_square_colfirst(layout),
                              "Erosion-3x3-Square"),
    }
    py, px = layout.pad_y, layout.pad_x
    h, w = image.shape[:2]
    golden = {c: oracle.IMAGE_OPS[c](image)
              for c in {c for _, c in candidates.values()}}

    live = {}
    for name, (fn, col) in candidates.items():
        out = np.asarray(jax.block_until_ready(fn(planar)))
        got = np.transpose(out[:, py:py + h, px:px + w], (1, 2, 0))
        ok = np.array_equal(got, golden[col])
        print(f"  {name:28s} exact={ok}")
        if ok or "identity" in name or "infra" in name:
            live[name] = fn
        if not ok and "identity" not in name and "infra" not in name:
            d = got.astype(int) - golden[col].astype(int)
            print(f"    max|d|={np.abs(d).max()} npx={(d != 0).sum()}")

    print("chained-K execution times (2 sweeps):")
    for sweep in range(2):
        for name, fn in live.items():
            t = execution_time(fn, planar, k1=20, k2=120, samples=4)
            print(f"  [{sweep}] {name:28s} {t * 1e6:8.1f} us")


if __name__ == "__main__":
    main()
