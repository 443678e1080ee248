#!/usr/bin/env python3
"""Round-2 lab 11: symmetric-profile MAC grouping for the conv bodies.

The shipped rank-1 and separable-fused conv bodies run one multiply per
tap. Both benchmark profiles ([1,2,1], [1,4,6,4,1]) are PALINDROMES, so
taps equidistant from the center share a weight and can be summed BEFORE
the multiply:

  rowsum = v0*(s(-2)+s(+2)) + v1*(s(-1)+s(+1)) + v2*p

This trades (k-1)/2 multiplies for (k-1)/2 adds per pass and, per the
round-2 cost law (DESIGN.md §2c: ALU ops price uniformly), saves nothing
by itself — the real win is that the paired sums let the k-tap MAC drop
from (k muls + k-1 adds) to ((k+1)/2 muls + (k-1) adds), i.e. 2 fewer ops
for k=5 and 1 fewer for k=3, per pass, at packed-16 density (~4.4 us/op).

Exactness: integer adds commute and every regrouped partial is bounded by
the SAME final total 255*sum(mask) < 2^16 (all terms nonnegative), so the
packed-16 field proof of make_convolution carries over unchanged.

Measures shipped vs symmetric-grouped bodies for: rank-1 dense 3x3 and
5x5, separable-fused 1x3+3x1 and 1x5+5x1. Structure (palindrome or not)
is detected at build time from the integer mask, like the existing rank-1
detection; weight VALUES stay runtime SMEM scalars.
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/benchmarks/", 1)[0])

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dip_benchmark_tpu import oracle, spec  # noqa: E402
from dip_benchmark_tpu.ops.pallas.window import (  # noqa: E402
    _shift, _windowed_call, factor_rank1_int, make_convolution,
    make_convolution_separated_fused)
from dip_benchmark_tpu.runtime.cache import enable_compilation_cache  # noqa: E402
from dip_benchmark_tpu.utils.image import (  # noqa: E402
    load_image, make_layout, to_planar_padded)

from kernel_lab7 import exec_time2  # noqa: E402


def _sym_row_mac(p, mask_ref, base, k, hx):
    """Palindrome row MAC: (k+1)//2 muls instead of k."""
    acc = None
    for kx in range(k // 2):
        s = _shift(p, kx - hx) + _shift(p, hx - kx)
        t = s * mask_ref[base + kx]
        acc = t if acc is None else acc + t
    t = p * mask_ref[base + hx]
    return t if acc is None else acc + t


def _sym_col_mac(rows_of, mask_ref, base, k, hb):
    """Palindrome col MAC over slices rows_of(ky) = value[ky:ky+hb]."""
    acc = None
    for ky in range(k // 2):
        s = rows_of(ky) + rows_of(k - 1 - ky)
        t = s * mask_ref[base + ky]
        acc = t if acc is None else acc + t
    t = rows_of(k // 2) * mask_ref[base + k // 2]
    return t if acc is None else acc + t


def make_conv_rank1_sym(layout, kh, kw, shift, int_mask):
    """Rank-1 packed body with symmetric grouping on both passes."""
    uv = factor_rank1_int(int_mask)
    assert uv is not None
    u, v = uv
    assert (u == u[::-1]).all() and (v == v[::-1]).all()
    hy, hx = kh // 2, kw // 2
    if kh * kw == 25:
        band = next((b for b in (336, 224, 168) if b % 8 == 0
                     and layout.banded_height % b == 0), layout.band)
    else:
        band = layout.band
    half = 1 << (shift - 1)
    hb = band // 2
    w_rows = hb + 2 * hy
    half2 = half * 0x00010001
    rmask2 = (0xFFFF >> shift) * 0x00010001
    mask_flat = np.concatenate([u, v]).astype(np.int32)

    def body(x_vmem, out_ref, mask_ref):
        lo = x_vmem[0:w_rows, :].astype(jnp.int32)
        hi = x_vmem[hb:hb + w_rows, :].astype(jnp.int32)
        p = lo + (hi << 16)
        rowsum = _sym_row_mac(p, mask_ref, kh, kw, hx)
        acc = _sym_col_mac(lambda ky: rowsum[ky:ky + hb, :],
                           mask_ref, 0, kh, hb)
        t = jax.lax.shift_right_logical(acc + half2, shift) & rmask2
        out_ref[0, 0:hb] = t.astype(jnp.uint8)
        out_ref[0, hb:band] = jax.lax.shift_right_logical(
            t, 16).astype(jnp.uint8)

    return _windowed_call(layout, hy, body, mask_args=(mask_flat,),
                          band=band)


def make_conv_sep_sym(layout, n, row_mask, shift):
    """Separable-fused packed body with symmetric grouping on both passes."""
    flat = row_mask.reshape(-1)
    assert (flat == flat[::-1]).all()
    hy = n // 2
    band = layout.band
    mask_flat = row_mask.astype(np.int32).reshape(-1)
    half = 1 << (shift - 1)
    hb = band // 2
    w_rows = hb + 2 * hy
    half2 = half * 0x00010001
    rmask2 = (0xFFFF >> shift) * 0x00010001

    def body(x_vmem, out_ref, mask_ref):
        lo = x_vmem[0:w_rows, :].astype(jnp.int32)
        hi = x_vmem[hb:hb + w_rows, :].astype(jnp.int32)
        v = lo + (hi << 16)
        aux = _sym_row_mac(v, mask_ref, 0, n, hy)
        aux = jax.lax.shift_right_logical(aux + half2, shift) & rmask2
        acc = _sym_col_mac(lambda ky: aux[ky:ky + hb, :],
                           mask_ref, 0, n, hb)
        t = jax.lax.shift_right_logical(acc + half2, shift) & rmask2
        out_ref[0, 0:hb] = t.astype(jnp.uint8)
        out_ref[0, hb:band] = jax.lax.shift_right_logical(
            t, 16).astype(jnp.uint8)

    return _windowed_call(layout, hy, body, mask_args=(mask_flat,))


def main():
    enable_compilation_cache()
    image = load_image("/root/reference/assets/fundus.jpg")
    h, w = image.shape[:2]
    layout = make_layout(h, w)
    planar = jax.device_put(to_planar_padded(image, layout))
    py, px = layout.pad_y, layout.pad_x

    cases = [
        ("conv3x3 shipped", make_convolution(
            layout, 3, 3, spec.BLUR_3X3_SHIFT, spec.BLUR_3X3_INT),
            "Convolution-3x3"),
        ("conv3x3 sym    ", make_conv_rank1_sym(
            layout, 3, 3, spec.BLUR_3X3_SHIFT, spec.BLUR_3X3_INT),
            "Convolution-3x3"),
        ("conv5x5 shipped", make_convolution(
            layout, 5, 5, spec.BLUR_5X5_SHIFT, spec.BLUR_5X5_INT),
            "Convolution-5x5"),
        ("conv5x5 sym    ", make_conv_rank1_sym(
            layout, 5, 5, spec.BLUR_5X5_SHIFT, spec.BLUR_5X5_INT),
            "Convolution-5x5"),
        ("sep3 shipped   ", make_convolution_separated_fused(
            layout, 3, spec.BLUR_1X3_INT, spec.BLUR_SEP3_SHIFT),
            "Convolution-1x3+3x1"),
        ("sep3 sym       ", make_conv_sep_sym(
            layout, 3, spec.BLUR_1X3_INT, spec.BLUR_SEP3_SHIFT),
            "Convolution-1x3+3x1"),
        ("sep5 shipped   ", make_convolution_separated_fused(
            layout, 5, spec.BLUR_1X5_INT, spec.BLUR_SEP5_SHIFT),
            "Convolution-1x5+5x1"),
        ("sep5 sym       ", make_conv_sep_sym(
            layout, 5, spec.BLUR_1X5_INT, spec.BLUR_SEP5_SHIFT),
            "Convolution-1x5+5x1"),
    ]
    for name, fn, col in cases:
        try:
            out = np.asarray(jax.block_until_ready(fn(planar)))
        except Exception as e:  # noqa: BLE001
            print(f"  {name} FAIL {str(e).splitlines()[0][:100]}")
            continue
        got = np.transpose(out[:, py:py + h, px:px + w], (1, 2, 0))
        ok = np.array_equal(got, oracle.IMAGE_OPS[col](image))
        med, lo = exec_time2(fn, planar)
        print(f"  {name} exact={ok} {med * 1e6:8.1f} / {lo * 1e6:8.1f} us")


if __name__ == "__main__":
    main()
