#!/usr/bin/env python3
"""Kernel-variant lab: measure true execution time of alternative windowed
kernel formulations via the chained-K marginal method (see exec_probe.py).

Hypotheses under test (motivated by exec_probe data):
- H1: i32 multiply/min on the VPU is the bottleneck (about 1 op/cycle/slot);
  f32 arithmetic runs several times faster. All our windowed math is exact
  in f32 (values are small integers, far inside the 24-bit mantissa).
- H2: erosion benefits from a separable min structure (5 ops vs 9 for the
  square; vertical-min reuse for the cross).
- H3: band size has second-order effects once compute is minimized.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from dip_benchmark_tpu import spec  # noqa: E402
from dip_benchmark_tpu.ops.pallas import window  # noqa: E402
from dip_benchmark_tpu.ops.pallas.window import _shift, _windowed_call  # noqa: E402
from dip_benchmark_tpu.runtime.cache import enable_compilation_cache  # noqa: E402
from dip_benchmark_tpu.utils.image import load_image, make_layout, \
    to_planar_padded  # noqa: E402

FUNDUS = "/root/reference/assets/fundus.jpg"
K1, K2 = 30, 300


# -- variant kernels --------------------------------------------------------

def make_erosion_square_f32_sep(layout):
    """3x3 square erosion: separable min structure in f32 (5 big mins)."""
    hy, band = 1, layout.band

    def body(x_vmem, out_ref, *_):
        v = x_vmem[:, :].astype(jnp.int32).astype(jnp.float32)
        h = jnp.minimum(jnp.minimum(_shift(v, -1), v), _shift(v, 1))
        out_ref[0] = jnp.minimum(
            jnp.minimum(h[0:band], h[1:band + 1]),
            h[2:band + 2]).astype(jnp.int32).astype(jnp.uint8)

    return _windowed_call(layout, hy, body)


def make_erosion_square_i32_sep(layout):
    """Separable structure but still i32 (isolates H1 from H2)."""
    hy, band = 1, layout.band

    def body(x_vmem, out_ref, *_):
        v = x_vmem[:, :].astype(jnp.int32)
        h = jnp.minimum(jnp.minimum(_shift(v, -1), v), _shift(v, 1))
        out_ref[0] = jnp.minimum(
            jnp.minimum(h[0:band], h[1:band + 1]),
            h[2:band + 2]).astype(jnp.uint8)

    return _windowed_call(layout, hy, body)


def make_erosion_cross_f32(layout):
    """3x3 cross erosion in f32: vmin3 of center column + lane-shifted
    center row (4 mins)."""
    hy, band = 1, layout.band

    def body(x_vmem, out_ref, *_):
        v = x_vmem[:, :].astype(jnp.int32).astype(jnp.float32)
        mid = v[1:band + 1]
        vert = jnp.minimum(jnp.minimum(v[0:band], mid), v[2:band + 2])
        out_ref[0] = jnp.minimum(
            jnp.minimum(_shift(mid, -1), vert),
            _shift(mid, 1)).astype(jnp.int32).astype(jnp.uint8)

    return _windowed_call(layout, hy, body)


def make_convolution_f32(layout, kh, kw, shift, int_mask):
    """Dense conv, runtime SMEM mask, f32 MAC (exact; see spec docstring)."""
    hy, hx = kh // 2, kw // 2
    band = layout.band if kh * kw <= 9 else window._divisor_band(layout, 4)
    mask_flat = int_mask.astype(np.int32).reshape(-1)
    inv = np.float32(2.0 ** -shift)
    half = np.float32(1 << (shift - 1))

    def body(x_vmem, out_ref, mask_ref):
        acc = None
        for ky in range(kh):
            v = x_vmem[ky:ky + band, :].astype(jnp.int32).astype(jnp.float32)
            for kx in range(kw):
                w = mask_ref[ky * kw + kx].astype(jnp.float32)
                t = _shift(v, kx - hx) * w
                acc = t if acc is None else acc + t
        # (acc + half) * 2^-shift truncated == (acc + half) >> shift exactly
        # (acc integer-valued <= 2^17, scaling by a power of two is exact).
        out_ref[0] = ((acc + half) * inv).astype(jnp.int32).astype(jnp.uint8)

    return _windowed_call(layout, hy, body, mask_args=(mask_flat,),
                          band=band)


def make_gaussian_blur_3x3_f32(layout):
    hy, band = 1, layout.band

    def body(x_vmem, out_ref, *_):
        v = x_vmem[:, :].astype(jnp.int32).astype(jnp.float32)
        aux = v[0:band] + 2.0 * v[1:band + 1] + v[2:band + 2]
        out_ref[0] = ((_shift(aux, -1) + 2.0 * aux + _shift(aux, 1) + 8.0)
                      * np.float32(1 / 16)).astype(jnp.int32).astype(jnp.uint8)

    return _windowed_call(layout, hy, body)


def make_conv_sep_f32(layout, n, row_mask, shift):
    hy = n // 2
    band = layout.band
    mask_flat = row_mask.astype(np.int32).reshape(-1)
    inv = np.float32(2.0 ** -shift)
    half = np.float32(1 << (shift - 1))

    def body(x_vmem, out_ref, mask_ref):
        v = x_vmem[:, :].astype(jnp.int32).astype(jnp.float32)
        aux = None
        for kx in range(n):
            w = mask_ref[kx].astype(jnp.float32)
            t = _shift(v, kx - hy) * w
            aux = t if aux is None else aux + t
        # pass-1 u8 quantization: truncating scale (exact round-half-up)
        aux = ((aux + half) * inv).astype(jnp.int32).astype(jnp.float32)
        acc = None
        for ky in range(n):
            w = mask_ref[ky].astype(jnp.float32)
            t = aux[ky:ky + band, :] * w
            acc = t if acc is None else acc + t
        out_ref[0] = ((acc + half) * inv).astype(jnp.int32).astype(jnp.uint8)

    return _windowed_call(layout, hy, body, mask_args=(mask_flat,))


# -- measurement ------------------------------------------------------------

def main() -> int:
    enable_compilation_cache()
    if os.path.exists(FUNDUS):
        image = load_image(FUNDUS)
    else:
        rng = np.random.default_rng(0)
        image = rng.integers(0, 256, size=(2336, 3504, 3), dtype=np.uint8)
    h, w, _ = image.shape
    layout = make_layout(h, w)
    planar = jax.block_until_ready(
        jax.device_put(to_planar_padded(image, layout)))

    from dip_benchmark_tpu import oracle

    def chained(op, k):
        def body(i, v):
            out = op(v)
            return lax.dynamic_update_slice(
                v, out.astype(v.dtype), (0, layout.pad_y, 0))

        def f(v):
            return lax.fori_loop(0, k, body, v)
        return jax.jit(f).lower(planar).compile()

    def t_sync(fn, n=5):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            y = fn(planar)
            np.asarray(y[0, 0, 0])
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    oracle_ops = {
        "erosion-sq": oracle.IMAGE_OPS["Erosion-3x3-Square"],
        "erosion-cross": oracle.IMAGE_OPS["Erosion-3x3-Cross"],
        "conv3x3": oracle.IMAGE_OPS["Convolution-3x3"],
        "conv5x5": oracle.IMAGE_OPS["Convolution-5x5"],
        "blur3x3": oracle.IMAGE_OPS["Gaussian-Blur-3x3"],
        "conv-sep5": oracle.IMAGE_OPS["Convolution-1x5+5x1"],
    }

    variants = {
        "erosion-sq/i32-9tap (cur)": ("erosion-sq", window.make_erosion(
            layout, window.mask_to_taps(np.ones((3, 3), bool)))),
        "erosion-sq/i32-sep": ("erosion-sq",
                               make_erosion_square_i32_sep(layout)),
        "erosion-sq/f32-sep": ("erosion-sq",
                               make_erosion_square_f32_sep(layout)),
        "erosion-cross/f32": ("erosion-cross", make_erosion_cross_f32(layout)),
        "conv3x3/i32 (cur)": ("conv3x3", window.make_convolution(
            layout, 3, 3, spec.BLUR_3X3_SHIFT, spec.BLUR_3X3_INT)),
        "conv3x3/f32": ("conv3x3", make_convolution_f32(
            layout, 3, 3, spec.BLUR_3X3_SHIFT, spec.BLUR_3X3_INT)),
        "conv5x5/f32": ("conv5x5", make_convolution_f32(
            layout, 5, 5, spec.BLUR_5X5_SHIFT, spec.BLUR_5X5_INT)),
        "blur3x3/f32": ("blur3x3", make_gaussian_blur_3x3_f32(layout)),
        "conv-sep5/f32": ("conv-sep5", make_conv_sep_f32(
            layout, 5, spec.BLUR_1X5_INT, spec.BLUR_SEP5_SHIFT)),
    }
    for name, (ocol, op) in variants.items():
        try:
            # correctness first (single application, bit-exact); windowed
            # outputs are (C, banded_height, Wp) with image row 0 at row 0
            arr = np.asarray(jax.jit(op)(planar))
            got = np.transpose(
                arr[:, :h, layout.pad_x:layout.pad_x + w], (1, 2, 0))
            exp = oracle_ops[ocol](image)
            ok = "OK " if np.array_equal(got, exp) else "BAD"
            f1, f2 = chained(op, K1), chained(op, K2)
            t1, t2 = t_sync(f1), t_sync(f2)
            te = (t2 - t1) / (K2 - K1)
            print(f"  {name:28s} [{ok}] exec {te * 1e6:7.1f} us/pass "
                  f"(T{K1}={t1 * 1e3:6.1f} T{K2}={t2 * 1e3:6.1f} ms)")
        except Exception as e:
            print(f"  {name:28s} FAILED: {str(e)[:100]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
