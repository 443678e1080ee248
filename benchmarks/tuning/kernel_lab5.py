#!/usr/bin/env python3
"""Kernel lab 5: conv5x5 second-round candidates.

Current production conv5x5 (packed-16, column sums, band=56): ~285 us.
Candidates:
  band=112    packing halved temp heights, so the full default band may
              now fit VMEM (it OOM'd unpacked)
  mxu         vertical taps as one banded-matrix matmul per mask column
              (f32, exact), horizontal via lane rolls — trades VPU MACs
              for MXU flops
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

from dip_benchmark_tpu import oracle, spec  # noqa: E402
from dip_benchmark_tpu.ops.pallas import window  # noqa: E402
from dip_benchmark_tpu.ops.pallas.window import _shift, _windowed_call  # noqa: E402
from dip_benchmark_tpu.runtime.cache import enable_compilation_cache  # noqa: E402
from dip_benchmark_tpu.utils.image import load_image, make_layout, \
    to_planar_padded  # noqa: E402

FUNDUS = "/root/reference/assets/fundus.jpg"
K1, K2 = 30, 300


def make_conv5x5_packed_band(layout, band):
    """Production packed body at an explicit band size."""
    kh = kw = 5
    hy = hx = 2
    mask_flat = spec.BLUR_5X5_INT.astype(np.int32).reshape(-1)
    shift = spec.BLUR_5X5_SHIFT
    half = 1 << (shift - 1)
    hb = band // 2

    def body(x_vmem, out_ref, mask_ref):
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
        out_ref[0, 0:hb] = (((acc & 0xFFFF) + half) >> shift
                            ).astype(jnp.uint8)
        out_ref[0, hb:band] = ((jax.lax.shift_right_logical(acc, 16) + half)
                               >> shift).astype(jnp.uint8)

    return _windowed_call(layout, hy, body, mask_args=(mask_flat,),
                          band=band)


def make_conv5x5_mxu(layout, band):
    """Vertical taps via banded matmul per mask column (f32 exact)."""
    hy = hx = 2
    mask_flat = spec.BLUR_5X5_INT.astype(np.int32).reshape(-1)
    shift = spec.BLUR_5X5_SHIFT
    half = np.float32(1 << (shift - 1))
    inv = np.float32(2.0 ** -shift)
    def body(x_vmem, out_ref, mask_ref):
        rows = jax.lax.broadcasted_iota(jnp.int32, (band, band + 4), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (band, band + 4), 1)
        eyes = [(cols == rows + dy).astype(jnp.float32) for dy in range(5)]
        xf = x_vmem[:, :].astype(jnp.int32).astype(jnp.float32)
        acc = None
        for kx in range(5):
            w_mat = None
            for ky in range(5):
                t = mask_ref[ky * 5 + kx].astype(jnp.float32) * eyes[ky]
                w_mat = t if w_mat is None else w_mat + t
            v = jax.lax.dot_general(
                w_mat, xf, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            v = _shift(v, kx - hx)
            acc = v if acc is None else acc + v
        out_ref[0] = ((acc + half) * inv).astype(jnp.int32).astype(jnp.uint8)

    return _windowed_call(layout, hy, body, mask_args=(mask_flat,),
                          band=band)


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

    def chained(op, k):
        def body(i, v):
            out = op(v)
            return lax.dynamic_update_slice(v, out.astype(v.dtype),
                                            (0, 0, 0))
        return jax.jit(lambda v: lax.fori_loop(0, k, body, v)
                       ).lower(planar).compile()

    def t_sync(fn, n=5):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            y = fn(planar)
            np.asarray(y[0, 0, 0])
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    check = oracle.IMAGE_OPS["Convolution-5x5"]
    cases = {
        "conv5x5/prod-56": window.make_convolution(
            layout, 5, 5, spec.BLUR_5X5_SHIFT, spec.BLUR_5X5_INT),
        "conv5x5/packed-112": make_conv5x5_packed_band(layout, 112),
        "conv5x5/mxu-56": make_conv5x5_mxu(layout, 56),
        "conv5x5/mxu-112": make_conv5x5_mxu(layout, 112),
    }
    for name, op in cases.items():
        try:
            arr = np.asarray(jax.jit(op)(planar))
            got = np.transpose(
                arr[:, :h, layout.pad_x:layout.pad_x + w], (1, 2, 0))
            ok = "OK " if np.array_equal(got, check(image)) else "BAD"
            f1, f2 = chained(op, K1), chained(op, K2)
            t1, t2 = t_sync(f1), t_sync(f2)
            te = (t2 - t1) / (K2 - K1)
            print(f"  {name:20s} [{ok}] exec {te * 1e6:7.1f} us/pass "
                  f"(T{K1}={t1 * 1e3:6.1f} T{K2}={t2 * 1e3:6.1f} ms)")
        except Exception as e:
            print(f"  {name:20s} FAILED: {str(e)[:110]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
