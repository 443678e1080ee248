#!/usr/bin/env python3
"""Kernel lab 2: cost anatomy + packed-16 and MXU formulations.

Calibration (what does each structural element cost per image pass?):
  passthrough-u8   DMA window in, store band out, no arithmetic
  widen-narrow     + u8->i32->u8 casts
  k-mins           + k i32 min ops (k = 1, 4, 8) on row slices
  roll-cost        + 4 lane rolls
  i16-min          does 16-bit min legalize at all on this Mosaic?

Candidate fast formulations (bit-exact checked vs the oracle):
  conv3x3-packed16 two image rows per i32 lane (lo/hi 16-bit fields), MAC
                   both simultaneously; exact because every accumulator
                   value <= 255*256 = 65280 < 2^16 (no carry between
                   fields) and field extraction is bitwise.
  conv3x3-mxu      vertical taps as a banded-matrix matmul on the MXU
                   (exact: u8 values and small-int weights are exact in
                   bf16; products accumulate in f32), horizontal taps as
                   lane rolls + adds on the VPU.
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


def make_passthrough(layout):
    band = layout.band

    def body(x, out_ref, *_):
        out_ref[0] = x[1:band + 1]
    return _windowed_call(layout, 1, body)


def make_widen_narrow(layout):
    band = layout.band

    def body(x, out_ref, *_):
        out_ref[0] = x[1:band + 1].astype(jnp.int32).astype(jnp.uint8)
    return _windowed_call(layout, 1, body)


def make_k_mins(layout, k):
    band = layout.band

    def body(x, out_ref, *_):
        v = x[:, :].astype(jnp.int32)
        acc = v[0:band]
        for i in range(k):
            acc = jnp.minimum(acc, v[(i % 2) + 1:(i % 2) + 1 + band])
        out_ref[0] = acc.astype(jnp.uint8)
    return _windowed_call(layout, 1, body)


def make_rolls(layout, k):
    band = layout.band

    def body(x, out_ref, *_):
        v = x[1:band + 1].astype(jnp.int32)
        acc = v
        for i in range(k):
            acc = _shift(acc, 1 if i % 2 == 0 else -1)
        out_ref[0] = acc.astype(jnp.uint8)
    return _windowed_call(layout, 1, body)


def make_i16_min(layout):
    band = layout.band

    def body(x, out_ref, *_):
        v = x[:, :].astype(jnp.int16)
        acc = jnp.minimum(v[0:band], v[1:band + 1])
        out_ref[0] = acc.astype(jnp.uint8)
    return _windowed_call(layout, 1, body)


def make_conv3x3_packed16(layout):
    """Dense 3x3 conv, runtime SMEM mask, two rows per i32 lane.

    Window rows [0, band+2) are split as lo = rows of the top half band,
    hi = rows of the bottom half: packed = lo + hi*2^16. Every vertical
    tap slices both halves identically; lane rolls shift columns of both
    fields together. Accumulator per field <= 65280 < 2^16, so fields
    never interact; (acc + half) >> shift is applied per field after
    unpacking (the shift would smear hi into lo if applied packed).
    """
    hy, hx = 1, 1
    band = layout.band
    assert band % 2 == 0
    half_b = band // 2
    mask_flat = spec.BLUR_3X3_INT.astype(np.int32).reshape(-1)
    shift = spec.BLUR_3X3_SHIFT
    half = 1 << (shift - 1)

    def body(x, out_ref, mask_ref):
        # x: (band+2, wp) u8. lo rows [0, half_b+2), hi rows [half_b, band+2)
        acc = None
        for ky in range(3):
            lo = x[ky:ky + half_b, :].astype(jnp.int32)
            hi = x[half_b + ky:half_b + ky + half_b, :].astype(jnp.int32)
            v = lo + (hi << 16)
            for kx in range(3):
                w = mask_ref[ky * 3 + kx]
                t = _shift(v, kx - hx) * w
                acc = t if acc is None else acc + t
        # hi<<16 can overflow into the i32 sign bit; field semantics stay
        # exact modulo 2^32, but extraction must use a LOGICAL shift.
        lo = ((acc & 0xFFFF) + half) >> shift
        hi = (jax.lax.shift_right_logical(acc, 16) + half) >> shift
        out = jnp.concatenate([lo, hi], axis=0)
        out_ref[0] = out.astype(jnp.uint8)

    return _windowed_call(layout, hy, body, mask_args=(mask_flat,))


def make_conv3x3_mxu(layout):
    """Dense 3x3 conv: vertical taps via banded matmul (MXU), horizontal
    via lane rolls + adds. W_kx is built at trace time from compile-time
    shifted identities scaled by runtime SMEM weights."""
    hy, hx = 1, 1
    band = layout.band
    mask_flat = spec.BLUR_3X3_INT.astype(np.int32).reshape(-1)
    shift = spec.BLUR_3X3_SHIFT
    half = np.float32(1 << (shift - 1))
    inv = np.float32(2.0 ** -shift)
    # shifted identities: S[dy][r, r+dy] = 1, shape (band, band+2)
    eye = np.eye(band, band + 2, dtype=np.float32)
    shifts = [np.roll(eye, dy, axis=1) for dy in range(3)]

    def body(x, out_ref, mask_ref):
        xf = x[:, :].astype(jnp.int32).astype(jnp.float32)  # (band+2, wp)
        acc = None
        for kx in range(3):
            w_mat = None
            for ky in range(3):
                w = mask_ref[ky * 3 + kx].astype(jnp.float32)
                t = w * shifts[ky]
                w_mat = t if w_mat is None else w_mat + t
            v = jax.lax.dot_general(
                w_mat, xf, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            v = _shift(v, kx - hx)
            acc = v if acc is None else acc + v
        out_ref[0] = ((acc + half) * inv).astype(jnp.int32).astype(jnp.uint8)

    return _windowed_call(layout, hy, body, mask_args=(mask_flat,))


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
            return lax.dynamic_update_slice(
                v, out.astype(v.dtype), (0, layout.pad_y, 0))
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

    conv_oracle = oracle.IMAGE_OPS["Convolution-3x3"]

    cases = {
        "passthrough-u8": (None, make_passthrough(layout)),
        "widen-narrow": (None, make_widen_narrow(layout)),
        "1-min": (None, make_k_mins(layout, 1)),
        "4-mins": (None, make_k_mins(layout, 4)),
        "8-mins": (None, make_k_mins(layout, 8)),
        "4-rolls": (None, make_rolls(layout, 4)),
        "i16-min": (None, make_i16_min(layout)),
        "conv3x3-packed16": (conv_oracle, make_conv3x3_packed16(layout)),
        "conv3x3-mxu": (conv_oracle, make_conv3x3_mxu(layout)),
    }
    for name, (check, op) in cases.items():
        try:
            ok = "   "
            if check is not None:
                arr = np.asarray(jax.jit(op)(planar))
                got = np.transpose(
                    arr[:, :h, layout.pad_x:layout.pad_x + w], (1, 2, 0))
                ok = "OK " if np.array_equal(got, check(image)) else "BAD"
            else:
                jax.block_until_ready(jax.jit(op)(planar))
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
