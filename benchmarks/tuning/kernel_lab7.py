#!/usr/bin/env python3
"""Round-2 lab 7: native-i16 convolution bodies + MXU dot legality.

Round-1 probes established this Mosaic build accepts i16 ADD and i16 MUL
(and u8->i16 casts), even though i16 sub/shift/min/roll fail (DESIGN.md §3).
That is exactly the op set an integer convolution needs — so the convs can
run at the NATIVE 2-px/lane i16 density instead of the manual packed-16
SWAR-in-i32 scheme, eliminating the pack stage entirely:

  pack:   2 widens + shift + add (4 half-ops)  ->  one u8->i16 cast
  rolls:  on the i32 BITCAST view (2 rows/word, lane roll moves both)
  round:  SWAR round-half-up on the same i32 view: ((v + HALF2) >> s) & M
          (3 ops for both fields vs 6-8 for field extraction)
  narrow: i16 -> u8 cast (probed here)

Exactness: all i16 arithmetic is mod 2^16 with bit patterns equal to the
unsigned math (row MAC <= 255*sum(v) <= 4080; col MAC <= 65280 < 2^16 —
may wrap SIGNED i16 but the 16-bit pattern is exact, and extraction uses
the logical-shift SWAR round on the i32 view, never an i16 shift).

Also probes: lax.dot_general u8 x i8 -> i32 (an MXU col-pass would make
the vertical MACs free; round 1 only tried an f32 3-dot formulation).

Dead ends already recorded this round: unaligned-lane DMA windows fail to
compile (dma_probe.py), so rolls cannot be replaced by shifted DMA copies.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/benchmarks/", 1)[0])

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from dip_benchmark_tpu import oracle, spec  # noqa: E402
from dip_benchmark_tpu.ops.pallas import build_ops  # noqa: E402
from dip_benchmark_tpu.ops.pallas.window import (  # noqa: E402
    _windowed_call, factor_rank1_int)
from dip_benchmark_tpu.utils.image import (  # noqa: E402
    load_image, make_layout, to_planar_padded)


# ---------------------------------------------------------------------------
# Tight chained-K timing: larger K spread than runtime/exec_timing defaults
# so relay jitter (~ms scale per sync) divides by a bigger denominator.
# ---------------------------------------------------------------------------

def exec_time2(op, x, k1=100, k2=900, samples=5):
    def chain(k):
        return jax.jit(
            lambda v: lax.fori_loop(0, k, lambda i, u: op(u), v)
        ).lower(x).compile()

    f1, f2 = chain(k1), chain(k2)
    t1s, t2s = [], []
    for _ in range(samples):
        t0 = time.perf_counter()
        np.asarray(f1(x).ravel()[0])
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(f2(x).ravel()[0])
        t2s.append(time.perf_counter() - t0)
    med = (np.median(t2s) - np.median(t1s)) / (k2 - k1)
    lo = (min(t2s) - min(t1s)) / (k2 - k1)
    return max(0.0, med), max(0.0, lo)


# ---------------------------------------------------------------------------
# Legality probes (small shapes; compile + run + check where possible).
# ---------------------------------------------------------------------------

def probe(name, build):
    try:
        ok = build()
        print(f"  probe {name:34s} OK{'' if ok is True else f' ({ok})'}")
        return True
    except Exception as e:  # noqa: BLE001
        print(f"  probe {name:34s} FAIL — {str(e).splitlines()[0][:110]}")
        return False


def _run_small(body, out_dtype=jnp.uint8, rows=16, wp=256):
    x = np.arange(rows * wp, dtype=np.uint8).reshape(rows, wp)

    def kernel(in_ref, out_ref):
        body(in_ref, out_ref)

    f = jax.jit(lambda v: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, wp), out_dtype),
    )(v))
    return np.asarray(f(jax.device_put(x))), x


def probe_all():
    def p_i16_mac():
        def body(i, o):
            v = i[...].astype(jnp.int16)
            w = v * jnp.int16(3) + v  # mul + add in i16
            o[...] = w.astype(jnp.uint8)  # i16 -> u8 narrow
        got, x = _run_small(body)
        exp = ((x.astype(np.int32) * 3 + x) & 0xFF).astype(np.uint8)
        return bool(np.array_equal(got, exp))

    def p_i16_bitcast_roll():
        def body(i, o):
            v = i[...].astype(jnp.int16)
            r = pltpu.bitcast(v, jnp.int32)          # (rows/2, wp)
            r = pltpu.roll(r, 1, axis=1)
            o[...] = pltpu.bitcast(r, jnp.int16).astype(jnp.uint8)
        got, x = _run_small(body)
        exp = np.roll(x, 1, axis=1)
        return bool(np.array_equal(got, exp))

    def p_i16_swar_round():
        def body(i, o):
            v = i[...].astype(jnp.int16) * jnp.int16(16)
            r = pltpu.bitcast(v, jnp.int32)
            r = jax.lax.shift_right_logical(r + 0x00080008, 4) & 0x0FFF0FFF
            o[...] = pltpu.bitcast(r, jnp.int16).astype(jnp.uint8)
        got, x = _run_small(body)
        exp = ((x.astype(np.int32) * 16 + 8) >> 4).astype(np.uint8)
        return bool(np.array_equal(got, exp))

    def p_dot_u8i8():
        def body(i, o):
            a = i[...]                                 # u8 (16, 256)
            w = jnp.eye(16, dtype=jnp.int8) * jnp.int8(2)
            o[...] = lax.dot_general(
                w, a, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.uint8)
        got, x = _run_small(body)
        exp = ((x.astype(np.int32) * 2) & 0xFF).astype(np.uint8)
        return bool(np.array_equal(got, exp))

    def p_dot_bf16():
        def body(i, o):
            a = i[...].astype(jnp.int32).astype(jnp.float32).astype(
                jnp.bfloat16)
            w = (jnp.eye(16, dtype=jnp.float32) * 2.0).astype(jnp.bfloat16)
            r = lax.dot_general(w, a, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
            o[...] = r.astype(jnp.int32).astype(jnp.uint8)
        got, x = _run_small(body)
        exp = ((x.astype(np.int32) * 2) & 0xFF).astype(np.uint8)
        return bool(np.array_equal(got, exp))

    def p_i16_min():
        def body(i, o):
            v = i[...].astype(jnp.int16)
            o[...] = jnp.minimum(v, jnp.int16(64)).astype(jnp.uint8)
        got, x = _run_small(body)
        exp = np.minimum(x, 64).astype(np.uint8)
        return bool(np.array_equal(got, exp))

    r = {}
    r["i16 mul+add, u8<->i16 casts"] = probe(
        "i16 mul+add, u8<->i16 casts", p_i16_mac)
    r["i16<->i32 bitcast + lane roll"] = probe(
        "i16<->i32 bitcast + lane roll", p_i16_bitcast_roll)
    r["SWAR round on i16 bitcast view"] = probe(
        "SWAR round on i16 bitcast view", p_i16_swar_round)
    r["dot_general i8 x u8 -> i32"] = probe(
        "dot_general i8 x u8 -> i32", p_dot_u8i8)
    r["dot_general bf16 -> f32"] = probe(
        "dot_general bf16 -> f32", p_dot_bf16)
    r["i16 min (expect fail)"] = probe("i16 min (expect fail)", p_i16_min)
    return r


# ---------------------------------------------------------------------------
# i16 conv bodies. Same structure as window.py's packed-16 bodies, with the
# native i16 density replacing the manual pack.
# ---------------------------------------------------------------------------

def _roll16(v, dx):
    """Lane-roll an i16 array via its i32 bitcast (2 rows/word; i16 roll
    itself does not legalize). v must have an even row count."""
    if dx == 0:
        return v
    r = pltpu.bitcast(v, jnp.int32)
    r = pltpu.roll(r, (-dx) % r.shape[-1], axis=r.ndim - 1)
    return pltpu.bitcast(r, jnp.int16)


def _swar_round_narrow(acc16, shift, half):
    """Round-half-up both 16-bit fields of the i32 bitcast view, then
    narrow to u8. Fields hold exact unsigned sums < 2^16; field+half
    < 2^16 so the add never carries across, and the logical shift + mask
    keeps fields independent (the result fits 12 bits for every benchmark
    mask: (65280 + 128) >> 4 = 4088)."""
    r = pltpu.bitcast(acc16, jnp.int32)
    half2 = int(half) * 0x00010001
    mask = (0xFFFF >> shift) * 0x00010001
    r = jax.lax.shift_right_logical(r + half2, shift) & mask
    return pltpu.bitcast(r, jnp.int16).astype(jnp.uint8)


def make_conv_rank1_i16(layout, kh, kw, shift, int_mask):
    """Rank-1 factored conv at native i16 density (u, v runtime SMEM)."""
    uv = factor_rank1_int(int_mask)
    assert uv is not None and 255 * int(int_mask.sum()) < (1 << 16)
    hy, hx = kh // 2, kw // 2
    band = layout.band
    n = band + 2 * hy
    half = 1 << (shift - 1)
    mask_flat = np.concatenate(uv).astype(np.int32)

    def body(x, out_ref, mask_ref):
        v = x[0:n, :].astype(jnp.int16)
        rowsum = None
        for kx in range(kw):
            t = _roll16(v, kx - hx) * mask_ref[kh + kx].astype(jnp.int16)
            rowsum = t if rowsum is None else rowsum + t
        acc = None
        for ky in range(kh):
            t = rowsum[ky:ky + band, :] * mask_ref[ky].astype(jnp.int16)
            acc = t if acc is None else acc + t
        out_ref[0] = _swar_round_narrow(acc, shift, half)

    return _windowed_call(layout, hy, body, mask_args=(mask_flat,))


def make_conv_dense_i16(layout, kh, kw, shift, int_mask):
    """Dense conv (runtime mask), i16 density, col-sums before rolls."""
    assert 255 * int(int_mask.sum()) < (1 << 16) and (int_mask >= 0).all()
    hy, hx = kh // 2, kw // 2
    band = layout.band
    half = 1 << (shift - 1)
    mask_flat = int_mask.astype(np.int32).reshape(-1)

    def body(x, out_ref, mask_ref):
        rows = [None] * kh
        acc = None
        for kx in range(kw):
            col = None
            for ky in range(kh):
                if rows[ky] is None:
                    rows[ky] = x[ky:ky + band, :].astype(jnp.int16)
                t = rows[ky] * mask_ref[ky * kw + kx].astype(jnp.int16)
                col = t if col is None else col + t
            col = _roll16(col, kx - hx)
            acc = col if acc is None else acc + col
        out_ref[0] = _swar_round_narrow(acc, shift, half)

    return _windowed_call(layout, hy, body, mask_args=(mask_flat,))


def make_conv_sep_i16(layout, n, row_mask, shift):
    """Fused separable conv, i16 density; pass-1 quantization is the SWAR
    round on the bitcast view, kept as i16 for pass 2."""
    hy = n // 2
    band = layout.band
    rows = band + 2 * hy
    half = 1 << (shift - 1)
    mask_flat = row_mask.astype(np.int32).reshape(-1)

    def body(x, out_ref, mask_ref):
        v = x[0:rows, :].astype(jnp.int16)
        aux = None
        for kx in range(n):
            t = _roll16(v, kx - hy) * mask_ref[kx].astype(jnp.int16)
            aux = t if aux is None else aux + t
        r = pltpu.bitcast(aux, jnp.int32)
        half2 = half * 0x00010001
        mask = (0xFFFF >> shift) * 0x00010001
        r = jax.lax.shift_right_logical(r + half2, shift) & mask
        aux = pltpu.bitcast(r, jnp.int16)  # exact u8 values, i16 density
        acc = None
        for ky in range(n):
            t = aux[ky:ky + band, :] * mask_ref[ky].astype(jnp.int16)
            acc = t if acc is None else acc + t
        out_ref[0] = _swar_round_narrow(acc, shift, half)

    return _windowed_call(layout, hy, body, mask_args=(mask_flat,))


def make_blur3x3_i16(layout):
    """Compile-time specialized 1-2-1 blur, i16 density; x*2 via add
    (i16 shift does not legalize)."""
    band = layout.band

    def body(x, out_ref, *_):
        v = x[0:band + 2, :].astype(jnp.int16)
        aux = v[0:band] + v[1:band + 1] + v[1:band + 1] + v[2:band + 2]
        o = _roll16(aux, -1) + aux + aux + _roll16(aux, 1)
        out_ref[0] = _swar_round_narrow(o, 4, 8)

    return _windowed_call(layout, 1, body)


def main():
    print("— legality probes —")
    r = probe_all()
    if not r["i16 mul+add, u8<->i16 casts"]:
        print("i16 path dead on this build; stopping.")
        return

    image = load_image("/root/reference/assets/fundus.jpg")
    layout = make_layout(*image.shape[:2])
    planar = jax.device_put(to_planar_padded(image, layout))
    ops = build_ops(layout)

    candidates = {
        "conv3x3 BASE (rank1 packed)": (
            ops["Convolution-3x3"], "Convolution-3x3"),
        "conv3x3 rank1-i16": (make_conv_rank1_i16(
            layout, 3, 3, spec.BLUR_3X3_SHIFT, spec.BLUR_3X3_INT),
            "Convolution-3x3"),
        "conv3x3 dense-i16": (make_conv_dense_i16(
            layout, 3, 3, spec.BLUR_3X3_SHIFT, spec.BLUR_3X3_INT),
            "Convolution-3x3"),
        "conv5x5 BASE (rank1 packed)": (
            ops["Convolution-5x5"], "Convolution-5x5"),
        "conv5x5 rank1-i16": (make_conv_rank1_i16(
            layout, 5, 5, spec.BLUR_5X5_SHIFT, spec.BLUR_5X5_INT),
            "Convolution-5x5"),
        "sep3 BASE": (ops["Convolution-1x3+3x1"], "Convolution-1x3+3x1"),
        "sep3 i16": (make_conv_sep_i16(
            layout, 3, spec.BLUR_1X3_INT, spec.BLUR_1X3_SHIFT),
            "Convolution-1x3+3x1"),
        "sep5 BASE": (ops["Convolution-1x5+5x1"], "Convolution-1x5+5x1"),
        "sep5 i16": (make_conv_sep_i16(
            layout, 5, spec.BLUR_1X5_INT, spec.BLUR_1X5_SHIFT),
            "Convolution-1x5+5x1"),
        "blur3x3 BASE": (ops["Gaussian-Blur-3x3"], "Gaussian-Blur-3x3"),
        "blur3x3 i16": (make_blur3x3_i16(layout), "Gaussian-Blur-3x3"),
    }
    py, px = layout.pad_y, layout.pad_x
    h, w = image.shape[:2]
    golden = {c: oracle.IMAGE_OPS[c](image)
              for c in {c for _, c in candidates.values()}}

    live = {}
    for name, (fn, col) in candidates.items():
        try:
            out = np.asarray(jax.block_until_ready(fn(planar)))
        except Exception as e:  # noqa: BLE001
            print(f"  {name:28s} COMPILE FAIL — "
                  f"{str(e).splitlines()[0][:100]}")
            continue
        got = np.transpose(out[:, py:py + h, px:px + w], (1, 2, 0))
        ok = np.array_equal(got, golden[col])
        print(f"  {name:28s} exact={ok}")
        if ok:
            live[name] = fn
        else:
            d = got.astype(int) - golden[col].astype(int)
            print(f"    max|d|={np.abs(d).max()} npx={(d != 0).sum()}")

    print("chained-K execution (med us / min us), 2 rounds:")
    for rnd in range(2):
        for name, fn in live.items():
            med, lo = exec_time2(fn, planar)
            print(f"  [{rnd}] {name:28s} {med * 1e6:8.1f} / {lo * 1e6:8.1f}")


if __name__ == "__main__":
    main()
