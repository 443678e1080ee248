#!/usr/bin/env python3
"""Round-2 lab 8: stage-cost anatomy of the shipped windowed kernels.

Measures (tight chained-K marginal, exec_time2 from kernel_lab7) a ladder
of truncated bodies so each stage's real cost on THIS build is known:

  conv3x3 rank-1:  pack-only -> +rolls -> +row-MAC -> +col-MAC -> full
                   and full with SWAR rounding (one add/shift/mask on the
                   packed word instead of per-field extract+round)
  erosion-square:  widen-only -> +col-mins -> +rolls -> full,
                   plus roll-via-concat (slices + concat instead of
                   pltpu.roll) to see which lowering is cheaper.

Also probes bf16 min / bf16 add legality (a 2-px/lane erosion would need
them; i16 min is dead, i16 mul SIGABRTs on this build — i16_probe.py).
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
    _shift, _windowed_call, factor_rank1_int)
from dip_benchmark_tpu.utils.image import (  # noqa: E402
    load_image, make_layout, to_planar_padded)

from kernel_lab7 import exec_time2  # noqa: E402


def probe_small(name, fn, out_dtype):
    x = np.arange(16 * 256, dtype=np.uint8).reshape(16, 256)
    try:
        def kernel(in_ref, out_ref):
            out_ref[...] = fn(in_ref[...])
        np.asarray(jax.jit(lambda v: pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((16, 256), out_dtype),
        )(v))(jax.device_put(x)))
        print(f"  probe {name:30s} OK")
        return True
    except Exception as e:  # noqa: BLE001
        print(f"  probe {name:30s} FAIL ({str(e).splitlines()[0][:80]})")
        return False


def _to_bf16(v):
    return v.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)


# --- conv3x3 rank-1 ladder --------------------------------------------------

def conv_ladder(layout, stop, swar=False):
    """stop in {'pack', 'roll', 'row', 'col', 'full'}."""
    kh = kw = 3
    shift = spec.BLUR_3X3_SHIFT
    u, v_f = factor_rank1_int(spec.BLUR_3X3_INT)
    hy, hx = 1, 1
    band = layout.band
    hb = band // 2
    w_rows = hb + 2 * hy
    half = 1 << (shift - 1)
    mask_flat = np.concatenate([u, v_f]).astype(np.int32)

    def body(x_vmem, out_ref, mask_ref):
        lo = x_vmem[0:w_rows, :].astype(jnp.int32)
        hi = x_vmem[hb:hb + w_rows, :].astype(jnp.int32)
        p = lo + (hi << 16)
        if stop == "pack":
            acc = p[0:hb]
        else:
            shifted = [_shift(p, dx) for dx in (-1, 1)]
            if stop == "roll":
                acc = (p + shifted[0] + shifted[1])[0:hb]
            else:
                rowsum = (shifted[0] * mask_ref[kh] + p * mask_ref[kh + 1]
                          + shifted[1] * mask_ref[kh + 2])
                if stop == "row":
                    acc = rowsum[0:hb]
                else:
                    acc = (rowsum[0:hb] * mask_ref[0]
                           + rowsum[1:1 + hb] * mask_ref[1]
                           + rowsum[2:2 + hb] * mask_ref[2])
        if swar:
            t = jax.lax.shift_right_logical(
                acc + half * 0x00010001, shift) & ((0xFFFF >> shift)
                                                   * 0x00010001)
            out_ref[0, 0:hb] = t.astype(jnp.uint8)
            out_ref[0, hb:band] = jax.lax.shift_right_logical(
                t, 16).astype(jnp.uint8)
        else:
            out_ref[0, 0:hb] = (((acc & 0xFFFF) + half)
                                >> shift).astype(jnp.uint8)
            out_ref[0, hb:band] = ((jax.lax.shift_right_logical(acc, 16)
                                    + half) >> shift).astype(jnp.uint8)

    return _windowed_call(layout, hy, body, mask_args=(mask_flat,))


# --- erosion-square ladder ---------------------------------------------------

def ero_ladder(layout, stop, concat_shift=False):
    """stop in {'widen', 'col', 'full'}."""
    hy = 1
    band = layout.band

    def cshift(v, dx):
        if dx > 0:
            return jnp.concatenate([v[:, dx:], v[:, :dx]], axis=1)
        return jnp.concatenate([v[:, dx:], v[:, :v.shape[1] + dx]], axis=1)

    sh = cshift if concat_shift else _shift

    def body(x_vmem, out_ref, *_):
        v = x_vmem[:, :].astype(jnp.int32)
        if stop == "widen":
            out_ref[0] = v[0:band].astype(jnp.uint8)
            return
        cm = jnp.minimum(jnp.minimum(v[0:band], v[1:band + 1]),
                         v[2:band + 2])
        if stop == "col":
            out_ref[0] = cm.astype(jnp.uint8)
            return
        out_ref[0] = jnp.minimum(jnp.minimum(sh(cm, -1), cm),
                                 sh(cm, 1)).astype(jnp.uint8)

    return _windowed_call(layout, hy, body)


def main():
    print("— bf16 probes —")
    probe_small("bf16 add", lambda v: (_to_bf16(v) + _to_bf16(v)).astype(
        jnp.float32).astype(jnp.int32).astype(jnp.uint8), jnp.uint8)
    probe_small("bf16 min", lambda v: jnp.minimum(
        _to_bf16(v), jnp.bfloat16(99.0)).astype(jnp.float32).astype(
        jnp.int32).astype(jnp.uint8), jnp.uint8)

    image = load_image("/root/reference/assets/fundus.jpg")
    layout = make_layout(*image.shape[:2])
    planar = jax.device_put(to_planar_padded(image, layout))
    ops = build_ops(layout)

    # correctness: full ladders must equal the oracle
    py, px = layout.pad_y, layout.pad_x
    h, w = image.shape[:2]
    for name, fn, col in [
            ("conv3x3 ladder full", conv_ladder(layout, "full"),
             "Convolution-3x3"),
            ("conv3x3 full+swar", conv_ladder(layout, "full", swar=True),
             "Convolution-3x3"),
            ("erosion ladder full", ero_ladder(layout, "full"),
             "Erosion-3x3-Square"),
            ("erosion concat-shift", ero_ladder(layout, "full",
                                                concat_shift=True),
             "Erosion-3x3-Square")]:
        out = np.asarray(jax.block_until_ready(fn(planar)))
        got = np.transpose(out[:, py:py + h, px:px + w], (1, 2, 0))
        ok = np.array_equal(got, oracle.IMAGE_OPS[col](image))
        print(f"  {name:28s} exact={ok}")

    stages = {
        "conv pack only": conv_ladder(layout, "pack"),
        "conv pack+2rolls": conv_ladder(layout, "roll"),
        "conv +row-MAC": conv_ladder(layout, "row"),
        "conv +col-MAC (full)": conv_ladder(layout, "full"),
        "conv full SWAR-round": conv_ladder(layout, "full", swar=True),
        "conv3x3 SHIPPED": ops["Convolution-3x3"],
        "ero widen only": ero_ladder(layout, "widen"),
        "ero +col mins": ero_ladder(layout, "col"),
        "ero full (roll)": ero_ladder(layout, "full"),
        "ero full (concat)": ero_ladder(layout, "full", concat_shift=True),
        "ero SHIPPED": ops["Erosion-3x3-Square"],
    }
    print("chained-K execution (med us / min us), 2 rounds:")
    for rnd in range(2):
        for name, fn in stages.items():
            med, lo = exec_time2(fn, planar)
            print(f"  [{rnd}] {name:26s} {med * 1e6:8.1f} / {lo * 1e6:8.1f}")


if __name__ == "__main__":
    main()
