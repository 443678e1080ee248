#!/usr/bin/env python3
"""Kernel lab 3: replace the manual banded DMA with Pallas BlockSpec
pipelining (the fast path the point ops use).

lab2 showed the manual make_async_copy window costs ~510 us/pass before
any arithmetic, while BlockSpec-pipelined point kernels run at HBM speed
(~30-60 us). Halo via BlockSpec: the main (1, band, wp) block plus a
second input ref over the SAME array with block shape (1, 16, wp) and
index map (ch, i) -> the 16 rows after the main block — in-bounds for the
last band because the layout reserves banded_height + 16 rows. The window
rows [pad_y - hy, pad_y - hy + band + 2*hy) then live in concat(main,
strip)[...] which each variant materializes or slices as it needs.

Variants:
  bs-passthrough      BlockSpec in/out, no halo, no arithmetic (floor)
  dma-passthrough-224 manual DMA path at band=224 (per-step overhead test)
  bs-halo-passthrough main+strip, concat in VMEM, slice a band out
  bs-erosion-sq       separable 3x3 square min on the concat window
  bs-conv3x3          dense 3x3 i32 MAC on the concat window
  bs-conv3x3-packed16 dense 3x3 with two rows per lane
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
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from dip_benchmark_tpu import oracle, spec  # noqa: E402
from dip_benchmark_tpu.ops.pallas import window  # noqa: E402
from dip_benchmark_tpu.ops.pallas.common import interpret_mode  # noqa: E402
from dip_benchmark_tpu.ops.pallas.window import _shift  # noqa: E402
from dip_benchmark_tpu.runtime.cache import enable_compilation_cache  # noqa: E402
from dip_benchmark_tpu.utils.image import load_image, make_layout, \
    to_planar_padded  # noqa: E402

FUNDUS = "/root/reference/assets/fundus.jpg"
K1, K2 = 30, 300
STRIP = 16


def _bs_call(layout, hy, body, band=None):
    """BlockSpec-pipelined windowed call: body(xw, out_ref, *masks) where
    xw is the (band + 2*hy, wp) window as TWO refs' concatenation done by
    the body itself via the provided slicer."""
    c, hp, wp = layout.shape
    band = band or layout.band
    nb = layout.banded_height // band
    row_base = layout.pad_y - hy

    def kernel(main_ref, strip_ref, out_ref, scratch):
        # materialize the contiguous window once; taps then slice scratch
        scratch[0:band] = main_ref[0]
        scratch[band:band + STRIP] = strip_ref[0]
        body(scratch, out_ref)

    @jax.jit
    def op(planar):
        return pl.pallas_call(
            kernel,
            grid=(c, nb),
            in_specs=[
                pl.BlockSpec((1, band, wp), lambda ch, i: (ch, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, STRIP, wp),
                             lambda ch, i: (ch, (i * band + band) // STRIP,
                                            0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, band, wp), lambda ch, i: (ch, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((c, layout.banded_height, wp),
                                           jnp.uint8),
            scratch_shapes=[pltpu.VMEM((band + STRIP, wp), jnp.uint8)],
            interpret=interpret_mode(),
        )(planar, planar)

    return op, row_base, band


def make_bs_passthrough(layout):
    c, hp, wp = layout.shape
    band = layout.band
    nb = layout.banded_height // band

    def kernel(in_ref, out_ref):
        out_ref[0] = in_ref[0]

    @jax.jit
    def op(planar):
        return pl.pallas_call(
            kernel,
            grid=(c, nb),
            in_specs=[pl.BlockSpec((1, band, wp), lambda ch, i: (ch, i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, band, wp), lambda ch, i: (ch, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((c, layout.banded_height, wp),
                                           jnp.uint8),
            interpret=interpret_mode(),
        )(planar)
    return op


def make_bs_halo_passthrough(layout):
    hy = 1

    def body(xw, out_ref):
        _, band = None, layout.band
        rb = layout.pad_y - hy
        out_ref[0] = xw[rb + hy:rb + hy + band]
    return _bs_call(layout, hy, body)[0]


def make_bs_erosion_sq(layout):
    hy = 1
    band = layout.band
    rb = layout.pad_y - hy

    def body(xw, out_ref):
        v = xw[rb:rb + band + 2].astype(jnp.int32)
        h = jnp.minimum(jnp.minimum(_shift(v, -1), v), _shift(v, 1))
        out_ref[0] = jnp.minimum(
            jnp.minimum(h[0:band], h[1:band + 1]),
            h[2:band + 2]).astype(jnp.uint8)
    return _bs_call(layout, hy, body)[0]


def make_bs_conv3x3(layout):
    hy = 1
    band = layout.band
    rb = layout.pad_y - hy
    mask_flat = spec.BLUR_3X3_INT.astype(np.int32).reshape(-1)
    shift_ = spec.BLUR_3X3_SHIFT
    half = 1 << (shift_ - 1)
    c, hp, wp = layout.shape
    nb = layout.banded_height // band

    def kernel(main_ref, strip_ref, mask_ref, out_ref, scratch):
        scratch[0:band] = main_ref[0]
        scratch[band:band + STRIP] = strip_ref[0]
        acc = None
        for ky in range(3):
            v = scratch[rb + ky:rb + ky + band].astype(jnp.int32)
            for kx in range(3):
                w = mask_ref[ky * 3 + kx]
                t = _shift(v, kx - 1) * w
                acc = t if acc is None else acc + t
        out_ref[0] = ((acc + half) >> shift_).astype(jnp.uint8)

    @jax.jit
    def op(planar):
        return pl.pallas_call(
            kernel,
            grid=(c, nb),
            in_specs=[
                pl.BlockSpec((1, band, wp), lambda ch, i: (ch, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, STRIP, wp),
                             lambda ch, i: (ch, (i * band + band) // STRIP,
                                            0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((1, band, wp), lambda ch, i: (ch, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((c, layout.banded_height, wp),
                                           jnp.uint8),
            scratch_shapes=[pltpu.VMEM((band + STRIP, wp), jnp.uint8)],
            interpret=interpret_mode(),
        )(planar, planar, mask_flat)
    return op


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

    ero_oracle = oracle.IMAGE_OPS["Erosion-3x3-Square"]
    conv_oracle = oracle.IMAGE_OPS["Convolution-3x3"]

    layout224 = make_layout(h, w, band=224)
    cases = {
        "bs-passthrough": (None, make_bs_passthrough(layout)),
        "dma-passthrough-224": (None, None),  # filled below
        "bs-halo-passthrough": (None, make_bs_halo_passthrough(layout)),
        "bs-erosion-sq": (ero_oracle, make_bs_erosion_sq(layout)),
        "bs-conv3x3": (conv_oracle, make_bs_conv3x3(layout)),
    }

    # manual-DMA passthrough at band=224 needs its own layout/planar
    import benchmarks.tuning.kernel_lab2 as lab2  # reuse builder
    planar224 = jax.block_until_ready(
        jax.device_put(to_planar_padded(image, layout224)))
    dma224 = lab2.make_passthrough(layout224)

    for name, (check, op) in cases.items():
        try:
            if name == "dma-passthrough-224":
                def chained224(o, k):
                    def bdy(i, v):
                        out = o(v)
                        return lax.dynamic_update_slice(
                            v, out.astype(v.dtype), (0, layout224.pad_y, 0))
                    return jax.jit(
                        lambda v: lax.fori_loop(0, k, bdy, v)
                    ).lower(planar224).compile()

                def ts224(fn, n=5):
                    ts = []
                    for _ in range(n):
                        t0 = time.perf_counter()
                        y = fn(planar224)
                        np.asarray(y[0, 0, 0])
                        ts.append(time.perf_counter() - t0)
                    return float(np.median(ts))
                jax.block_until_ready(jax.jit(dma224)(planar224))
                f1, f2 = chained224(dma224, K1), chained224(dma224, K2)
                t1, t2 = ts224(f1), ts224(f2)
            else:
                ok = "   "
                if check is not None:
                    arr = np.asarray(jax.jit(op)(planar))
                    got = np.transpose(
                        arr[:, :h, layout.pad_x:layout.pad_x + w], (1, 2, 0))
                    ok = ("OK " if np.array_equal(got, check(image))
                          else "BAD")
                else:
                    jax.block_until_ready(jax.jit(op)(planar))
                f1, f2 = chained(op, K1), chained(op, K2)
                t1, t2 = t_sync(f1), t_sync(f2)
                print(f"  {name:22s} [{ok}] exec "
                      f"{(t2 - t1) / (K2 - K1) * 1e6:7.1f} us/pass "
                      f"(T{K1}={t1 * 1e3:6.1f} T{K2}={t2 * 1e3:6.1f} ms)")
                continue
            print(f"  {name:22s} [   ] exec "
                  f"{(t2 - t1) / (K2 - K1) * 1e6:7.1f} us/pass "
                  f"(T{K1}={t1 * 1e3:6.1f} T{K2}={t2 * 1e3:6.1f} ms)")
        except Exception as e:
            print(f"  {name:22s} FAILED: {str(e)[:110]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
