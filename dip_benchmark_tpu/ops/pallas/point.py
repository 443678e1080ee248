"""Point-op Pallas kernels: copy, inversion, threshold, grayscale.

Single fused VMEM pass over uint8 row-band tiles, HBM traffic stays uint8
(the bandwidth the benchmark measures). These replace the reference's
per-pixel point kernels [cuda/benchmark.jl:11-43, sycl/benchmark.cpp:54-114].

Elementwise ops run on the image reshaped to (C*Hp, Wp) — a free row-major
view of the planar layout — with Pallas pipelining HBM<->VMEM block
transfers. Grayscale needs all three channel planes per band, so it grids
over row bands of the (3, Hp, Wp) array directly.

Point ops commute with mirroring, so outputs on the full padded buffer have
correct mirror halos for free; outputs keep the input's padded shape and are
cropped on download.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ... import spec
from ...utils.image import PlanarLayout
from .common import GRAY_BAND, POINT_BAND, interpret_mode


def _copy_dma(layout: PlanarLayout, dtype=jnp.uint8):
    """Device copy as ONE whole-buffer HBM->HBM DMA — no VMEM round-trip,
    the true cudaMemcpyDeviceToDevice analogue [cuda/benchmark.jl:215-219].
    (A VMEM-tiled copy kernel measures ~5x slower: HBM->VMEM->HBM.)"""

    def kernel(in_hbm, out_hbm, sem):
        cp = pltpu.make_async_copy(in_hbm, out_hbm, sem)
        cp.start()
        cp.wait()

    @jax.jit
    def op(planar: jax.Array) -> jax.Array:
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct(layout.shape, dtype),
            scratch_shapes=[pltpu.SemaphoreType.DMA],
            interpret=interpret_mode(),
        )(planar)

    return op


def _inversion_kernel(in_ref, out_ref):
    # 255 - x == x ^ 0xFF exactly on uint8; xor is one of the few 8-bit
    # vector ops this Mosaic target legalizes (subi on i8 vectors is not).
    out_ref[:] = in_ref[:] ^ jnp.uint8(255)


# The SWAR formulation below encodes "> 127" as the byte's bit 7 — it is
# only correct for this exact threshold. Fail loudly if the spec constant
# ever moves (every other path follows the constant symbolically; a
# ValueError, not assert — python -O strips asserts).
if spec.THRESHOLD_VALUE != 127 or spec.THRESHOLD_MAX != 255:
    raise ValueError(
        "ops/pallas/point.py's SWAR threshold encodes '>127 -> 255' as "
        "bit 7; rewrite it before changing spec.THRESHOLD_VALUE/MAX")


def _threshold_kernel(in_ref, out_ref):
    # SWAR on the native (4,1)-packed u8 tiling: bitcast reinterprets four
    # consecutive rows as one i32 lane (little-endian, verified both modes).
    # byte > 127 <=> bit 7 set, so: isolate bit 7 of every byte, logical-
    # shift to bit 0 (bits move cleanly within their byte), multiply by 255
    # (byte values <= 1: no cross-byte carry). Three vector ops per FOUR
    # pixels, vs widen-to-i32 + compare + select + narrow per pixel before
    # (measured 57-69 us -> 13.4 us/image). Exact: >127 is exactly bit 7.
    v = pltpu.bitcast(in_ref[:], jnp.int32)
    t = v & jnp.int32(np.int32(np.uint32(0x80808080)))
    r = jax.lax.shift_right_logical(t, 7) * spec.THRESHOLD_MAX
    out_ref[:] = pltpu.bitcast(r, jnp.uint8)


def _elementwise(kernel, layout: PlanarLayout, dtype=jnp.uint8,
                 band: int = POINT_BAND):
    c, hp, wp = layout.shape
    rows = c * hp
    grid = (pl.cdiv(rows, band),)

    @jax.jit
    def op(planar: jax.Array) -> jax.Array:
        flat = planar.reshape(rows, wp)
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pl.BlockSpec((band, wp), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((band, wp), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows, wp), dtype),
            interpret=interpret_mode(),
        )(flat)
        return out.reshape(c, hp, wp)

    return op


def _grayscale_kernel(in_ref, out_ref):
    # in_ref/out_ref: (3, BAND, Wp) uint8. Rec.709 via the spec's EXACT
    # 16-bit fixed point (spec module docstring) — pure i32 MAC + shift,
    # no f32 converts (the reference computes f32 luma,
    # sycl/benchmark.cpp:82-86; the integer spec is bit-stable under FMA
    # contraction and faster: 8-bit arithmetic isn't legalized on this
    # Mosaic target, so everything widens to i32 anyway).
    r = in_ref[0].astype(jnp.int32)
    g = in_ref[1].astype(jnp.int32)
    b = in_ref[2].astype(jnp.int32)
    nr, ng, nb = spec.GRAYSCALE_WEIGHTS_INT_RGB
    gray = ((nr * r + ng * g + nb * b)
            >> spec.GRAYSCALE_SHIFT).astype(jnp.uint8)
    out_ref[0] = gray
    out_ref[1] = gray
    out_ref[2] = gray


def _grayscale(layout: PlanarLayout):
    c, hp, wp = layout.shape
    assert c == 3
    grid = (pl.cdiv(hp, GRAY_BAND),)

    @jax.jit
    def op(planar: jax.Array) -> jax.Array:
        return pl.pallas_call(
            _grayscale_kernel,
            grid=grid,
            in_specs=[pl.BlockSpec((3, GRAY_BAND, wp), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((3, GRAY_BAND, wp), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((3, hp, wp), jnp.uint8),
            interpret=interpret_mode(),
        )(planar)

    return op


@functools.lru_cache(maxsize=None)
def build_point_ops(layout: PlanarLayout) -> dict:
    return {
        "Copy": _copy_dma(layout),
        "Inversion": _elementwise(_inversion_kernel, layout),
        "Threshold": _elementwise(_threshold_kernel, layout),
        "Grayscale": _grayscale(layout),
    }
