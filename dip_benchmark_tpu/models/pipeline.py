"""The flagship model: the fused DIP pipeline (BASELINE.json config 5).

grayscale -> threshold -> erosion(3x3 square) -> gaussian blur(3x3), fused
into ONE Pallas kernel: one HBM read of the 3-channel band (+halo), all four
stages in VMEM/registers, one HBM write — versus four dispatches and eight
image-sized HBM round-trips if run as the individual benchmark ops. This is
the point-op-chain fusion SURVEY.md §7.5d calls for.

Bit-exact vs oracle.fused_pipeline (the op-by-op chain): point stages commute
with the baked mirror halo, and the windowed stages' masks are symmetric, so
in-VMEM halo propagation reproduces each stage's standalone mirror semantics
(same argument as the fused separable kernels, ops/pallas/window.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import spec
from ..ops import xla
from ..ops.pallas.common import interpret_mode
from ..ops.pallas.window import _shift
from ..utils import image as image_mod
from ..utils.image import PlanarLayout


def make_fused_pipeline_pallas(layout: PlanarLayout, batch: int = 0):
    """Fused pipeline over the planar padded image; shape-preserving:
    returns (C, Hp, Wp) u8 in the input's padded coordinates.

    batch=0: single image (C, Hp, Wp). batch=B: a (B, C, Hp, Wp) stack
    processed in one dispatch with a leading batch grid dimension — the
    serving path (jax.vmap cannot batch the ANY-memory-space input ref, so
    batching is a grid axis instead; measured ~79 us/image either way,
    ~104 Gpx/s, benchmarks/tuning/batch_lab.py)."""
    c, hp, wp = layout.shape
    assert c == 3
    band = layout.band
    blen = band + image_mod.DMA_SLACK
    nb = layout.n_bands
    hy = 2  # erosion (1) + blur (1)
    assert layout.pad_y >= hy and layout.pad_x >= hy
    assert hp >= layout.banded_height + 8
    base = 8 - hy  # shape-preserving window scheme (ops/pallas/window.py)
    nbatch = max(batch, 1)

    def kernel(in_hbm, out_ref, x_vmem, sem):
        if batch:
            bi, i = pl.program_id(0), pl.program_id(1)
        else:
            bi, i = 0, pl.program_id(0)
        step = bi * nb + i
        total = nbatch * nb

        def src(ss):
            return in_hbm.at[ss // nb] if batch else in_hbm

        def dma0(slot, ss):
            # First band of an image: the window cannot reach above padded
            # row 0; land at VMEM row offset 8, stale rows below corrupt
            # only output rows < hy (inside the mirror-halo region).
            return pltpu.make_async_copy(
                src(ss).at[:, pl.ds(0, blen - 8), :],
                x_vmem.at[slot, :, pl.ds(8, blen - 8)], sem.at[slot])

        def dma(slot, ss):  # band index >= 1
            return pltpu.make_async_copy(
                src(ss).at[:, pl.ds(pl.multiple_of((ss % nb) * band - 8, 8),
                                    blen), :],
                x_vmem.at[slot], sem.at[slot])

        def start(slot, ss):
            @pl.when(ss % nb == 0)
            def _():
                dma0(slot, ss).start()

            @pl.when(ss % nb > 0)
            def _():
                dma(slot, ss).start()

        @pl.when(step == 0)
        def _():
            start(0, 0)

        @pl.when(step + 1 < total)
        def _():
            start((step + 1) % 2, step + 1)

        @pl.when(i == 0)
        def _():
            dma0(step % 2, step).wait()

        @pl.when(i > 0)
        def _():
            dma(step % 2, step).wait()

        x_vmem = x_vmem[step % 2][:, base:base + band + 2 * hy]
        # Stage 1: grayscale — the spec's exact 16-bit fixed point (spec
        # module docstring): pure i32 MAC + shift, no f32 converts (this
        # Mosaic target legalizes no 8-bit arithmetic, so i32 widening
        # happens regardless).
        r = x_vmem[0].astype(jnp.int32)
        g = x_vmem[1].astype(jnp.int32)
        b = x_vmem[2].astype(jnp.int32)
        lw_r, lw_g, lw_b = spec.GRAYSCALE_WEIGHTS_INT_RGB
        gray = (lw_r * r + lw_g * g + lw_b * b) >> spec.GRAYSCALE_SHIFT
        # Stage 2: threshold -> binary {0, 255} values.
        t = jnp.where(gray > spec.THRESHOLD_VALUE, spec.THRESHOLD_MAX, 0)
        # Stages 3+4 run packed-16: two output rows per i32 lane, halves
        # overlapping by the remaining halo (ops/pallas/window.py docstring).
        hb = band // 2
        w_rows = hb + 4
        p = t[0:w_rows] + (t[hb:hb + w_rows] << 16)
        # Stage 3: erosion 3x3 square on binary values — min == bitwise AND
        # on {0, 255}, and AND never carries across the packing boundary.
        pm = _shift(p, -1) & p & _shift(p, 1)
        n = hb + 2
        v = pm[0:n] & pm[1:n + 1] & pm[2:n + 2]
        # Stage 4: specialized 3x3 blur (separable, exact int): fields stay
        # <= 4*1020 + 8 < 2^16, so packed MACs are exact.
        aux = v[0:hb] + (v[1:hb + 1] << 1) + v[2:hb + 2]
        o = _shift(aux, -1) + (aux << 1) + _shift(aux, 1)
        # SWAR round-half-up of both fields at once (4088 + 8 < 2^16),
        # same as make_gaussian_blur_3x3 (DESIGN.md §2c).
        t2 = jax.lax.shift_right_logical(o + 0x00080008, 4) & 0x0FFF0FFF
        lo = t2.astype(jnp.uint8)
        hi = jax.lax.shift_right_logical(t2, 16).astype(jnp.uint8)
        for ch in range(3):
            write(out_ref, ch, slice(0, hb), lo)
            write(out_ref, ch, slice(hb, band), hi)

    if batch:
        grid = (batch, nb)
        out_specs = pl.BlockSpec((1, 3, band, wp),
                                 lambda bi, i: (bi, 0, i, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((batch, 3, hp, wp), jnp.uint8)
    else:
        grid = (nb,)
        out_specs = pl.BlockSpec((3, band, wp), lambda i: (0, i, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((3, hp, wp), jnp.uint8)

    def write(out_ref, ch, sl, val):
        if batch:
            out_ref[0, ch, sl] = val
        else:
            out_ref[ch, sl] = val

    @jax.jit
    def op(planar: jax.Array) -> jax.Array:
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((2, 3, blen, wp), jnp.uint8),
                            pltpu.SemaphoreType.DMA((2,))],
            interpret=interpret_mode(),
        )(planar)

    return op


def fused_pipeline_xla(image: jax.Array) -> jax.Array:
    """X-path fused pipeline on uint8 HWC (XLA fuses the chain itself)."""
    return xla.fused_pipeline(image)
