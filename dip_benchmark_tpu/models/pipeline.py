"""The flagship model: the fused DIP pipeline (BASELINE.json config 5).

grayscale -> threshold -> erosion(3x3 square) -> gaussian blur(3x3), fused
into ONE Pallas kernel: one HBM read of the 3-channel band (+halo), all four
stages in VMEM/registers, one HBM write — versus four dispatches and eight
image-sized HBM round-trips if run as the individual benchmark ops. This is
the point-op-chain fusion SURVEY.md §7.5d calls for. The DMA/grid skeleton
is the shared _windowed_call(fused_channels=True) scheme; this module
contributes only the specialized four-stage body (the generic composable
version of this config is models/chain.py, ~15% slower without the
binary-erosion trick below).

Bit-exact vs oracle.fused_pipeline (the op-by-op chain): point stages commute
with the baked mirror halo, and the windowed stages' masks are symmetric, so
in-VMEM halo propagation reproduces each stage's standalone mirror semantics
(same argument as the fused separable kernels, ops/pallas/window.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import spec
from ..ops.pallas.window import _shift, _windowed_call
from ..utils import image as image_mod
from ..utils.image import PlanarLayout


def make_fused_pipeline_pallas(layout: PlanarLayout, batch: int = 0):
    """Fused pipeline over the planar padded image; shape-preserving:
    returns (C, Hp, Wp) u8 in the input's padded coordinates.

    batch=0: single image (C, Hp, Wp). batch=B: a (B, C, Hp, Wp) stack
    processed in one dispatch with a leading batch grid dimension — the
    serving path (measured ~79 us/image either way, ~104 Gpx/s,
    benchmarks/tuning/batch_lab.py)."""
    assert layout.channels == 3
    # Budget-capped band: the 3-channel fused window + grayscale's i32
    # temps exceed the single-op VMEM model near the width envelope
    # (utils/image.fused_effective_band; == layout.band at published
    # geometries).
    band = image_mod.fused_effective_band(layout, channels=3)
    hy = 2  # erosion (1) + blur (1)
    assert layout.pad_y >= hy and layout.pad_x >= hy
    hb = band // 2

    def body(x, write, *_):
        # Stage 1: grayscale — the spec's exact 16-bit fixed point (spec
        # module docstring): pure i32 MAC + shift, no f32 converts (this
        # Mosaic target legalizes no 8-bit arithmetic, so i32 widening
        # happens regardless).
        r = x[0].astype(jnp.int32)
        g = x[1].astype(jnp.int32)
        b = x[2].astype(jnp.int32)
        lw_r, lw_g, lw_b = spec.GRAYSCALE_WEIGHTS_INT_RGB
        gray = (lw_r * r + lw_g * g + lw_b * b) >> spec.GRAYSCALE_SHIFT
        # Stage 2: threshold -> binary {0, 255} values.
        t = jnp.where(gray > spec.THRESHOLD_VALUE, spec.THRESHOLD_MAX, 0)
        # Stages 3+4 run packed-16: two output rows per i32 lane, halves
        # overlapping by the remaining halo (ops/pallas/window.py docstring).
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
            write(ch, slice(0, hb), lo)
            write(ch, slice(hb, band), hi)

    return _windowed_call(layout, hy, body, band=band, fused_channels=True,
                          batch=batch)
