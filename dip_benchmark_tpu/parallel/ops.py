"""The 12-op matrix over a device mesh: row-band sharding + halo exchange.

A capability extension beyond the single-device reference (SURVEY.md §2.2:
no distributed backend exists there; §5 asks for the shard_map+ppermute
seam). Every op here is bit-identical to its single-device oracle: windowed
ops receive their vertical halo rows from neighbor shards over ICI
(exchange_row_halo) with the global mirror rule applied only on edge shards,
and columns are mirror-padded locally (columns are never sharded).

Separable ops re-exchange the intermediate's halo between passes, which
reproduces the reference's aux-buffer re-mirroring semantics exactly.

All ops take/return planar (C, H, W) uint8 global arrays sharded over the
mesh's 'space' axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from .. import spec
from .halo import exchange_row_halo


def _mirror_cols(x: jnp.ndarray, px: int) -> jnp.ndarray:
    # ONE copy of the SYCL-parity column mirror rule (dtype-agnostic):
    # the f32 path's helper, applied with zero row padding.
    from ..ops.xla_f32 import mirror_pad_chw
    return mirror_pad_chw(x, 0, px)


def _erode_local(x: jnp.ndarray, kh: int, kw: int) -> jnp.ndarray:
    """Min over kh x kw; rows of `x` must already include (kh//2) halo rows
    each side; cols mirror-padded here. Returns valid rows only.

    Separable min-of-shifted-slices, like the single-device X-path: XLA
    fuses it into one VPU pass, measured 2.4-4.6x faster than the
    equivalent lax.reduce_window (benchmarks/tuning/xla_lab.py)."""
    padded = _mirror_cols(x, kw // 2)
    c, hp, wp = padded.shape
    w = x.shape[2]
    rows = None
    for kx in range(kw):
        t = lax.slice(padded, (0, 0, kx), (c, hp, kx + w))
        rows = t if rows is None else jnp.minimum(rows, t)
    h = hp - (kh - 1)
    acc = None
    for ky in range(kh):
        t = lax.slice(rows, (0, ky, 0), (c, ky + h, w))
        acc = t if acc is None else jnp.minimum(acc, t)
    return acc


def _conv_local(x: jnp.ndarray, int_mask: np.ndarray, shift: int
                ) -> jnp.ndarray:
    """Integer-exact correlation; same halo contract as _erode_local."""
    kh, kw = int_mask.shape
    padded = _mirror_cols(x, kw // 2).astype(jnp.int32)
    c = x.shape[0]
    h = x.shape[1] - (kh - 1)
    w = x.shape[2]
    acc = None
    for ky in range(kh):
        for kx in range(kw):
            term = int(int_mask[ky, kx]) * lax.slice(
                padded, (0, ky, kx), (c, ky + h, kx + w))
            acc = term if acc is None else acc + term
    half = 1 << (shift - 1)
    return jnp.clip((acc + half) >> shift, 0, 255).astype(jnp.uint8)


def _point_bodies():
    def inversion(x):
        return jnp.uint8(255) - x

    def grayscale(x):
        r = x[0].astype(jnp.int32)
        g = x[1].astype(jnp.int32)
        b = x[2].astype(jnp.int32)
        nr, ng, nb = spec.GRAYSCALE_WEIGHTS_INT_RGB
        gray = ((nr * r + ng * g + nb * b)
                >> spec.GRAYSCALE_SHIFT).astype(jnp.uint8)
        return jnp.broadcast_to(gray, x.shape)

    def threshold(x):
        return jnp.where(x > jnp.uint8(spec.THRESHOLD_VALUE),
                         jnp.uint8(spec.THRESHOLD_MAX), jnp.uint8(0))

    return {"Copy": jnp.copy, "Inversion": inversion,
            "Grayscale": grayscale, "Threshold": threshold}


def _conv_local_f32(x: jnp.ndarray, int_mask: np.ndarray, shift: int
                    ) -> jnp.ndarray:
    """f32 correlation with xla_f32._conv's EXACT accumulation order
    (column-sums per mask column, kx outer / ky inner) so sharded interior
    values are bit-identical to the single-device f32 X-path — f32 adds
    don't reassociate freely, so the order is part of the contract."""
    fmask = spec.mask_float(int_mask, shift)
    kh, kw = fmask.shape
    padded = _mirror_cols(x, kw // 2)
    c = x.shape[0]
    h = x.shape[1] - (kh - 1)
    w = x.shape[2]
    acc = None
    for kx in range(kw):
        col = None
        for ky in range(kh):
            term = jnp.float32(fmask[ky, kx]) * lax.slice(
                padded, (0, ky, kx), (c, ky + h, kx + w))
            col = term if col is None else col + term
        acc = col if acc is None else acc + col
    return acc


def build_sharded_ops_f32(mesh: Mesh, axis: str = "space") -> dict:
    """The f32 planar-CHW [0,1] data model (CUDA.jl parity,
    cuda/benchmark.jl:171-179) over the mesh: CSV-column-keyed jitted ops
    on (3, H, W) float32 arrays row-sharded on `axis`. Same halo-exchange
    scheme as the uint8 matrix; erosion/point/copy rows are bit-identical
    to the single-device ops/xla_f32.py ops, convolutions match because
    the accumulation order is replicated (see _conv_local_f32)."""
    from ..ops import xla_f32

    def lift(body):
        return jax.jit(jax.shard_map(body, mesh=mesh,
                                     in_specs=P(None, axis, None),
                                     out_specs=P(None, axis, None)))

    ops = {col: lift(xla_f32.IMAGE_OPS_F32[col])
           for col in ("Copy", "Inversion", "Grayscale", "Threshold")}

    def windowed(local, halo):
        def body(x):
            return local(exchange_row_halo(x, halo, axis))
        return lift(body)

    def erosion_cross_local(xp):  # xp has 1 halo row each side
        row = _erode_local(xp[:, 1:-1], 1, 3)
        col = _erode_local(xp, 3, 1)
        return jnp.minimum(row, col)

    def erosion_sep_body(x):
        aux = _erode_local(x, 1, 3)
        return _erode_local(exchange_row_halo(aux, 1, axis), 3, 1)

    def conv_sep_body(x, m1, m2, shift):
        aux = _conv_local_f32(x, m1, shift)  # 1xN: no row halo
        return _conv_local_f32(
            exchange_row_halo(aux, m2.shape[0] // 2, axis), m2, shift)

    def pipeline_body(x):
        t = xla_f32.threshold(xla_f32.grayscale(x))
        e = _erode_local(exchange_row_halo(t, 1, axis), 3, 3)
        return _conv_local_f32(exchange_row_halo(e, 1, axis),
                               spec.BLUR_3X3_INT, spec.BLUR_3X3_SHIFT)

    ops.update({
        "Erosion-3x3-Cross": windowed(erosion_cross_local, 1),
        "Erosion-3x3-Square": windowed(
            lambda xp: _erode_local(xp, 3, 3), 1),
        "Erosion-1x3+3x1-Square": lift(erosion_sep_body),
        "Convolution-3x3": windowed(
            lambda xp: _conv_local_f32(xp, spec.BLUR_3X3_INT,
                                       spec.BLUR_3X3_SHIFT), 1),
        "Convolution-1x3+3x1": lift(
            lambda x: conv_sep_body(x, spec.BLUR_1X3_INT, spec.BLUR_3X1_INT,
                                    spec.BLUR_SEP3_SHIFT)),
        "Convolution-5x5": windowed(
            lambda xp: _conv_local_f32(xp, spec.BLUR_5X5_INT,
                                       spec.BLUR_5X5_SHIFT), 2),
        "Convolution-1x5+5x1": lift(
            lambda x: conv_sep_body(x, spec.BLUR_1X5_INT, spec.BLUR_5X1_INT,
                                    spec.BLUR_SEP5_SHIFT)),
        "Gaussian-Blur-3x3": windowed(
            lambda xp: _conv_local_f32(xp, spec.BLUR_3X3_INT,
                                       spec.BLUR_3X3_SHIFT), 1),
        "Fused-Pipeline": lift(pipeline_body),
    })
    return ops


def build_sharded_ops(mesh: Mesh, axis: str = "space") -> dict:
    """CSV-column-keyed jitted ops over (C, H, W) uint8 arrays sharded on
    rows. H must divide evenly by the axis size."""

    def lift(body):
        fn = jax.shard_map(body, mesh=mesh,
                           in_specs=P(None, axis, None),
                           out_specs=P(None, axis, None))
        return jax.jit(fn)

    ops = {col: lift(body) for col, body in _point_bodies().items()}

    def windowed(local, halo):
        def body(x):
            return local(exchange_row_halo(x, halo, axis))
        return lift(body)

    def erosion_cross_local(xp):  # xp has 1 halo row each side
        row = _erode_local(xp[:, 1:-1], 1, 3)   # 1x3 needs no row halo
        col = _erode_local(xp, 3, 1)
        return jnp.minimum(row, col)

    def erosion_sep_body(x):
        aux = _erode_local(x, 1, 3)             # no row halo needed
        return _erode_local(exchange_row_halo(aux, 1, axis), 3, 1)

    def conv_sep_body(x, m1, m2, shift):
        aux = _conv_local(x, m1, shift)         # 1xN: no row halo
        return _conv_local(exchange_row_halo(aux, m2.shape[0] // 2, axis),
                           m2, shift)

    def pipeline_body(x):
        pt = _point_bodies()
        t = pt["Threshold"](pt["Grayscale"](x))
        e = _erode_local(exchange_row_halo(t, 1, axis), 3, 3)
        return _conv_local(exchange_row_halo(e, 1, axis),
                           spec.BLUR_3X3_INT, spec.BLUR_3X3_SHIFT)

    ops.update({
        "Erosion-3x3-Cross": windowed(erosion_cross_local, 1),
        "Erosion-3x3-Square": windowed(
            lambda xp: _erode_local(xp, 3, 3), 1),
        "Erosion-1x3+3x1-Square": lift(erosion_sep_body),
        "Convolution-3x3": windowed(
            lambda xp: _conv_local(xp, spec.BLUR_3X3_INT,
                                   spec.BLUR_3X3_SHIFT), 1),
        "Convolution-1x3+3x1": lift(
            lambda x: conv_sep_body(x, spec.BLUR_1X3_INT, spec.BLUR_3X1_INT,
                                    spec.BLUR_SEP3_SHIFT)),
        "Convolution-5x5": windowed(
            lambda xp: _conv_local(xp, spec.BLUR_5X5_INT,
                                   spec.BLUR_5X5_SHIFT), 2),
        "Convolution-1x5+5x1": lift(
            lambda x: conv_sep_body(x, spec.BLUR_1X5_INT, spec.BLUR_5X1_INT,
                                    spec.BLUR_SEP5_SHIFT)),
        "Gaussian-Blur-3x3": windowed(
            lambda xp: _conv_local(xp, spec.BLUR_3X3_INT,
                                   spec.BLUR_3X3_SHIFT), 1),
        "Fused-Pipeline": lift(pipeline_body),
    })
    return ops
