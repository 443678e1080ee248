#!/usr/bin/env python3
"""Round-2 windowed-kernel lab: toward the VERDICT targets
(conv-3x3 <= 60 us, erosion-square <= 60 us, conv-5x5 <= 150 us true
execution on the fundus-sized image).

Experiments (each measured with the chained-K marginal on the real TPU,
shape-preserving kernels chain directly):

  legality  — does THIS Mosaic build legalize u8 min / i16 add/mul/min?
              (round-1 notes say no; re-check cheaply before designing
              around the absence)
  conv3-r1  — rank-1 factored dense 3x3: when the runtime integer mask is
              an exact integer outer product u x v (the Gaussian masks
              are), compute rowsum = v-MAC (UNROUNDED), then colsum =
              u-MAC, round ONCE — bit-identical to the 9-tap dense form,
              6 MACs + 2 rolls instead of 9 MACs + 3 rolls. Intermediate
              bounds: rowsum <= 255*sum(v) and colsum <= 255*sum(u)*sum(v)
              = 255*sum(mask) < 2^16, so packed-16 stays exact.
  conv5-r1  — same for 5x5: 10 MACs + 4 rolls instead of 25 + 5; colsum
              bound 255*256 = 65280 < 2^16 (the adversarial bound).
  ero-qroll — erosion-square with horizontal taps produced by rolling the
              u8 window at its NATIVE (4,1) byte packing (pltpu.bitcast to
              i32, one lane-roll moves four rows at once, quarter cost),
              then widening the three shifted copies; vs the round-1 body
              that widens once and rolls at i32 (full cost).
  baselines — the shipped kernels, same measurement.
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
    _shift, _windowed_call)
from dip_benchmark_tpu.runtime.exec_timing import execution_time  # noqa: E402
from dip_benchmark_tpu.utils.image import (  # noqa: E402
    load_image, make_layout, to_planar_padded)


# ---------------------------------------------------------------------------
# Legality probes (run first; tiny shapes, compiled, catch Mosaic aborts)
# ---------------------------------------------------------------------------

def probe_legality():
    x = jnp.arange(8 * 256, dtype=jnp.uint8).reshape(8, 256)

    def attempt(name, fn):
        try:
            def kernel(in_ref, out_ref):
                out_ref[:] = fn(in_ref[:])
            out = pl.pallas_call(
                kernel,
                out_shape=jax.eval_shape(fn, x),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(x)
            jax.block_until_ready(out)
            print(f"  {name:28s} OK")
            return True
        except Exception as e:  # noqa: BLE001
            print(f"  {name:28s} FAIL ({type(e).__name__}: "
                  f"{str(e).splitlines()[0][:90]})")
            return False

    attempt("u8 minimum", lambda v: jnp.minimum(v, v ^ jnp.uint8(0xFF)))
    attempt("u8 -> i16 cast", lambda v: v.astype(jnp.int16))
    attempt("i16 add", lambda v: (v.astype(jnp.int16)
                                  + v.astype(jnp.int16)))
    attempt("i16 mul", lambda v: v.astype(jnp.int16) * jnp.int16(3))
    attempt("i16 min", lambda v: jnp.minimum(v.astype(jnp.int16),
                                             jnp.int16(99)))
    attempt("i16 -> u8 cast", lambda v: (v.astype(jnp.int16)
                                         ).astype(jnp.uint8))


# ---------------------------------------------------------------------------
# Candidate kernels (all via the shape-preserving _windowed_call skeleton)
# ---------------------------------------------------------------------------

def factor_rank1_int(int_mask: np.ndarray):
    """(u, v) integer column/row factors with mask == outer(u, v), or None.
    Scales so that gcd(v) == 1; exactness checked elementwise."""
    m = int_mask.astype(np.int64)
    if (m < 0).any() or m.sum() == 0:
        return None
    # pick the first nonzero row as the row-profile candidate
    r = next((row for row in m if row.any()), None)
    if r is None:
        return None
    g = np.gcd.reduce(r[r != 0]) if (r != 0).any() else 1
    v = r // g
    u = []
    for row in m:
        nz = v != 0
        if not nz.any():
            return None
        q, rem = np.divmod(row[nz], v[nz])
        if rem.any() or not (q == q[0]).all():
            return None
        if not (row[~nz] == 0).all():
            return None
        u.append(int(q[0]))
    u = np.array(u, dtype=np.int64)
    if not (np.outer(u, v) == m).all():
        return None
    return u.astype(np.int32), v.astype(np.int32)


def make_conv_rank1_packed(layout, kh, kw, shift, int_mask):
    """Dense conv via exact rank-1 factoring: unrounded row-MAC then
    col-MAC, single round-half-up — bit-identical to the dense 9/25-tap
    form. Runtime factor values in SMEM (u then v concatenated)."""
    uv = factor_rank1_int(int_mask)
    assert uv is not None
    u, v = uv
    assert 255 * int(int_mask.sum()) < (1 << 16)  # packed fields exact
    hy, hx = kh // 2, kw // 2
    band = layout.band
    hb = band // 2
    w_rows = hb + 2 * hy
    half = 1 << (shift - 1)
    mask_flat = np.concatenate([u, v]).astype(np.int32)

    def body(x_vmem, out_ref, mask_ref):
        lo = x_vmem[0:w_rows, :].astype(jnp.int32)
        hi = x_vmem[hb:hb + w_rows, :].astype(jnp.int32)
        p = lo + (hi << 16)
        rowsum = None  # v-profile horizontal MAC, UNROUNDED
        for kx in range(kw):
            t = _shift(p, kx - hx) * mask_ref[kh + kx]
            rowsum = t if rowsum is None else rowsum + t
        acc = None  # u-profile vertical MAC over row slices
        for ky in range(kh):
            t = rowsum[ky:ky + hb, :] * mask_ref[ky]
            acc = t if acc is None else acc + t
        out_ref[0, 0:hb] = (((acc & 0xFFFF) + half) >> shift
                            ).astype(jnp.uint8)
        out_ref[0, hb:band] = ((jax.lax.shift_right_logical(acc, 16) + half)
                               >> shift).astype(jnp.uint8)

    return _windowed_call(layout, hy, body, mask_args=(mask_flat,))


def make_erosion_square_qroll(layout):
    """3x3 square erosion with horizontal taps from quarter-cost rolls on
    the window's native u8 (4,1) byte packing (raw window: blen rows,
    4-aligned at its start, so the bitcast is relayout-free)."""
    hy = 1
    band = layout.band
    base = 8 - hy

    def body(xw, out_ref, *_):
        v32 = pltpu.bitcast(xw, jnp.int32)  # (blen/4, wp): 4 rows/lane
        left = pltpu.bitcast(pltpu.roll(v32, 1, axis=1), jnp.uint8)
        right = pltpu.bitcast(pltpu.roll(v32, v32.shape[1] - 1, axis=1),
                              jnp.uint8)
        n = band + 2 * hy
        a = left[base:base + n].astype(jnp.int32)
        b = xw[base:base + n].astype(jnp.int32)
        c = right[base:base + n].astype(jnp.int32)
        h = jnp.minimum(jnp.minimum(a, b), c)
        out = jnp.minimum(jnp.minimum(h[0:band], h[1:band + 1]),
                          h[2:band + 2])
        out_ref[0] = out.astype(jnp.uint8)

    return _windowed_call(layout, hy, body, raw_window=True)


def main():
    image = load_image("/root/reference/assets/fundus.jpg")
    layout = make_layout(*image.shape[:2])
    planar = jax.device_put(to_planar_padded(image, layout))

    print("legality probes:")
    probe_legality()

    ops = build_ops(layout)
    candidates = {
        "conv3x3 BASE (packed 9-tap)": ops["Convolution-3x3"],
        "conv3x3 rank1 (packed 6-MAC)": make_conv_rank1_packed(
            layout, 3, 3, spec.BLUR_3X3_SHIFT, spec.BLUR_3X3_INT),
        "conv5x5 BASE (packed 25-tap)": ops["Convolution-5x5"],
        "conv5x5 rank1 (packed 10-MAC)": make_conv_rank1_packed(
            layout, 5, 5, spec.BLUR_5X5_SHIFT, spec.BLUR_5X5_INT),
        "erosion-square BASE": ops["Erosion-3x3-Square"],
        "erosion-square qroll": make_erosion_square_qroll(layout),
        "blur3x3 BASE (specialized)": ops["Gaussian-Blur-3x3"],
    }
    golden = {
        "conv3x3": oracle.IMAGE_OPS["Convolution-3x3"](image),
        "conv5x5": oracle.IMAGE_OPS["Convolution-5x5"](image),
        "erosion-square": oracle.IMAGE_OPS["Erosion-3x3-Square"](image),
        "blur3x3": oracle.IMAGE_OPS["Gaussian-Blur-3x3"](image),
    }
    py, px = layout.pad_y, layout.pad_x
    h, w = image.shape[:2]

    for name, fn in candidates.items():
        out = np.asarray(jax.block_until_ready(fn(planar)))
        got = np.transpose(out[:, py:py + h, px:px + w], (1, 2, 0))
        want = golden[name.split(" ")[0]]
        ok = np.array_equal(got, want)
        print(f"  {name:32s} exact={ok}")
        if not ok:
            d = got.astype(int) - want.astype(int)
            print(f"    max|d|={np.abs(d).max()} npx={(d != 0).sum()}")

    print("chained-K execution times:")
    for name, fn in candidates.items():
        t = execution_time(fn, planar, k1=20, k2=120, samples=4)
        print(f"  {name:32s} {t * 1e6:8.1f} us")


if __name__ == "__main__":
    main()
