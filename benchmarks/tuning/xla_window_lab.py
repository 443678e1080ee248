#!/usr/bin/env python3
"""X-path windowed-op floor lab (round 3, VERDICT r2 item 6).

Round-2 state: X-path erosion 293-549 us, dense conv 620-1333 us true
execution — losing to OpenCV's (async-timed) 259-327 us rows. This lab
(a) measures candidate XLA formulations against the shipped ones in ONE
weather window, and (b) measures the PRIMITIVE costs an XLA-generated
windowed kernel is built from, to calibrate a DESIGN-§2c-style cost law
for the X-path (what does a fused pass cost per min-tap / MAC-term /
widen on this array?).

Formulation candidates (all plain jnp/lax = library calls, bit-exact):
  conv/rank1      dense conv as unrounded col-MAC + row-MAC + one round
                  (factor_rank1_int; kh+kw terms instead of kh*kw — the
                  P-path's factorization, equally expressible in jnp)
  conv/f32_rank1  same shape in f32 arithmetic (exactness NOT required
                  here - measurement only, to see if f32 VPU MACs are
                  cheaper than i32)
  ero/nopad       interior via shifted slices of the unpadded array +
                  1-px mirror strip fix, halving the pad materialization
  ero/i32         erosion with an explicit widen to i32 (is u8 min
                  legalized or silently widened?)
  ero/flat        flat (H, W*3) domain with +-3 minor shifts (does the
                  2-D HWC slice form pay a relayout the flat form skips?)

Primitives (cost-law calibration):
  prim/copy_u8    1 read + 1 write of the 24.5 MB array (stream floor)
  prim/widen      u8 -> i32 -> u8 round trip (cast cost)
  prim/min_k      min over k row-shifted slices, k = 2, 4, 6 (per-tap cost)
  prim/mac_k      i32 MAC over k row-shifted slices, k = 3, 6, 10
                  (per-term cost; row shifts avoid lane work)

Protocol: chained-K marginal (K=50/250), median of 5, bit-check before
timing where exactness is claimed. Run: python xla_window_lab.py
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
from dip_benchmark_tpu.ops import xla as X  # noqa: E402
from dip_benchmark_tpu.ops.pallas.window import factor_rank1_int  # noqa: E402
from dip_benchmark_tpu.runtime.cache import enable_compilation_cache  # noqa: E402
from dip_benchmark_tpu.utils.image import load_image  # noqa: E402

FUNDUS = "/root/reference/assets/fundus.jpg"
K1, K2 = int(os.environ.get("K1", "50")), int(os.environ.get("K2", "250"))


# -- conv candidates --------------------------------------------------------

def conv_rank1(x, int_mask, shift):
    """Unrounded col-MAC + row-MAC + one round-half-up: bit-identical to
    the dense kh*kw MAC (integer associativity; factor_rank1_int)."""
    u, v = factor_rank1_int(int_mask)
    kh, kw = int_mask.shape
    h, w, c = x.shape
    p = X.mirror_pad(x, kh // 2, kw // 2).astype(jnp.int32)
    col = None
    for ky in range(kh):
        t = int(u[ky]) * lax.slice(p, (ky, 0, 0),
                                   (ky + h, w + kw - 1, c))
        col = t if col is None else col + t
    acc = None
    for kx in range(kw):
        t = int(v[kx]) * lax.slice(col, (0, kx, 0), (h, kx + w, c))
        acc = t if acc is None else acc + t
    half = 1 << (shift - 1)
    return jnp.clip((acc + half) >> shift, 0, 255).astype(jnp.uint8)


def conv_rank1_f32(x, int_mask, shift):
    """Same two-pass shape in f32 (timing probe only — not bit-exact)."""
    u, v = factor_rank1_int(int_mask)
    kh, kw = int_mask.shape
    h, w, c = x.shape
    p = X.mirror_pad(x, kh // 2, kw // 2).astype(jnp.float32)
    col = None
    for ky in range(kh):
        t = float(u[ky]) * lax.slice(p, (ky, 0, 0),
                                     (ky + h, w + kw - 1, c))
        col = t if col is None else col + t
    acc = None
    for kx in range(kw):
        t = float(v[kx]) * lax.slice(col, (0, kx, 0), (h, kx + w, c))
        acc = t if acc is None else acc + t
    return jnp.clip(jnp.floor(acc / (1 << shift) + 0.5), 0,
                    255).astype(jnp.uint8)


# -- erosion candidates -----------------------------------------------------

def ero_square_i32(x):
    h, w, _ = x.shape
    p = X.mirror_pad(x, 1, 1).astype(jnp.int32)
    rows = X._min_slices(p, [(0, 0), (1, 0), (2, 0)], h, w + 2)
    return X._min_slices(rows, [(0, 0), (0, 1), (0, 2)], h,
                         w).astype(jnp.uint8)


def ero_square_flat(x):
    """Flat (H, W*3) domain: x-taps are +-3 minor shifts via slices of a
    3-col-padded flat array; row taps are major-dim slices."""
    h, w, c = x.shape
    n = w * c
    f = x.reshape(h, n)
    # vertical first on the unpadded flat array (mirror rows via slices)
    top = jnp.flip(f[1:2], axis=0)
    bot = jnp.flip(f[-2:-1], axis=0)
    fv = jnp.concatenate([top, f, bot], axis=0)
    rows = jnp.minimum(jnp.minimum(fv[0:h], fv[1:h + 1]), fv[2:h + 2])
    # horizontal: mirror 1 PIXEL = 3 bytes each side in the flat domain —
    # the mirrored pixel keeps its channel order (no byte flip)
    left = rows[:, 3:6]
    right = rows[:, n - 6:n - 3]
    ph = jnp.concatenate([left, rows, right], axis=1)
    out = jnp.minimum(jnp.minimum(
        lax.slice(ph, (0, 0), (h, n)),
        lax.slice(ph, (0, 3), (h, 3 + n))),
        lax.slice(ph, (0, 6), (h, 6 + n)))
    return out.reshape(h, w, c)


def ero_square_nopad(x):
    """Interior from shifted slices of x itself; borders fixed by 1-px
    mirror strips after (no (H+2, W+2) materialization)."""
    h, w, c = x.shape
    # rows: interior h-2 rows exact; fix first/last rows with mirror rule
    rows = jnp.minimum(jnp.minimum(x[0:h - 2], x[1:h - 1]), x[2:h])
    first = jnp.minimum(x[0], x[1])[None]          # mirror: min(x1,x0,x1)
    last = jnp.minimum(x[h - 2], x[h - 1])[None]
    rows = jnp.concatenate([first, rows, last], axis=0)
    colm = jnp.minimum(jnp.minimum(rows[:, 0:w - 2], rows[:, 1:w - 1]),
                       rows[:, 2:w])
    cfirst = jnp.minimum(rows[:, 0], rows[:, 1])[:, None]
    clast = jnp.minimum(rows[:, w - 2], rows[:, w - 1])[:, None]
    return jnp.concatenate([cfirst, colm, clast], axis=1)


# -- harness ----------------------------------------------------------------

def main() -> int:
    enable_compilation_cache()
    if os.path.exists(FUNDUS):
        image = load_image(FUNDUS)
    else:
        rng = np.random.default_rng(0)
        image = rng.integers(0, 256, size=(2336, 3504, 3), dtype=np.uint8)
    x = jax.block_until_ready(jax.device_put(image))
    h, w, c = image.shape

    def chained(op, k):
        return jax.jit(lambda v: lax.fori_loop(
            0, k, lambda i, u: op(u), v)).lower(x).compile()

    def t_sync(fn, n=5):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            y = fn(x)
            np.asarray(y.ravel()[0])
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    def run(name, op, check=None):
        try:
            if check is not None:
                got = np.asarray(jax.jit(op)(x))
                tag = "OK " if np.array_equal(got, check) else "BAD"
            else:
                np.asarray(jax.jit(op)(x).ravel()[0])  # compiles
                tag = "-- "
            f1, f2 = chained(op, K1), chained(op, K2)
            t1, t2 = t_sync(f1), t_sync(f2)
            te = (t2 - t1) / (K2 - K1)
            print(f"  {name:26s} [{tag}] exec {te * 1e6:7.1f} us/pass",
                  flush=True)
            return te
        except Exception as e:
            print(f"  {name:26s} FAILED: {str(e)[:110]}", flush=True)
            return None

    O = oracle.IMAGE_OPS

    # shipped baselines (same window!)
    run("ship/ero-square", X.erosion_square, O["Erosion-3x3-Square"](image))
    run("ship/ero-sep", X.erosion_separated,
        O["Erosion-1x3+3x1-Square"](image))
    run("ship/conv3", X.convolution_3x3, O["Convolution-3x3"](image))
    run("ship/conv5", X.convolution_5x5, O["Convolution-5x5"](image))

    # candidates
    run("cand/ero-i32", ero_square_i32, O["Erosion-3x3-Square"](image))
    run("cand/ero-flat", ero_square_flat, O["Erosion-3x3-Square"](image))
    run("cand/ero-nopad", ero_square_nopad, O["Erosion-3x3-Square"](image))
    run("cand/conv3-rank1",
        lambda v: conv_rank1(v, spec.BLUR_3X3_INT, spec.BLUR_3X3_SHIFT),
        O["Convolution-3x3"](image))
    run("cand/conv5-rank1",
        lambda v: conv_rank1(v, spec.BLUR_5X5_INT, spec.BLUR_5X5_SHIFT),
        O["Convolution-5x5"](image))
    run("cand/conv3-f32rank1",
        lambda v: conv_rank1_f32(v, spec.BLUR_3X3_INT, spec.BLUR_3X3_SHIFT))
    run("cand/conv5-f32rank1",
        lambda v: conv_rank1_f32(v, spec.BLUR_5X5_INT, spec.BLUR_5X5_SHIFT))

    # primitives (cost-law calibration; all shape-preserving)
    run("prim/copy_u8", jnp.copy)
    run("prim/widen", lambda v: v.astype(jnp.int32).astype(jnp.uint8))
    for k in (2, 4, 6):
        def min_k(v, k=k):
            p = jnp.concatenate([v, v[-k:]], axis=0)
            acc = None
            for i in range(k + 1):
                t = p[i:i + h]
                acc = t if acc is None else jnp.minimum(acc, t)
            return acc
        run(f"prim/min_{k + 1}tap", min_k)
    for k in (3, 6, 10):
        def mac_k(v, k=k):
            p = jnp.concatenate([v, v[-k:]], axis=0).astype(jnp.int32)
            acc = None
            for i in range(k):
                t = (i + 1) * p[i:i + h]
                acc = t if acc is None else acc + t
            return (acc >> 4).astype(jnp.uint8)
        run(f"prim/mac_{k}term", mac_k)
    return 0


if __name__ == "__main__":
    sys.exit(main())
