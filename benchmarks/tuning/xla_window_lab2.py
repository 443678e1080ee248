#!/usr/bin/env python3
"""X-path windowed floor lab, part 2: one-pass forms + operand scaling.

Lab 1 (xla_window_lab.py) measured: a fused u8 min pass costs ~212 us for
3 or 5 row-shifted operands but ~564 us at 7; i32 MAC passes ~75 us +
~10 us/term; widening erosion to i32 DOUBLES it (u8 min is legalized);
rank-1 conv refactoring LOSES (the reused column-sum intermediate breaks
single-pass fusion: 966 vs 607 us) — the shipped dense form is already
the fused optimum shape for conv3x3.

This lab probes (same-window A/B vs the shipped forms):
  ero9/direct      erosion-square as ONE expression over 9 (dy,dx) slices
                   — no reused aux, so XLA can fuse one 9-operand pass
                   (the separable split forces 2 passes via the reused
                   row-min intermediate)
  ero-cross/direct shipped already is direct (5 slices) — re-measure
  ero-sep/flat1st  separable with the 1x3 aux pass NOT reused (inline
                   min(min(a,b),c) twice = 9 slices, same as ero9)
  conv-sep3/ship   shipped X-path separated conv (2 quantized passes)
  conv5/colreuse4  5x5 dense with the 5 column sums each used once
                   (recompute instead of reuse: 25 terms in one pass)
  prim/min_ktap    row-shift min pass at k = 6..10 operands (where is the
                   fusion cliff between 5 and 7?)
  prim/stream      non-elidable single pass (v + 1), the true pass floor
                   (lab 1's copy/widen chains were loop-elided to negative
                   marginals)
  prim/min3_lane   3-tap min with LANE shifts (column taps) vs lab 1's
                   row-shift min — prices the lane-shift premium
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
from dip_benchmark_tpu.runtime.cache import enable_compilation_cache  # noqa: E402
from dip_benchmark_tpu.utils.image import load_image  # noqa: E402

FUNDUS = "/root/reference/assets/fundus.jpg"
K1, K2 = int(os.environ.get("K1", "50")), int(os.environ.get("K2", "250"))


def ero9_direct(x):
    h, w, c = x.shape
    p = X.mirror_pad(x, 1, 1)
    acc = None
    for dy in range(3):
        for dx in range(3):
            t = lax.slice(p, (dy, dx, 0), (dy + h, dx + w, c))
            acc = t if acc is None else jnp.minimum(acc, t)
    return acc


def ero_sep_inline(x):
    """1x3+3x1 with the aux inlined (not reused): one 9-slice pass,
    bit-equal to the two-pass op (min associativity)."""
    return ero9_direct(x)


def conv5_norelay(x):
    """25-term dense in one expression (the shipped form) but accumulation
    grouped column-first per kx WITHOUT naming the intermediate (XLA sees
    one DAG; grouping should not matter — sanity check vs ship/conv5)."""
    kh = kw = 5
    m = spec.BLUR_5X5_INT
    h, w, c = x.shape
    p = X.mirror_pad(x, 2, 2).astype(jnp.int32)
    acc = None
    for kx in range(kw):
        for ky in range(kh):
            t = int(m[ky, kx]) * lax.slice(p, (ky, kx, 0),
                                           (ky + h, kx + w, c))
            acc = t if acc is None else acc + t
    half = 1 << (spec.BLUR_5X5_SHIFT - 1)
    return jnp.clip((acc + half) >> spec.BLUR_5X5_SHIFT, 0,
                    255).astype(jnp.uint8)


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
                np.asarray(jax.jit(op)(x).ravel()[0])
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
    run("ship/ero-square", X.erosion_square, O["Erosion-3x3-Square"](image))
    run("cand/ero9-direct", ero9_direct, O["Erosion-3x3-Square"](image))
    run("cand/ero-sep-inline", ero_sep_inline,
        O["Erosion-1x3+3x1-Square"](image))
    run("ship/ero-cross", X.erosion_cross, O["Erosion-3x3-Cross"](image))
    run("ship/conv-sep3", X.convolution_3x3_separated,
        O["Convolution-1x3+3x1"](image))
    run("ship/conv5", X.convolution_5x5, O["Convolution-5x5"](image))
    run("cand/conv5-kxgroup", conv5_norelay, O["Convolution-5x5"](image))

    # primitives
    run("prim/stream_add1", lambda v: v + jnp.uint8(1))
    for k in (5, 6, 7, 8, 9):
        def min_k(v, k=k):
            p = jnp.concatenate([v, v[-(k - 1):]], axis=0)
            acc = None
            for i in range(k):
                t = p[i:i + h]
                acc = t if acc is None else jnp.minimum(acc, t)
            return acc
        run(f"prim/min_{k}tap_row", min_k)

    def min3_lane(v):
        p = jnp.concatenate([v, v[:, -2:]], axis=1)
        acc = None
        for i in range(3):
            t = p[:, i:i + w]
            acc = t if acc is None else jnp.minimum(acc, t)
        return acc
    run("prim/min3_lane", min3_lane)

    def mac3_lane(v):
        p = jnp.concatenate([v, v[:, -2:]], axis=1).astype(jnp.int32)
        acc = None
        for i in range(3):
            acc = (i + 1) * p[:, i:i + w] + (acc if acc is not None else 0)
        return (acc >> 2).astype(jnp.uint8)
    run("prim/mac3_lane", mac3_lane)
    return 0


if __name__ == "__main__":
    sys.exit(main())
