#!/usr/bin/env python3
"""X-path formulation lab: exec-time of jnp/lax variants on uint8 HWC.

exec_probe showed the X-path grayscale at ~5.4 ms (minor-dim gathers +
repeat on the C=3 lane axis) and reduce_window erosion at ~1.4 ms.
Candidates keep plain jnp/lax (XLA-generated kernels) and bit-exactness.
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
K1, K2 = 30, 300


def gray_tensordot(x):
    w = jnp.asarray(spec.GRAYSCALE_WEIGHTS_RGB, jnp.float32)
    xf = x.astype(jnp.float32)
    # SYCL accumulation order (wb*b + wg*g) + wr*r == dot order b,g,r
    gray = (w[2] * xf[..., 2] + w[1] * xf[..., 1]) + w[0] * xf[..., 0]
    g8 = gray.astype(jnp.uint8)
    return jnp.broadcast_to(g8[..., None], x.shape)


def gray_matmul(x):
    wb, wg, wr = (jnp.float32(w) for w in spec.GRAYSCALE_WEIGHTS_RGB[::-1])
    xf = x.astype(jnp.float32)
    w = jnp.array([[spec.GRAYSCALE_WEIGHTS_RGB[0]],
                   [spec.GRAYSCALE_WEIGHTS_RGB[1]],
                   [spec.GRAYSCALE_WEIGHTS_RGB[2]]], jnp.float32)
    # (H, W, 3) @ (3, 1): reduction over the minor axis on the MXU... but
    # order must match SYCL: dot computes r+g+b in one fused reduce; for
    # these weights the sums are exact in f32 so order is irrelevant ONLY
    # if no rounding occurs — NOT guaranteed; check bit-exactness.
    gray = jnp.einsum("hwc,cd->hwd", xf, w)
    g8 = gray[..., 0].astype(jnp.uint8)
    return jnp.broadcast_to(g8[..., None], x.shape)


def erosion_square_slices(x):
    p = X.mirror_pad(x, 1, 1).astype(jnp.uint8)
    h, w, c = x.shape
    rows = jnp.minimum(jnp.minimum(
        lax.slice(p, (0, 0, 0), (h, w + 2, c)),
        lax.slice(p, (1, 0, 0), (h + 1, w + 2, c))),
        lax.slice(p, (2, 0, 0), (h + 2, w + 2, c)))
    return jnp.minimum(jnp.minimum(
        lax.slice(rows, (0, 0, 0), (h, w, c)),
        lax.slice(rows, (0, 1, 0), (h, w + 1, c))),
        lax.slice(rows, (0, 2, 0), (h, w + 2, c)))


def erosion_cross_slices(x):
    p = X.mirror_pad(x, 1, 1).astype(jnp.uint8)
    h, w, c = x.shape
    mid = lax.slice(p, (1, 1, 0), (h + 1, w + 1, c))
    vert = jnp.minimum(jnp.minimum(
        lax.slice(p, (0, 1, 0), (h, w + 1, c)), mid),
        lax.slice(p, (2, 1, 0), (h + 2, w + 1, c)))
    return jnp.minimum(jnp.minimum(
        lax.slice(p, (1, 0, 0), (h + 1, w, c)), vert),
        lax.slice(p, (1, 2, 0), (h + 1, w + 2, c)))


def erosion_sep_slices(x):
    p = X.mirror_pad(x, 0, 1)
    h, w, c = x.shape
    aux = jnp.minimum(jnp.minimum(
        lax.slice(p, (0, 0, 0), (h, w, c)),
        lax.slice(p, (0, 1, 0), (h, w + 1, c))),
        lax.slice(p, (0, 2, 0), (h, w + 2, c)))
    p2 = X.mirror_pad(aux, 1, 0)
    return jnp.minimum(jnp.minimum(
        lax.slice(p2, (0, 0, 0), (h, w, c)),
        lax.slice(p2, (1, 0, 0), (h + 1, w, c))),
        lax.slice(p2, (2, 0, 0), (h + 2, w, c)))


def main() -> int:
    enable_compilation_cache()
    if os.path.exists(FUNDUS):
        image = load_image(FUNDUS)
    else:
        rng = np.random.default_rng(0)
        image = rng.integers(0, 256, size=(2336, 3504, 3), dtype=np.uint8)
    x = jax.block_until_ready(jax.device_put(image))

    def chained(op, k):
        return jax.jit(lambda v: lax.fori_loop(0, k, lambda i, u: op(u), v)
                       ).lower(x).compile()

    def t_sync(fn, n=5):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            y = fn(x)
            np.asarray(y[0, 0, 0])
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    O = oracle.IMAGE_OPS
    cases = {
        "gray/current": (O["Grayscale"], X.grayscale),
        "gray/tensordot": (O["Grayscale"], gray_tensordot),
        "gray/einsum": (O["Grayscale"], gray_matmul),
        "erosion-sq/reduce_window": (O["Erosion-3x3-Square"],
                                     X.erosion_square),
        "erosion-sq/slices": (O["Erosion-3x3-Square"], erosion_square_slices),
        "erosion-cross/slices": (O["Erosion-3x3-Cross"],
                                 erosion_cross_slices),
        "erosion-sep/slices": (O["Erosion-1x3+3x1-Square"],
                               erosion_sep_slices),
    }
    for name, (check, op) in cases.items():
        try:
            got = np.asarray(jax.jit(op)(x))
            ok = "OK " if np.array_equal(got, check(image)) else "BAD"
            f1, f2 = chained(op, K1), chained(op, K2)
            t1, t2 = t_sync(f1), t_sync(f2)
            te = (t2 - t1) / (K2 - K1)
            print(f"  {name:26s} [{ok}] exec {te * 1e6:7.1f} us/pass "
                  f"(T{K1}={t1 * 1e3:6.1f} T{K2}={t2 * 1e3:6.1f} ms)")
        except Exception as e:
            print(f"  {name:26s} FAILED: {str(e)[:110]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())


def gray_via_chw(x):
    xt = jnp.transpose(x, (2, 0, 1)).astype(jnp.float32)  # (3, H, W)
    wr, wg, wb = (jnp.float32(w) for w in spec.GRAYSCALE_WEIGHTS_RGB)
    gray = ((wb * xt[2] + wg * xt[1]) + wr * xt[0]).astype(jnp.uint8)
    return jnp.transpose(
        jnp.broadcast_to(gray[None], (3,) + gray.shape), (1, 2, 0))
