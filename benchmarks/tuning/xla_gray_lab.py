#!/usr/bin/env python3
"""X-path grayscale, round 2: phase-select formulation on the flat minor dim.

Round-1 finding (xla_lab.py, ops/xla.py comment): every channel-split
formulation of grayscale over interleaved uint8 HWC costs ~5.4 ms/image on
TPU — the strided per-channel access on the C=3 minor axis forces a
relayout (~2.7 ms alone each way).

Round-2 idea (VERDICT r1 item 5): never split channels. Flatten to
(H, W*3) — a free reshape of the row-major layout — and compute EVERY
output byte's luma directly: out[k] must equal luma(pixel k//3) for all k
(the replicate-to-3-channels contract means the flat output is just the
luma repeated per byte, so no jnp.repeat either). Each out[k] needs taps
f[k-2..k+2] selected by k%3:

  phase 0 (k=3i):   R=f[k],   G=f[k+1], B=f[k+2]
  phase 1 (k=3i+1): R=f[k-1], G=f[k],   B=f[k+1]
  phase 2 (k=3i+2): R=f[k-2], G=f[k-1], B=f[k]

Five contiguous shifted slices + two nested selects per channel + the same
f32 MAC as the oracle ((wb*b + wg*g) + wr*r, truncating cast) — all
elementwise, so XLA fuses it into one VPU pass over the flat array.
Bit-exact by construction (each pixel evaluates the identical f32
expression on the identical values as the oracle).

Usage: python benchmarks/tuning/xla_gray_lab.py [--cpu]
Measures old-vs-new with the chained-K marginal (true execution time).
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/benchmarks/", 1)[0])

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dip_benchmark_tpu import oracle, spec  # noqa: E402


def grayscale_old(x):
    r = x[..., 0].astype(jnp.float32)
    g = x[..., 1].astype(jnp.float32)
    b = x[..., 2].astype(jnp.float32)
    wr, wg, wb = (jnp.float32(w) for w in spec.GRAYSCALE_WEIGHTS_RGB)
    gray = (wb * b + wg * g) + wr * r
    gray_u8 = gray.astype(jnp.uint8)
    return jnp.repeat(gray_u8[..., None], 3, axis=2)


from jax import lax  # noqa: E402


def grayscale_phase_select(x):
    """The first round-2 form (shipped until coef-rows beat it 393 -> 308):
    5 shifted slices + 6 wheres + the exact integer MAC."""
    h, w, c = x.shape
    n = w * c
    f = x.reshape(h, n)
    p = jnp.pad(f, ((0, 0), (2, 2)))
    s = {d: lax.slice(p, (0, 2 + d), (h, 2 + d + n))
         for d in (-2, -1, 0, 1, 2)}
    phase = (jnp.arange(n, dtype=jnp.int32) % 3)[None, :]

    def pick(d0, d1, d2):  # tap offset for byte phase 0 / 1 / 2
        return jnp.where(phase == 0, s[d0],
                         jnp.where(phase == 1, s[d1], s[d2]))

    r = pick(0, -1, -2).astype(jnp.int32)
    g = pick(1, 0, -1).astype(jnp.int32)
    b = pick(2, 1, 0).astype(jnp.int32)
    nr, ng, nb = spec.GRAYSCALE_WEIGHTS_INT_RGB
    y = (nr * r + ng * g + nb * b) >> spec.GRAYSCALE_SHIFT
    return y.astype(jnp.uint8).reshape(h, w, c)


# The shipped implementation is now the coef-rows winner below (integer
# fixed-point MAC per the round-2 spec; an earlier f32 variant of the same
# structure revealed the FMA-contraction nondeterminism that motivated the
# integer luma spec — see spec.py).
from dip_benchmark_tpu.ops.xla import grayscale as grayscale_shipped  # noqa: E402


def grayscale_coef_rows(x):
    """Select-free variant: one precomputed periodic i32 coefficient row per
    tap offset d — C_d[k] = w(k%3 + d) when 0 <= k%3 + d <= 2 else 0 — so
    the op is a pure 5-tap MAC (5 muls + 4 adds, no where)."""
    h, w, c = x.shape
    n = w * c
    f = x.reshape(h, n)
    p = jnp.pad(f, ((0, 0), (2, 2)))
    wrgb = np.asarray(spec.GRAYSCALE_WEIGHTS_INT_RGB, dtype=np.int64)
    ks = np.arange(n) % 3
    acc = None
    for d in (-2, -1, 0, 1, 2):
        ch = ks + d
        cd = np.where((ch >= 0) & (ch <= 2), wrgb[np.clip(ch, 0, 2)],
                      0).astype(np.int32)
        s = lax.slice(p, (0, 2 + d), (h, 2 + d + n)).astype(jnp.int32)
        t = s * jnp.asarray(cd)[None, :]
        acc = t if acc is None else acc + t
    y = acc >> spec.GRAYSCALE_SHIFT
    return y.astype(jnp.uint8).reshape(h, w, c)


def grayscale_luma_shift(x):
    """Compute the luma MAC ONCE (valid at phase-0 bytes), then pick
    l[k - k%3] via two selects over shifted copies: 3 muls + 2 adds + 2
    wheres instead of the shipped 3 muls + 6 wheres."""
    h, w, c = x.shape
    n = w * c
    f = x.reshape(h, n)
    p = jnp.pad(f, ((0, 0), (0, 2)))
    s0 = lax.slice(p, (0, 0), (h, n)).astype(jnp.int32)
    s1 = lax.slice(p, (0, 1), (h, 1 + n)).astype(jnp.int32)
    s2 = lax.slice(p, (0, 2), (h, 2 + n)).astype(jnp.int32)
    nr, ng, nb = spec.GRAYSCALE_WEIGHTS_INT_RGB
    luma = (nr * s0 + ng * s1 + nb * s2) >> spec.GRAYSCALE_SHIFT
    lp = jnp.pad(luma, ((0, 0), (2, 0)))
    l1 = lax.slice(lp, (0, 1), (h, 1 + n))
    l2 = lax.slice(lp, (0, 0), (h, n))
    phase = (jnp.arange(n, dtype=jnp.int32) % 3)[None, :]
    y = jnp.where(phase == 0, luma, jnp.where(phase == 1, l1, l2))
    return y.astype(jnp.uint8).reshape(h, w, c)


def main():
    cpu = "--cpu" in sys.argv
    if cpu:
        jax.config.update("jax_platforms", "cpu")

    rng = np.random.default_rng(0)
    for shape in [(37, 53, 3), (128, 256, 3)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        want = oracle.IMAGE_OPS["Grayscale"](img)
        for fn in (grayscale_shipped, grayscale_phase_select,
                   grayscale_coef_rows, grayscale_luma_shift):
            got = np.asarray(jax.jit(fn)(img))
            np.testing.assert_array_equal(
                got, want, err_msg=f"{fn.__name__} {shape}")
    print("bit-exact vs oracle on CPU-checkable shapes: OK")

    if cpu:
        return

    from dip_benchmark_tpu.runtime.exec_timing import execution_time
    from dip_benchmark_tpu.utils.image import load_image

    image = load_image("/root/reference/assets/fundus.jpg")
    x = jax.device_put(image)
    # verify on hardware first (axon fusion miscompiles exist)
    got = np.asarray(jax.jit(grayscale_phase_select)(x))
    want = oracle.IMAGE_OPS["Grayscale"](image)
    ok = np.array_equal(got, want)
    print(f"TPU bit-exact: {ok}")
    if not ok:
        diff = got.astype(int) - want.astype(int)
        print("max|diff|", np.abs(diff).max(), "npx", (diff != 0).sum())

    for name, fn in [("shipped", grayscale_shipped),
                     ("phase-select", grayscale_phase_select),
                     ("coef-rows", grayscale_coef_rows),
                     ("luma-shift", grayscale_luma_shift)]:
        got = np.asarray(jax.jit(fn)(x))
        if not np.array_equal(got, want):
            print(f"  {name:22s} NOT bit-exact on TPU — skipped")
            continue
        t = execution_time(fn, x, k1=5, k2=25, samples=3)
        print(f"  {name:22s} exec {t * 1e6:9.1f} us/image")


if __name__ == "__main__":
    main()
