#!/usr/bin/env python3
"""X-path fused pipeline, round 2: one flat-minor-dim formulation.

The shipped X-path pipeline composes the four ops (grayscale -> threshold
-> erosion -> blur) under one jit, but each op round-trips through uint8
HWC with its own mirror_pad — the pads/relayouts break XLA fusion and the
chain measures ~1.3 ms. Reformulation: stay on the flat (H, W*3) i32
domain end to end —

  1. coef-rows grayscale MAC (the shipped op's scheme) -> i32 luma/byte;
  2. threshold on the i32 value (no narrow);
  3. erosion 3x3 square: per-byte min over taps (dy, 3*dx) — channels
     never mix, so stride-3 column taps ARE per-channel taps; separable
     row-min/col-min (4 mins);
  4. specialized blur: separable integer MAC (dy, then +-3 cols), ONE
     round-half-up, ONE narrow at the end.

Exactness: threshold output is exactly {0, 255} held in i32; min and the
integer MAC then reproduce the op-by-op uint8 chain bit-for-bit (same
argument as the Pallas pipeline, models/pipeline.py). Mirror borders come
from one jnp.pad per axis on the flat array (rows) + 6 columns (2 pixels)
horizontally, matching each stage's standalone mirror semantics because
all masks are symmetric and the halo shrinks by the stage radius.
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/benchmarks/", 1)[0])

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from dip_benchmark_tpu import oracle, spec  # noqa: E402
from dip_benchmark_tpu.ops import xla  # noqa: E402


def flat_pipeline(x: jnp.ndarray) -> jnp.ndarray:
    h, w, c = x.shape
    n = w * c
    f = x.reshape(h, n)
    # --- stage 1+2: coef-rows grayscale MAC -> threshold, i32 domain ---
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
    luma = acc >> spec.GRAYSCALE_SHIFT
    v = jnp.where(luma > spec.THRESHOLD_VALUE, spec.THRESHOLD_MAX, 0)
    # --- mirror halo for the two windowed stages: 2 rows, 2 pixels ---
    # rows: flip row blocks; cols: flip PIXEL blocks (3-byte groups)
    v = jnp.concatenate([v[1:3][::-1], v, v[-2:][::-1]], axis=0)
    hp = v.shape[0]
    left = v[:, 3:9].reshape(hp, 2, 3)[:, ::-1].reshape(hp, 6)
    right = v[:, n - 6:n].reshape(hp, 2, 3)[:, ::-1].reshape(hp, 6)
    v = jnp.concatenate([left, v, right], axis=1)  # (h+4, n+12)

    # --- stage 3: erosion 3x3 square, separable min, taps (dy, 3*dx) ---
    rows = h + 2  # keep 1 row + 1 pixel of halo for the blur
    cm = jnp.minimum(jnp.minimum(v[0:rows], v[1:rows + 1]), v[2:rows + 2])
    m = 6 + n  # valid span start offset at byte 3 after erosion crop
    e = jnp.minimum(jnp.minimum(cm[:, 0:m], cm[:, 3:m + 3]),
                    cm[:, 6:m + 6])  # (h+2, n+6)
    # --- stage 4: specialized 1-2-1 blur, one round, one narrow ---
    aux = e[0:h] + (e[1:h + 1] << 1) + e[2:h + 2]
    o = aux[:, 0:n] + (aux[:, 3:n + 3] << 1) + aux[:, 6:n + 6]
    y = (o + 8) >> 4
    return y.astype(jnp.uint8).reshape(h, w, c)


def main():
    cpu = "--cpu" in sys.argv
    if cpu:
        jax.config.update("jax_platforms", "cpu")
    rng = np.random.default_rng(0)
    for shape in [(9, 11, 3), (37, 53, 3), (64, 96, 3)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        got = np.asarray(jax.jit(flat_pipeline)(img))
        want = oracle.IMAGE_OPS["Fused-Pipeline"](img)
        np.testing.assert_array_equal(got, want, err_msg=f"{shape}")
    print("flat pipeline bit-exact vs oracle on CPU shapes: OK")
    if cpu:
        return

    from dip_benchmark_tpu.runtime.cache import enable_compilation_cache
    from dip_benchmark_tpu.runtime.exec_timing import execution_time
    from dip_benchmark_tpu.utils.image import load_image
    enable_compilation_cache()
    image = load_image("/root/reference/assets/fundus.jpg")
    x = jax.device_put(image)
    want = oracle.IMAGE_OPS["Fused-Pipeline"](image)
    def pipeline_compose(img):  # the pre-round-2-end form, for comparison
        return xla.gaussian_blur_3x3(
            xla.erosion_square(xla.threshold(xla.grayscale(img))))

    for name, fn in (("op-compose(old)", pipeline_compose),
                     ("flat-domain(lab)", flat_pipeline),
                     ("shipped", xla.fused_pipeline)):
        got = np.asarray(jax.jit(fn)(x))
        ok = np.array_equal(got, want)
        t = execution_time(fn, x, k1=20, k2=100, samples=5)
        print(f"  {name:20s} exact={ok} exec {t * 1e6:9.1f} us/image")


if __name__ == "__main__":
    main()
