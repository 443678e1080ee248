#!/usr/bin/env python3
"""Round-5 hardware validation of the round-4/5 wide surfaces.

One process, ordered so all timing happens before any bulk D2H:

  A. WideBenchmarkSession at a beyond-envelope width whose HEIGHT makes
     banded_height 336-divisible (2330 -> banded 2352): on this height
     the packed conv-5x5's band upsize is active and BUDGET-CAPPED
     (utils/image.conv5_effective_band, round-5 advisor fix) — at the
     default 5120 strips the uncapped pick (336) models ~20 MiB, so this
     anchor proves the capped pick compiles and is bit-exact at real
     whole-slide size.
  B. wide_fused_chain: the --fuse surface over strips (one fused kernel
     per strip + seam refresh), bit-checked vs the sequential oracle.
  C. build_sharded_wide_ops on a 1-device mesh (the strips-per-shard
     model's shard_map programs through the real Mosaic compiler).

Env: HEIGHT (2330), WIDTH (56320 = 11 x 5120), K1/K2 exec marginal.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np  # noqa: E402

import jax  # noqa: E402
from jax import lax  # noqa: E402

from dip_benchmark_tpu import native, oracle  # noqa: E402
from dip_benchmark_tpu.models import wide  # noqa: E402
from dip_benchmark_tpu.runtime.cache import enable_compilation_cache  # noqa: E402
from dip_benchmark_tpu.utils import image as image_mod  # noqa: E402

HEIGHT = int(os.environ.get("HEIGHT", "2330"))
WIDTH = int(os.environ.get("WIDTH", "56320"))
K1 = int(os.environ.get("K1", "5"))
K2 = int(os.environ.get("K2", "25"))
COLS = os.environ.get(
    "COLS", "Convolution-5x5,Erosion-3x3-Square,Gaussian-Blur-3x3"
).split(",")
CHAIN = ("Grayscale", "Threshold", "Erosion-3x3-Square")
# Strip-width override (0 = the model's default plan) — see wide_probe.py.
STRIP = int(os.environ.get("STRIP", "0")) or None


def _exec_marginal(op, src):
    def chained(k):
        return jax.jit(lambda v: lax.fori_loop(
            0, k, lambda i, u: op(u), v)).lower(src).compile()
    f1, f2 = chained(K1), chained(K2)

    def t_sync(fn, n=5):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            y = fn(src)
            leaf = jax.tree.leaves(y)[0]
            np.asarray(leaf.ravel()[0])  # forced completion
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))
    return (t_sync(f2) - t_sync(f1)) / (K2 - K1)


def main() -> int:
    enable_compilation_cache()
    ops_oracle = native.image_ops() if native.available() else oracle.IMAGE_OPS
    rng = np.random.default_rng(11)
    image = rng.integers(0, 256, size=(HEIGHT, WIDTH, 3), dtype=np.uint8)
    mb = image.nbytes / 2**20

    # A. wide session ops at the capped conv band
    wl = wide.make_wide_layout(HEIGHT, WIDTH, strip_width=STRIP)
    eff = image_mod.conv5_effective_band(wl.layouts[0])
    print(f"plan: {wl.n_strips} strips of {wl.strip_width} "
          f"(band {wl.layouts[0].band}, conv-5x5 effective band {eff}, "
          f"banded {wl.layouts[0].banded_height}) over "
          f"{HEIGHT}x{WIDTH} ({mb:.0f} MiB)", flush=True)
    strips = wide.put_wide(wide.to_wide_resident(image, wl))
    jax.block_until_ready(strips)
    ops = wide.build_wide_ops(wl)
    exec_rows = []
    for col in COLS:
        t0 = time.perf_counter()
        out = jax.block_until_ready(ops[col](strips))
        print(f"  {col}: first call {time.perf_counter() - t0:.1f}s "
              f"(compile)", flush=True)
        exec_rows.append((col, _exec_marginal(ops[col], strips), out))

    # B. fused chain over strips
    chain_fn = wide.wide_fused_chain(wl, CHAIN)
    t0 = time.perf_counter()
    chain_out = jax.block_until_ready(chain_fn(strips))
    print(f"  chain {'+'.join(CHAIN)}: first call "
          f"{time.perf_counter() - t0:.1f}s (compile)", flush=True)
    t_chain = _exec_marginal(chain_fn, strips)

    # C. sharded-wide on the 1-device mesh (real Mosaic via shard_map)
    from dip_benchmark_tpu.parallel import make_mesh
    from dip_benchmark_tpu.parallel import wide as swide
    mesh = make_mesh(n_space=1)
    sops, swl = swide.build_sharded_wide_ops(mesh, HEIGHT, WIDTH,
                                             strip_width=STRIP)
    sstrips = swide.put_sharded_wide(
        swide.to_sharded_wide_resident(image, swl, 1), mesh)
    jax.block_until_ready(sstrips)
    t0 = time.perf_counter()
    sout = jax.block_until_ready(sops["Convolution-5x5"](sstrips))
    print(f"  sharded-wide Convolution-5x5: first call "
          f"{time.perf_counter() - t0:.1f}s (compile)", flush=True)
    t_sw = _exec_marginal(sops["Convolution-5x5"], sstrips)
    # ... and the fused strip-per-shard chain (the round-5 session's
    # --fuse surface) through the real Mosaic compiler
    schain = swide.sharded_wide_chain(mesh, swl, CHAIN)
    t0 = time.perf_counter()
    scout = jax.block_until_ready(schain(sstrips))
    print(f"  sharded-wide chain {'+'.join(CHAIN)}: first call "
          f"{time.perf_counter() - t0:.1f}s (compile)", flush=True)
    t_sc = _exec_marginal(schain, sstrips)

    # ---- all timing done; now the bulk D2H bit-checks -------------------
    for col, te, out in exec_rows:
        got = wide.from_wide_resident(out, wl)
        ok = np.array_equal(got, ops_oracle[col](image))
        print(f"  {col}: exec {te * 1e6:9.1f} us/app "
              f"({mb / 1024 / te:.1f} GiB/s)  bit-check "
              f"{'OK' if ok else 'MISMATCH'}", flush=True)
    want = image
    for c in CHAIN:
        want = ops_oracle[c](want)
    ok = np.array_equal(wide.from_wide_resident(chain_out, wl), want)
    print(f"  chain: exec {t_chain * 1e6:9.1f} us/app  bit-check "
          f"{'OK' if ok else 'MISMATCH'}", flush=True)
    ok = np.array_equal(
        swide.from_sharded_wide_resident(sout, swl, 1),
        ops_oracle["Convolution-5x5"](image))
    print(f"  sharded-wide conv-5x5: exec {t_sw * 1e6:9.1f} us/app  "
          f"bit-check {'OK' if ok else 'MISMATCH'}", flush=True)
    want = image
    for c in CHAIN:
        want = ops_oracle[c](want)
    ok = np.array_equal(
        swide.from_sharded_wide_resident(scout, swl, 1), want)
    print(f"  sharded-wide chain: exec {t_sc * 1e6:9.1f} us/app  "
          f"bit-check {'OK' if ok else 'MISMATCH'}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
