#!/usr/bin/env python3
"""Download decomposition lab (round 3, VERDICT r2 item 1).

The Download row (session._download) times, per round:
    (a) dispatch+sync of a fresh D2D copy  — jit(jnp.copy), needed so the
        D2H below cannot be served from jax.Array's cached host copy
    (b) np.asarray(fresh)                  — the actual D2H read

BENCH_r02 measured Download p50 1.40 s vs a 1.04 s raw-read floor (1.34x)
and left ~350 ms/round unexplained. This lab decomposes the gap IN ONE
WEATHER WINDOW (relay throughput swings 1.5-2x between windows, so only
intra-run ratios are meaningful):

  1. floor        np.asarray(y) alone, fresh copy outside the timed region
                  (exactly bench._d2h_floor)
  2. copy_sync    dispatch+sync of the fresh copy alone (post-first-D2H
                  rig state, where dispatch is degraded ~500x)
  3. op           fresh copy + read together (the Download op's timed body)
  4. chunk_k      chunked D2H: k row-slices dispatched as separate device
                  arrays, all .copy_to_host_async()'d, then materialized —
                  probes whether the relay pipelines concurrent reads
  5. device_get   jax.device_get instead of np.asarray (API-path check)
  6. size sweep   floor at 1/4, 1/2, 1x payload — fixed-cost vs
                  bandwidth-bound split of the read itself

Each measurement: median of REPS (default 5) with a fresh copy per rep.
Run on the real TPU: python benchmarks/tuning/download_lab.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


REPS = int(os.environ.get("REPS", "5"))
MB = 1024 * 1024
NBYTES = int(os.environ.get("NBYTES", str(2336 * 3504 * 3)))  # fundus bytes


def med(fn, reps=REPS):
    ts = []
    for _ in range(reps):
        ts.append(fn())
    return float(np.median(ts)), [round(t, 3) for t in sorted(ts)]


def main() -> int:
    rng = np.random.default_rng(3)
    host = rng.integers(0, 256, size=NBYTES, dtype=np.uint8)
    fresh = jax.jit(jnp.copy)
    x = jax.block_until_ready(jax.device_put(host))

    # Enter the post-first-D2H rig state ONCE, up front (the state every
    # Download round runs in).
    np.asarray(jax.block_until_ready(fresh(x)))

    print(f"payload {NBYTES / MB:.1f} MiB, reps {REPS}", file=sys.stderr)
    rows = []

    def report(name, t, detail=""):
        rows.append((name, t))
        print(f"  {name:18s} {t:8.3f} s   {detail}", file=sys.stderr)

    # 1. floor: read only
    def floor_once():
        y = jax.block_until_ready(fresh(x))
        t0 = time.perf_counter()
        np.asarray(y)
        return time.perf_counter() - t0
    t, d = med(floor_once)
    report("floor_read", t, f"all {d}")

    # 2. fresh-copy dispatch+sync alone
    def copy_once():
        t0 = time.perf_counter()
        jax.block_until_ready(fresh(x))
        return time.perf_counter() - t0
    t, d = med(copy_once)
    report("copy_sync", t, f"all {d}")

    # 3. the op's timed body (copy + read)
    def op_once():
        t0 = time.perf_counter()
        np.asarray(jax.block_until_ready(fresh(x)))
        return time.perf_counter() - t0
    t, d = med(op_once)
    report("op(copy+read)", t, f"all {d}")

    # 4. chunked + async D2H
    n = NBYTES // MB * MB  # whole-MiB prefix for clean slicing
    xf = jax.block_until_ready(jax.device_put(host[:n]))
    for k in (2, 4, 8):
        step = n // k
        slicer = jax.jit(lambda v: [
            jax.lax.dynamic_slice(v, (i * step,), (step,))
            for i in range(k)])

        def chunk_once():
            parts = jax.block_until_ready(slicer(fresh(xf)))
            t0 = time.perf_counter()
            for p in parts:
                p.copy_to_host_async()
            out = [np.asarray(p) for p in parts]
            dt = time.perf_counter() - t0
            assert sum(o.nbytes for o in out) == n
            return dt
        t, d = med(chunk_once)
        report(f"chunk_{k}_async", t, f"read only, all {d}")

    # 5. device_get API path
    def devget_once():
        y = jax.block_until_ready(fresh(x))
        t0 = time.perf_counter()
        jax.device_get(y)
        return time.perf_counter() - t0
    t, d = med(devget_once)
    report("device_get", t, f"all {d}")

    # 6. size sweep of the raw read
    for frac, nb in (("quarter", NBYTES // 4), ("half", NBYTES // 2)):
        xs = jax.block_until_ready(jax.device_put(host[:nb]))

        def size_once():
            y = jax.block_until_ready(fresh(xs))
            t0 = time.perf_counter()
            np.asarray(y)
            return time.perf_counter() - t0
        t, d = med(size_once)
        report(f"read_{frac}", t, f"{nb / MB:.1f} MiB, all {d}")

    print("done", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
