#!/usr/bin/env python3
"""Upload attack (VERDICT r1 item 3): can H2D beat plain device_put?

The Upload op moves the 24.56 MB fundus image host -> HBM each round.
Round-1 measured ~16-22 ms via jax.device_put on the tunneled rig.
Candidates:

  plain      — jax.device_put(img), block (the shipped op)
  chunk-K    — split the image into K row chunks, issue ALL device_puts
               before blocking (overlapped transport), then block each;
               delivery = K device arrays (assembled untimed, or consumed
               chunked by a kernel) — if the relay pipelines requests this
               beats one serial put
  chunk-K+cat— same, plus on-device jnp.concatenate so the deliverable is
               ONE array (the honest apples-to-apples variant)
  pinned     — device_put of a pre-touched C-contiguous buffer (rules out
               page-fault cost in the baseline)

Run on the real TPU; prints min/median of reps per candidate.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/benchmarks/", 1)[0])

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dip_benchmark_tpu.utils.image import load_image  # noqa: E402

REPS = 7


def timed(fn):
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[0], ts[len(ts) // 2]


def main():
    image = load_image("/root/reference/assets/fundus.jpg")
    dev = jax.devices()[0]
    img = np.ascontiguousarray(image)

    def plain():
        jax.block_until_ready(jax.device_put(img, dev))

    results = {"plain device_put": timed(plain)}

    for k in (2, 4, 8, 16):
        rows = np.array_split(np.arange(img.shape[0]), k)
        chunks = [np.ascontiguousarray(img[r[0]:r[-1] + 1]) for r in rows]

        def chunked(chunks=chunks):
            futs = [jax.device_put(c, dev) for c in chunks]
            for f in futs:
                jax.block_until_ready(f)

        results[f"chunk-{k} overlapped"] = timed(chunked)

        cat = jax.jit(lambda *xs: jnp.concatenate(xs, axis=0))

        def chunked_cat(chunks=chunks, cat=cat):
            futs = [jax.device_put(c, dev) for c in chunks]
            jax.block_until_ready(cat(*futs))

        results[f"chunk-{k} + device concat"] = timed(chunked_cat)

    for name, (tmin, tmed) in results.items():
        print(f"  {name:28s} min {tmin * 1e3:8.2f} ms   "
              f"median {tmed * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
