"""Chunked-async D2H download: pipeline the host-transfer transport.

Measured on the relay-tunneled rig (benchmarks/tuning/download_lab.py,
one weather window): a single `np.asarray` read of the 23.4 MiB image
takes 0.538 s, but splitting the payload into k device arrays and issuing
`copy_to_host_async` on ALL of them before materializing reads the same
bytes in 0.455 s at k=8 — the relay pipelines concurrent reads. On a
directly-attached PJRT host the chunked read degenerates to k sequential
DMA reads of the same total size (PCIe is already pipelined), so the
scheme is safe everywhere and ~15% faster where the transport benefits.

The reference's Download rows are a single blocking memcpy
[sycl/benchmark.cpp:331-333, cuda/benchmark.jl:215-219]; transferring the
full image per round is the contract, HOW the framework issues the read
is its own business — this is the library doing its job well.

`make_chunked_download(src, device_fn, k)` returns a nullary callable
performing one Download round: ONE jitted dispatch producing k fresh
row-chunk arrays (fresh buffers every call, so no host-side caching can
serve the read — the same role as the previous jit(jnp.copy)), then the
async-read fan-out, then reassembly into a contiguous host array.
"""

from __future__ import annotations

from typing import Callable

import numpy as np

import jax
from jax import lax


def make_chunked_download(src: jax.Array,
                          device_fn: Callable | None = None,
                          k: int = 8, axis: int = 0) -> Callable[[], np.ndarray]:
    """Nullary Download-round callable over device array `src`.

    device_fn: optional on-device transform applied before the read (e.g.
    the sharded session's lane-padding crop); identity when None. The
    transform + row split compile into ONE program, so each round costs a
    single dispatch+sync plus the pipelined chunk reads."""
    shape = (jax.eval_shape(device_fn, src).shape
             if device_fn is not None else src.shape)
    n = shape[axis]
    k = max(1, min(k, n))
    bounds = np.linspace(0, n, k + 1).astype(int)
    sizes = [int(bounds[i + 1] - bounds[i]) for i in range(k)]

    def split(x):
        if device_fn is not None:
            x = device_fn(x)
        out = []
        start = [0] * x.ndim
        for i in range(k):
            start[axis] = int(bounds[i])
            size = list(x.shape)
            size[axis] = sizes[i]
            out.append(lax.dynamic_slice(x, start, size))
        return tuple(out)

    split_c = jax.jit(split).lower(src).compile()

    def download() -> np.ndarray:
        parts = jax.block_until_ready(split_c(src))
        for p in parts:
            p.copy_to_host_async()
        host = [np.asarray(p) for p in parts]
        return np.concatenate(host, axis=axis) if k > 1 else host[0]

    return download
