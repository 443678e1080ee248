#!/usr/bin/env python3
"""Round-2 probe: can make_async_copy slice HBM at an UNALIGNED lane
offset (dx in {1, 2})? If yes, lane-shifted DMA windows could replace
pltpu.roll in the windowed kernels (roll-free horizontal taps, VERDICT r1
item 2's unexplored idea). Measures legality + correctness, nothing else.
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/benchmarks/", 1)[0])

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


def make_shifted_copy(rows: int, wp: int, dx: int):
    """out[r, x] = in[r, x + dx] for x in [0, wp - 128); rest unspecified.
    Implemented as ONE async DMA with lane offset dx, width wp - 128."""
    wcopy = wp - 128

    def kernel(in_hbm, out_ref, x_vmem, sem):
        cp = pltpu.make_async_copy(
            in_hbm.at[:, pl.ds(dx, wcopy)],
            x_vmem.at[:, pl.ds(0, wcopy)], sem)
        cp.start()
        cp.wait()
        out_ref[...] = x_vmem[...]

    return jax.jit(lambda x: pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, wp), jnp.uint8),
        scratch_shapes=[pltpu.VMEM((rows, wp), jnp.uint8),
                        pltpu.SemaphoreType.DMA],
    )(x))


def main():
    rows, wp = 16, 512
    rng = np.random.default_rng(0)
    src = rng.integers(0, 256, size=(rows, wp), dtype=np.uint8)
    x = jax.device_put(src)
    for dx in (0, 1, 2, 127):
        try:
            out = np.asarray(make_shifted_copy(rows, wp, dx)(x))
            ok = np.array_equal(out[:, :wp - 128], src[:, dx:dx + wp - 128])
            print(f"dx={dx}: compiled, exact={ok}")
        except Exception as e:  # noqa: BLE001
            msg = str(e).split("\n")[0][:160]
            print(f"dx={dx}: FAILED — {msg}")


if __name__ == "__main__":
    main()
