#!/usr/bin/env python3
"""Decomposed i16 legality probes (lab7 follow-up): find exactly which op
in the i16 conv body this Mosaic build rejects. Each probe is one kernel,
compiled and (where it compiles) value-checked on hardware."""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/benchmarks/", 1)[0])

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

ROWS, WP = 16, 256


def attempt(name, fn, out_dtype, check=None):
    x = np.arange(ROWS * WP, dtype=np.uint8).reshape(ROWS, WP)

    def kernel(in_ref, out_ref):
        out_ref[...] = fn(in_ref[...])

    try:
        out = np.asarray(jax.jit(lambda v: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((ROWS, WP), out_dtype),
        )(v))(jax.device_put(x)))
        ok = "" if check is None else f" exact={np.array_equal(out, check(x))}"
        print(f"  {name:44s} OK{ok}")
        return True
    except Exception as e:  # noqa: BLE001
        print(f"  {name:44s} FAIL ({str(e).splitlines()[0][:80]})")
        return False


def main():
    i16 = jnp.int16
    attempt("u8->i16, store i16", lambda v: v.astype(i16), i16,
            lambda x: x.astype(np.int16))
    attempt("i16 add, store i16", lambda v: v.astype(i16) + v.astype(i16),
            i16, lambda x: x.astype(np.int16) * 2)
    attempt("i16 mul scalar, store i16",
            lambda v: v.astype(i16) * i16(3), i16,
            lambda x: x.astype(np.int16) * 3)
    attempt("i16 mul+add, store i16",
            lambda v: v.astype(i16) * i16(3) + v.astype(i16), i16,
            lambda x: x.astype(np.int16) * 4)
    attempt("i16 -> u8 narrow", lambda v: v.astype(i16).astype(jnp.uint8),
            jnp.uint8, lambda x: x)
    attempt("i16 -> i32 -> u8 narrow",
            lambda v: v.astype(i16).astype(jnp.int32).astype(jnp.uint8),
            jnp.uint8, lambda x: x)
    attempt("i16 add -> bitcast i32 -> arith -> i16",
            lambda v: pltpu.bitcast(
                jax.lax.shift_right_logical(
                    pltpu.bitcast(v.astype(i16) + v.astype(i16),
                                  jnp.int32) + 0x00010001, 1) & 0x7FFF7FFF,
                i16), i16,
            lambda x: (((x.astype(np.int64) * 2 + 1)) >> 1).astype(np.int16))
    attempt("i16 mul vec*vec, store i16",
            lambda v: v.astype(i16) * (v.astype(i16) + i16(1)), i16,
            lambda x: (x.astype(np.int32) * (x.astype(np.int32) + 1)
                       ).astype(np.int16))
    attempt("u8 add (wrap), store u8", lambda v: v + v, jnp.uint8,
            lambda x: (x.astype(np.int32) * 2 % 256).astype(np.uint8))


if __name__ == "__main__":
    main()
