#!/usr/bin/env python3
"""Real-TPU validation of the round-3 surfaces (Mosaic legality + values).

CPU interpret mode proves semantics but not Mosaic lowering; this script
compiles and bit-checks every NEW round-3 surface on the attached TPU:

  1. f32 fused chains (make_fused_chain_f32): per-channel, gray-first,
     batched — each vs the sequential f32 oracle (atol 1 level).
  2. uint8 batched sharded chain on a (data=1, space=1) mesh — the 2-D
     mesh program Mosaic-compiles with real collectives elided.
  3. ShardedBenchmarkSession shards=1 pallas: full table + --exec rows
     (the sharded chained-K marginal on hardware) + a chain row.
  4. Chunked download round-trip on the real relay transport.

Small image (non-aligned dims) keeps compiles fast; this is a legality/
correctness gate, not a perf run.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np  # noqa: E402

import jax  # noqa: E402

from dip_benchmark_tpu import oracle, oracle_f32  # noqa: E402
from dip_benchmark_tpu.runtime.cache import enable_compilation_cache  # noqa: E402


def seq_f32(img, cols):
    x = oracle_f32.from_uint8_hwc(img)
    for c in cols:
        x = oracle_f32.IMAGE_OPS_F32[c](x)
    return oracle_f32.to_uint8_hwc(x)


def main() -> int:
    enable_compilation_cache()
    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, (93, 121, 3), np.uint8)
    ok = 0

    # 1. f32 chains on hardware
    from dip_benchmark_tpu.models.chain import make_fused_chain_f32
    from dip_benchmark_tpu.utils.image import make_layout, to_planar_padded_f32
    h, w, _ = img.shape
    for cols, batch in (
            (["Inversion", "Convolution-5x5"], 0),
            (["Grayscale", "Threshold", "Erosion-3x3-Square",
              "Gaussian-Blur-3x3"], 0),
            (["Grayscale", "Convolution-1x3+3x1"], 2),
            (["Convolution-1x5+5x1", "Erosion-3x3-Cross"], 2)):
        halo = 4 if "Convolution-1x5+5x1" in cols else 2
        layout = make_layout(h, w, halo=halo)
        fn = make_fused_chain_f32(layout, cols, batch=batch)
        py, px = layout.pad_y, layout.pad_x
        if batch:
            stack = rng.integers(0, 256, (batch, h, w, 3), np.uint8)
            dev = np.stack([to_planar_padded_f32(im, layout)
                            for im in stack])
            out = np.asarray(fn(jax.device_put(dev)))
            for i in range(batch):
                got = oracle_f32.to_uint8_hwc(
                    out[i][:, py:py + h, px:px + w])
                want = seq_f32(stack[i], cols)
                assert np.abs(got.astype(int) - want.astype(int)).max() <= 1, \
                    (cols, i)
        else:
            out = np.asarray(fn(jax.device_put(
                to_planar_padded_f32(img, layout))))
            got = oracle_f32.to_uint8_hwc(out[:, py:py + h, px:px + w])
            want = seq_f32(img, cols)
            assert np.abs(got.astype(int) - want.astype(int)).max() <= 1, cols
        ok += 1
        print(f"  f32 chain {'+'.join(cols)} (batch={batch}): OK",
              flush=True)

    # 2. batched sharded chain, 1x1 mesh (Mosaic path through shard_map)
    from dip_benchmark_tpu.models.batch import process_batch
    from dip_benchmark_tpu.parallel.halo import make_mesh
    mesh = make_mesh(n_space=1, n_data=1)
    stack = rng.integers(0, 256, (3, 61, 70, 3), np.uint8)
    cols = ["Grayscale", "Threshold", "Erosion-3x3-Square"]
    got = process_batch(stack, cols, mesh=mesh)
    for i in range(3):
        want = stack[i]
        for c in cols:
            want = oracle.IMAGE_OPS[c](want)
        np.testing.assert_array_equal(got[i], want)
    ok += 1
    print("  batched sharded chain (1x1 mesh): OK", flush=True)

    # 3. sharded session (1 shard) + exec table + chain row
    from dip_benchmark_tpu.parallel.session import ShardedBenchmarkSession
    s = ShardedBenchmarkSession(img, n_devices=1, path="pallas")
    for op in s.operations(include_pipeline=True):
        if op.csv_column in ("Upload", "Download"):
            continue
        op.run()
        got = op.fetch()
        np.testing.assert_array_equal(
            got, oracle.IMAGE_OPS[op.csv_column](img),
            err_msg=op.csv_column)
    s.chain_operation(["Inversion", "Convolution-3x3"])
    rows = s.execution_table(include_pipeline=True, k1=10, k2=50, samples=3)
    assert rows[-1][0] == "Fused-Chain" and len(rows) == 14
    print("  sharded (1-shard) table bit-exact; exec rows:", flush=True)
    for col, t in rows:
        print(f"    {col:42s} {t * 1e6:9.1f} us", flush=True)
    ok += 1

    # 4. chunked download on the real transport
    s2 = ShardedBenchmarkSession(img, n_devices=1, path="pallas")
    s2._download_prepare()
    planar = s2._download()
    np.testing.assert_array_equal(
        np.transpose(planar[:, :s2.valid_height], (1, 2, 0)), img)
    ok += 1
    print("  chunked sharded download round-trip: OK", flush=True)

    print(f"tpu_validate_r3: {ok} surface groups verified on "
          f"{jax.devices()[0].device_kind}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
