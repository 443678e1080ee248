"""Batch processing tests: vmapped ops match per-image oracle outputs."""

import os

import numpy as np
import pytest

from dip_benchmark_tpu import oracle
from dip_benchmark_tpu.models import batch
from dip_benchmark_tpu.parallel import make_mesh
from dip_benchmark_tpu.utils.image import load_image, save_image


def test_process_batch_matches_oracle(rng):
    imgs = rng.integers(0, 256, size=(3, 16, 24, 3), dtype=np.uint8)
    out = batch.process_batch(imgs, "Inversion")
    for i in range(3):
        np.testing.assert_array_equal(out[i], oracle.inversion(imgs[i]))


def test_process_batch_sharded_over_data_axis(rng):
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(n_space=1, n_data=8)
    imgs = rng.integers(0, 256, size=(8, 16, 24, 3), dtype=np.uint8)
    out = batch.process_batch(imgs, "Fused-Pipeline", mesh=mesh)
    for i in range(8):
        np.testing.assert_array_equal(out[i], oracle.fused_pipeline(imgs[i]))


def test_process_directory_mixed_shapes(rng, tmp_path):
    indir = tmp_path / "in"
    outdir = tmp_path / "out"
    indir.mkdir()
    shapes = [(16, 24, 3), (16, 24, 3), (32, 40, 3)]
    imgs = {}
    for i, shape in enumerate(shapes):
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        name = f"img{i}.png"
        save_image(str(indir / name), img)
        imgs[name] = img
    written = batch.process_directory(str(indir), str(outdir), "Threshold",
                                      batch_size=2)
    assert len(written) == 3
    for name, img in imgs.items():
        got = load_image(str(outdir / name))
        np.testing.assert_array_equal(got, oracle.threshold(img))
