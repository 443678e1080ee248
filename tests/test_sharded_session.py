"""Distributed (sharded) session: full op table bit-exact vs the oracle on
the 8-way virtual CPU mesh, including non-divisible image heights."""

import jax
import numpy as np
import pytest

from dip_benchmark_tpu import oracle
from dip_benchmark_tpu.harness import BenchmarkRunner
from dip_benchmark_tpu.parallel.session import ShardedBenchmarkSession

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")

COLS = sorted(oracle.IMAGE_OPS)


@pytest.fixture(scope="module", params=[24, 37, 41])  # 24 % 8 == 0; 37, 41 pad
def image(request, rng=None):
    r = np.random.default_rng(request.param)
    return r.integers(0, 256, size=(request.param, 40, 3), dtype=np.uint8)


@pytest.fixture(scope="module", params=["xla", "pallas"])
def session(image, request):
    return ShardedBenchmarkSession(image, n_devices=8, path=request.param)


def test_all_ops_bit_exact(session, image):
    ops = {op.csv_column: op
           for op in session.operations(include_pipeline=True)}
    for col in COLS:
        op = ops[col]
        op.run()
        got = op.fetch()
        want = oracle.IMAGE_OPS[col](image)
        np.testing.assert_array_equal(got, want,
                                      err_msg=f"{col} [{session.path}]")


def test_full_runner_with_verification(image, tmp_path):
    session = ShardedBenchmarkSession(image, n_devices=8)
    runner = BenchmarkRunner(session.operations(include_pipeline=True),
                             rounds=2)
    results = runner.run(filename="s.png", outdir=str(tmp_path),
                         verify_against=image, quiet=True)
    assert len(results) == 15


def test_upload_download_round_trip(image):
    session = ShardedBenchmarkSession(image, n_devices=8)
    session._download_prepare()
    planar = session._download()
    hwc = np.transpose(planar[:, :session.valid_height], (1, 2, 0))
    np.testing.assert_array_equal(hwc, image)
