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


def test_sharded_pallas_pipeline_2d_mesh():
    """Pallas pipeline on the (data, space) mesh: batch over data, rows
    over space, the natively batched kernel per shard — bit-exact."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from dip_benchmark_tpu.parallel import make_mesh
    from dip_benchmark_tpu.parallel.pallas_ops import sharded_pallas_pipeline
    from dip_benchmark_tpu.utils.image import bake_mirror_cols

    mesh = make_mesh(n_space=4, n_data=2)
    rng = np.random.default_rng(9)
    B, h, w = 4, 24, 52
    batch = rng.integers(0, 256, (B, h, w, 3), np.uint8)
    fn, layout = sharded_pallas_pipeline(mesh, B, h, w)
    planar = np.stack([bake_mirror_cols(np.transpose(im, (2, 0, 1)), layout)
                       for im in batch])
    xdev = jax.device_put(
        planar, NamedSharding(mesh, P("data", None, "space", None)))
    out = np.asarray(jax.block_until_ready(fn(xdev)))
    for b in range(B):
        got = np.transpose(
            out[b][:, :h, layout.pad_x:layout.pad_x + w], (1, 2, 0))
        np.testing.assert_array_equal(
            got, oracle.IMAGE_OPS["Fused-Pipeline"](batch[b]))


def test_sharded_pallas_chain_matches_sequential_oracle():
    """Generic fused chains scale out: rows sharded over 8 devices,
    chain-radius halo exchange, one fused kernel per shard — bit-exact vs
    sequential oracle application (incl. a radius-3 chain needing a
    deeper exchanged halo than any single op)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from dip_benchmark_tpu.parallel import make_mesh
    from dip_benchmark_tpu.parallel.pallas_ops import sharded_pallas_chain
    from dip_benchmark_tpu.utils.image import bake_mirror_cols

    mesh = make_mesh(n_space=8)
    rng = np.random.default_rng(11)
    h, w = 64, 44  # 8 rows/shard
    img = rng.integers(0, 256, (h, w, 3), np.uint8)
    for cols in (["Grayscale", "Threshold", "Erosion-3x3-Square",
                  "Gaussian-Blur-3x3"],
                 ["Convolution-5x5", "Inversion", "Convolution-3x3"]):
        fn, layout = sharded_pallas_chain(mesh, cols, h, w)
        planar = bake_mirror_cols(np.transpose(img, (2, 0, 1)), layout)
        xdev = jax.device_put(
            planar, NamedSharding(mesh, P(None, "space", None)))
        out = np.asarray(jax.block_until_ready(fn(xdev)))
        got = np.transpose(out[:, :h, layout.pad_x:layout.pad_x + w],
                           (1, 2, 0))
        want = img
        for c in cols:
            want = oracle.IMAGE_OPS[c](want)
        np.testing.assert_array_equal(got, want, err_msg=str(cols))


def test_sharded_pallas_chain_rejects_thin_shards():
    from dip_benchmark_tpu.parallel import make_mesh
    from dip_benchmark_tpu.parallel.pallas_ops import sharded_pallas_chain

    mesh = make_mesh(n_space=8)
    with pytest.raises(ValueError, match="too small"):
        # radius-4 chain on 4-row shards (needs >= 5)
        sharded_pallas_chain(mesh, ["Convolution-5x5", "Convolution-5x5"],
                             32, 44)


def test_sharded_session_chain_operation(image):
    """session.chain_operation on the sharded session: fused chain row
    with chain-radius halo and its own row padding, verified vs the
    sequential oracle (incl. a radius-3 chain whose vertical radius
    exceeds the session's default pad)."""
    session = ShardedBenchmarkSession(image, n_devices=8, path="pallas")
    for cols in (["Grayscale", "Threshold", "Erosion-3x3-Square",
                  "Gaussian-Blur-3x3"],
                 ["Convolution-5x5", "Convolution-3x3"]):
        op = session.chain_operation(cols)
        op.run()
        got = op.fetch()
        want = image
        for c in cols:
            want = oracle.IMAGE_OPS[c](want)
        np.testing.assert_array_equal(got, want, err_msg=str(cols))
    # each chain row verifies against its OWN oracle (spec-keyed)
    assert any(k.startswith("Fused-Chain(") for k in session.oracle_ops())
    assert sum(k.startswith("Fused-Chain(")
               for k in session.oracle_ops()) == 2

    xla_session = ShardedBenchmarkSession(image, n_devices=8, path="xla")
    with pytest.raises(ValueError, match="path pallas"):
        xla_session.chain_operation(["Inversion"])
