"""AOT warm/export serving-path tests (X-path; CPU backend)."""

import numpy as np
import pytest

from dip_benchmark_tpu import oracle
from dip_benchmark_tpu.runtime import aot
from dip_benchmark_tpu.session import BenchmarkSession


def test_warm_compiles_all_ops(fundus_crop):
    session = BenchmarkSession(fundus_crop, path="xla")
    compiled = aot.warm(session)
    assert set(compiled) == set(session._ops_impl)
    out = np.asarray(compiled["Inversion"](session.image_dev))
    np.testing.assert_array_equal(out, oracle.inversion(fundus_crop))


def test_export_and_load_round_trip(fundus_crop, tmp_path):
    session = BenchmarkSession(fundus_crop, path="xla")
    written = aot.export_ops(session, str(tmp_path))
    assert len(written) == len(session._ops_impl)
    fn = aot.load_exported(str(tmp_path / "Threshold.stablehlo"))
    out = np.asarray(fn(session.image_dev))
    np.testing.assert_array_equal(out, oracle.threshold(fundus_crop))


@pytest.mark.parametrize("path", ["xla", "pallas"])
def test_warm_sharded_compiles_all_ops(fundus_crop, path):
    """--warm under --shards (round-4 VERDICT #5): aot.warm AOT-compiles
    the shard_map programs; a compiled op's output bit-matches the jitted
    op run on the same resident buffer."""
    from dip_benchmark_tpu.parallel.session import ShardedBenchmarkSession

    session = ShardedBenchmarkSession(fundus_crop, n_devices=4, path=path)
    compiled = aot.warm(session)
    assert set(compiled) == set(session._ops)
    out = np.asarray(compiled["Inversion"](session.planar_dev))
    ref = np.asarray(session._ops["Inversion"](session.planar_dev))
    np.testing.assert_array_equal(out, ref)


def test_export_sharded_round_trip(fundus_crop, tmp_path):
    """StableHLO export of the sharded X-path ops: the artifact embeds the
    SPMD partitioning and replays against the session's sharded input."""
    from dip_benchmark_tpu.parallel.session import ShardedBenchmarkSession

    session = ShardedBenchmarkSession(fundus_crop, n_devices=4, path="xla")
    written = aot.export_ops(session, str(tmp_path))
    assert len(written) == len(session._ops)
    fn = aot.load_exported(str(tmp_path / "Inversion.stablehlo"))
    out = np.asarray(fn(session.planar_dev))
    ref = np.asarray(session._ops["Inversion"](session.planar_dev))
    np.testing.assert_array_equal(out, ref)


def test_warm_seeds_the_timed_table(small_image):
    """warm()'s executables must be what the table dispatches — without
    seeding, the first timed call re-lowers and re-compiles."""
    from dip_benchmark_tpu.runtime.aot import warm
    from dip_benchmark_tpu.session import BenchmarkSession
    s = BenchmarkSession(small_image, path="xla")
    warm(s)
    assert s._aot_ops and all(a._compiled is not None
                              for a in s._aot_ops.values())
    ops = s.operations()
    # and the run closures resolve to those same pre-compiled handles
    ops[2].run()  # Copy: executes through the seeded AotOp without error
