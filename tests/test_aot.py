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
