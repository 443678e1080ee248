"""Runtime-layer tests: device gate, compilation cache config, plots."""

import os

import jax
import pytest

from dip_benchmark_tpu import spec
from dip_benchmark_tpu.runtime import (DeviceGateError, backend_name,
                                       describe_device, require_device)
from dip_benchmark_tpu.runtime.cache import enable_compilation_cache
from dip_benchmark_tpu.utils import reporting
from dip_benchmark_tpu.utils.plots import (OP_GROUPS, read_results,
                                           render_group_charts)


def test_gate_cpu_available():
    d = require_device("cpu")
    assert d.platform == "cpu"
    assert "cpu" in describe_device(d).lower()


def test_gate_missing_backend_fails_fast():
    with pytest.raises(DeviceGateError, match="--backend cpu"):
        require_device("tpu")  # conftest forces the CPU-only platform


def test_gate_backend_shared_helper():
    """gate_backend: the shared CLI entry gate (cpu platform override +
    require_device) used by cli.py and the batch tool."""
    from dip_benchmark_tpu.runtime import gate_backend
    d = gate_backend("cpu")
    assert d.platform == "cpu"
    with pytest.raises(DeviceGateError):
        gate_backend("tpu")


def test_gate_hung_backend_init_times_out():
    """Round-4 rig finding: a dead relay tunnel blocks jax.devices()
    inside the PJRT C API for tens of minutes. The gate runs backend
    discovery under a deadline and converts a hang into a prompt
    DeviceGateError naming the remedy."""
    import time
    from dip_benchmark_tpu.runtime.device import _call_with_deadline

    with pytest.raises(DeviceGateError, match="tunnel|hung"):
        _call_with_deadline(lambda: time.sleep(30), 0.05,
                            "TPU backend initialization")
    # fast paths pass values and errors through unchanged
    assert _call_with_deadline(lambda: 42, 5.0, "x") == 42
    with pytest.raises(RuntimeError, match="boom"):
        _call_with_deadline(lambda: (_ for _ in ()).throw(
            RuntimeError("boom")), 5.0, "x")


def test_any_gate_wraps_runtime_error(monkeypatch):
    """The 'any' branch must deliver prompt init failures as
    DeviceGateError like the named-backend branch — bench.py's JSON
    error line and cli.py's exit-4 both catch only that type."""
    from dip_benchmark_tpu.runtime import device as device_mod

    def broken():
        raise RuntimeError("plugin exploded — test")

    monkeypatch.setattr(device_mod, "default_device", broken)
    with pytest.raises(device_mod.DeviceGateError,
                       match="initialization failed"):
        device_mod.require_device("any", retries=0)


def test_bench_env_and_lock_corruption_hardening(tmp_path, monkeypatch):
    """Malformed numeric env knobs fall back (no pre-JSON traceback) and
    a corrupt lock file (pid<=0) counts as stale, not alive-forever."""
    import sys as _sys
    _sys.path.insert(0, ".")
    import bench

    monkeypatch.setenv("DIP_TPU_LOCK_WAIT_S", "15m")
    assert bench._wait_for_device_lock(str(tmp_path / "absent")) == 0.0
    assert bench._env_num("BENCH_ROUNDS", "300", int) == 300
    monkeypatch.setenv("BENCH_ROUNDS", "lots")
    assert bench._env_num("BENCH_ROUNDS", "300", int) == 300
    lock = tmp_path / "device.lock"
    lock.write_text("0")
    assert bench._wait_for_device_lock(str(lock), wait_s=5.0,
                                       poll_s=0.1) < 1.0


def test_gate_retry_recovers_transient_timeout(monkeypatch, capsys):
    """Round-5 VERDICT #5: a TIMED-OUT backend discovery retries (bounded,
    DIP_TPU_GATE_RETRIES) before nulling a bench — a recovering relay
    tunnel often answers within the retry window."""
    from dip_benchmark_tpu.runtime import device as device_mod

    calls = {"n": 0}

    def flaky(backend="cpu", timeout_s=None):
        calls["n"] += 1
        if calls["n"] == 1:
            raise device_mod.DeviceGateTimeout("tunnel hiccup — test")
        return "DEVICE"

    monkeypatch.setattr(device_mod, "_require_device_once", flaky)
    assert device_mod.require_device("cpu", retries=1) == "DEVICE"
    assert calls["n"] == 2
    assert "retrying" in capsys.readouterr().err

    # exhausted retries re-raise the timeout flavor
    calls["n"] = 0
    with pytest.raises(device_mod.DeviceGateTimeout):
        device_mod.require_device("cpu", retries=0)
    assert calls["n"] == 1

    # a definitive "no such backend" answer does NOT retry
    def absent(backend="tpu", timeout_s=None):
        calls["n"] += 1
        raise DeviceGateError("No TPU backend available — test")

    calls["n"] = 0
    monkeypatch.setattr(device_mod, "_require_device_once", absent)
    with pytest.raises(DeviceGateError):
        device_mod.require_device("tpu", retries=3)
    assert calls["n"] == 1


def test_check_chain_validation():
    from dip_benchmark_tpu.models.chain import check_chain
    assert check_chain(["Convolution-5x5", "Convolution-3x3"]) == (3, 3)
    with pytest.raises(ValueError, match="chain radius"):
        check_chain(["Convolution-5x5"] * 5)  # ry = 10 > 8
    with pytest.raises(ValueError, match="Grayscale"):
        check_chain(["Inversion", "Grayscale"])
    with pytest.raises(ValueError, match="not fusable"):
        check_chain(["Upload"])


def test_gate_any():
    assert require_device("any") is jax.devices()[0]
    assert backend_name() == "cpu"


def test_enable_compilation_cache(tmp_path, monkeypatch):
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(tmp_path / "cc"))
    enable_compilation_cache()
    assert jax.config.jax_compilation_cache_dir == str(tmp_path / "cc")


def test_plot_groups_cover_all_csv_columns():
    grouped = [op for ops in OP_GROUPS.values() for op in ops]
    assert sorted(grouped) == sorted(spec.CSV_COLUMNS)


def test_render_group_charts(tmp_path):
    results = [reporting.OpResult(d, p, c, 0.01, 1e-4)
               for d, p, c in spec.OPERATION_MATRIX]
    csv = tmp_path / "results.csv"
    reporting.write_csv(str(csv), "TPU", results)
    reporting.write_csv(str(csv), "TPU-xla", results)
    tools, data = read_results(str(csv))
    assert tools == ["TPU", "TPU-xla"]
    assert data["Upload"] == [1e-4, 1e-4]
    out = render_group_charts(str(csv), str(tmp_path / "plots"))
    assert len(out) == 5
    assert all(os.path.getsize(p) > 0 for p in out)


def test_chunked_download_round_trip():
    """runtime/transfer.py: k-chunk async D2H reassembles exactly, with
    fresh device buffers per call, odd sizes, and a device-side crop."""
    import jax
    import numpy as np
    from dip_benchmark_tpu.runtime.transfer import make_chunked_download

    rng = np.random.default_rng(9)
    arr = rng.integers(0, 256, size=(37, 23, 3), dtype=np.uint8)
    x = jax.device_put(arr)
    dl = make_chunked_download(x, k=8)
    np.testing.assert_array_equal(dl(), arr)
    np.testing.assert_array_equal(dl(), arr)

    # crop transform + non-default axis + k > n clamp
    dl2 = make_chunked_download(x, lambda v: v[:, 2:21], k=64, axis=1)
    np.testing.assert_array_equal(dl2(), arr[:, 2:21])


def test_execution_time_auto_scale(monkeypatch):
    """exec_timing auto-scaling: K grows tenfold until the chain separation
    T(K2)-T(K1) clears RESOLVE_FLOOR_S, so a sub-us op on a small image
    resolves instead of clamping to 0 (observed on the 528x393 regime)."""
    from dip_benchmark_tpu.runtime import exec_timing

    built = []

    def fake_chain(op, k, x):
        built.append(k)
        return k

    def fake_t_delta(f1, f2, x, samples):
        # fake relay clock: the interleaved pair delta is pure op work
        return (f2 - f1) * 0.5e-6

    monkeypatch.setattr(exec_timing, "_chain_direct", fake_chain)
    monkeypatch.setattr(exec_timing, "_t_delta", fake_t_delta)

    t = exec_timing.execution_time(lambda v: v, None, auto_scale=True)
    # 0.5 us/op resolves only at K=3000/30000 (13.5 ms > 2 ms floor);
    # each x10 rescale reuses the old K2 chain as the new K1 (one fresh
    # compile per step, not two)
    assert built == [30, 300, 3000, 30000]
    assert abs(t - 0.5e-6) < 1e-12

    # hand-picked K (tests, labs) never rescales
    built.clear()
    exec_timing.execution_time(lambda v: v, None)
    assert built == [30, 300]
