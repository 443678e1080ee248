"""bench.py's fail-fast contract: a hung accelerator runtime produces
the one-line JSON with an error field promptly (round-4 rig finding: a
dead relay tunnel blocks the first device use ~28 min otherwise)."""

import json
import sys


def test_bench_waits_while_device_lock_held_then_proceeds(tmp_path):
    """A live holder PID keeps bench waiting for the bounded window; the
    wait returns (rather than raising) when the window expires so a
    wedged sweep can't null the driver's bench entirely."""
    sys.path.insert(0, ".")
    import os
    import bench

    lock = tmp_path / "device.lock"
    lock.write_text(str(os.getpid()))  # this test process: always alive
    waited = bench._wait_for_device_lock(str(lock), wait_s=0.3, poll_s=0.1)
    assert waited >= 0.3


def test_bench_ignores_stale_device_lock(tmp_path):
    """A lock whose holder has exited must not delay the bench."""
    sys.path.insert(0, ".")
    import subprocess
    import bench

    p = subprocess.Popen(["true"])
    p.wait()  # reaped: the PID no longer exists
    lock = tmp_path / "device.lock"
    lock.write_text(str(p.pid))
    waited = bench._wait_for_device_lock(str(lock), wait_s=5.0, poll_s=0.1)
    assert waited < 1.0


def test_bench_no_lock_no_wait(tmp_path):
    sys.path.insert(0, ".")
    import bench

    waited = bench._wait_for_device_lock(
        str(tmp_path / "absent.lock"), wait_s=5.0, poll_s=0.1)
    assert waited == 0.0


def test_bench_emits_error_json_when_gate_fails(monkeypatch, capsys):
    sys.path.insert(0, ".")
    import bench
    from dip_benchmark_tpu.runtime import device as device_mod

    def hung(backend="tpu", timeout_s=None):
        raise device_mod.DeviceGateError("backend initialization did not "
                                         "complete within 1s — test")
    monkeypatch.setattr(device_mod, "require_device", hung)
    # Never wait on a real sweep's device lock inside the test suite.
    monkeypatch.setenv("DIP_TPU_LOCK_WAIT_S", "0")
    rc = bench.main()
    assert rc == 1
    out = capsys.readouterr().out.strip().splitlines()
    payload = json.loads(out[-1])
    assert payload["metric"] == "dip12_compute_geomean_latency"
    assert payload["value"] is None
    assert "did not complete" in payload["error"]
