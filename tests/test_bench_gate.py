"""bench.py's fail-fast contract: a hung accelerator runtime produces
the one-line JSON with an error field promptly (round-4 rig finding: a
dead relay tunnel blocks the first device use ~28 min otherwise)."""

import json
import sys


def test_bench_emits_error_json_when_gate_fails(monkeypatch, capsys):
    sys.path.insert(0, ".")
    import bench
    from dip_benchmark_tpu.runtime import device as device_mod

    def hung(backend="tpu", timeout_s=None):
        raise device_mod.DeviceGateError("backend initialization did not "
                                         "complete within 1s — test")
    monkeypatch.setattr(device_mod, "require_device", hung)
    rc = bench.main()
    assert rc == 1
    out = capsys.readouterr().out.strip().splitlines()
    payload = json.loads(out[-1])
    assert payload["metric"] == "dip12_compute_geomean_latency"
    assert payload["value"] is None
    assert "did not complete" in payload["error"]
