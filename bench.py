#!/usr/bin/env python3
"""Driver benchmark: the 14-op matrix on fundus.jpg, Pallas path, real TPU.

Prints ONE JSON line whose headline is
  {"metric": "dip12_compute_geomean_latency", "value": <geomean us over the
   12 on-device ops>, "unit": "us", "vs_baseline": <geomean speedup vs the
   reference CUDA.jl column from assets/results.csv — >1.0 = faster>}
plus auditable detail keys:
  "estimator"           how the headline is computed (pooled median) and
                        that the baseline column is mean-over-rounds
  "value_mean"/"vs_baseline_mean"  the same geomeans with the per-op MEAN
                        over all rounds (the reference's estimator)
  "ops"                 per-op {p50_us, mean_us, once_ms} incl. Upload and
                        Download
  "transport_floor_ms"  measured raw-bytes relay floor for a 24.56 MB
                        H2D put and D2H read, so the Upload/Download rows
                        can be judged against the transport itself. Each
                        floor is probed in the rig state its op is measured
                        in: h2d BEFORE any D2H (the first D2H flips relay
                        rigs into a degraded mode), d2h after.
  "exec_geomean_us" / per-op "exec_us"  TRUE device execution time per
                        application (chained-K marginal with forced
                        completion, K=100/900) — the completed-work number,
                        vs the dispatch-latency headline whose semantics
                        on this relay rig are async like the reference's
                        CUDA.jl/OpenCV/MATLAB rows. BENCH_EXEC=0 skips.

Per-op latency headline is the MEDIAN over the POOLED per-round samples of
two temporally-separated sweeps: this rig's relay transport adds
heavy-tailed jitter that a compiled no-op dispatch reproduces (p50 ~25 us,
p99 ~160 us — benchmarks/tuning/latency_probe.py), so tail rounds time the
HTTP relay, not the framework, and the mean of a few hundred rounds swings
2-7x between identical runs. The mean is reported alongside; on a quiet
directly-attached host the two coincide.

The headline covers the 12 on-device ops. Upload/Download are still run,
verified, reported in "ops", and judged against the measured transport
floor — on this tunneled rig host<->device transfers ride an HTTP relay,
so those two rows benchmark the tunnel, not the framework.

Before timing, every op output is verified bit-exactly against the native/
NumPy oracle (on-hardware miscompiles must fail loudly, not pollute
numbers). Per-op details go to stderr; the JSON line is the only stdout
output.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

import numpy as np

# The reference's published per-round seconds (BASELINE.md, results.csv:2).
CUDA_BASELINE_S = {
    "Upload": 0.005212, "Download": 0.006028, "Copy": 0.000482,
    "Inversion": 0.000463, "Grayscale": 0.000462, "Threshold": 0.000463,
    "Erosion-3x3-Cross": 0.000955, "Erosion-3x3-Square": 0.001264,
    "Erosion-1x3+3x1-Square": 0.001530, "Convolution-3x3": 0.001024,
    "Convolution-1x3+3x1": 0.001216, "Convolution-5x5": 0.002268,
    "Convolution-1x5+5x1": 0.001533, "Gaussian-Blur-3x3": 0.001053,
}



def _h2d_floor(nbytes: int, reps: int = 4) -> float:
    """Raw H2D floor (seconds): min over reps of a flat nbytes uint8
    device_put. Run BEFORE any D2H so it sees the same (non-degraded) rig
    state the Upload op is measured in — a D2H flips relay rigs into a
    degraded mode that multiplies later transfer costs (~35x measured)."""
    import jax

    buf = np.random.default_rng(2).integers(
        0, 256, size=nbytes, dtype=np.uint8)
    h2d = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(jax.device_put(buf))
        h2d.append(time.perf_counter() - t0)
    return min(h2d)


def _d2h_floor(nbytes: int, reps: int = 4) -> float:
    """Raw D2H floor (seconds): min over reps of an np.asarray read of a
    fresh device buffer (fresh each rep — jax.Array caches its host copy).
    Run AFTER all op timing, in the same post-first-D2H rig state the
    Download op is measured in."""
    import jax
    import jax.numpy as jnp

    buf = np.random.default_rng(2).integers(
        0, 256, size=nbytes, dtype=np.uint8)
    fresh = jax.jit(jnp.copy)
    x = jax.block_until_ready(jax.device_put(buf))
    d2h = []
    for _ in range(reps):
        y = jax.block_until_ready(fresh(x))
        t0 = time.perf_counter()
        np.asarray(y)
        d2h.append(time.perf_counter() - t0)
    return min(d2h)


def _env_num(name: str, default: str, cast):
    """Parse a numeric env knob; a malformed value falls back to the
    default with a stderr note instead of a pre-JSON traceback (the gate
    module applies the same rule to its own knobs)."""
    raw = os.environ.get(name, default)
    try:
        return cast(raw)
    except (TypeError, ValueError):
        print(f"bench: malformed {name}={raw!r}; using {default}",
              file=sys.stderr)
        return cast(default)


def _wait_for_device_lock(lock_path: str | None = None,
                          wait_s: float | None = None,
                          poll_s: float = 15.0) -> float:
    """If another benchmark process holds the device, wait boundedly for
    it to release rather than contending — two device processes wedge the
    relay rig (DESIGN §4). The staged hardware sweep
    (benchmarks/tuning/r5_hw_sweep.sh) writes its PID to the lock while it
    owns the TPU; a driver-launched bench landing mid-sweep waits up to
    DIP_TPU_LOCK_WAIT_S (default 900 s), then proceeds anyway (a contended
    number still beats none). A stale lock (holder dead) is ignored.
    Returns the seconds actually waited."""
    lock_path = lock_path or os.environ.get(
        "DIP_TPU_DEVICE_LOCK", "/tmp/dip_tpu_device.lock")
    if wait_s is None:
        wait_s = _env_num("DIP_TPU_LOCK_WAIT_S", "900", float)
    waited = 0.0
    announced = False
    while waited < wait_s:
        try:
            pid = int(open(lock_path).read().strip())
        except (OSError, ValueError):
            return waited
        if pid <= 0:
            # Corrupt lock: os.kill(0/negative, 0) signals our own
            # process group and always "succeeds" — treat as stale.
            return waited
        try:
            os.kill(pid, 0)  # liveness probe only
        except ProcessLookupError:
            return waited    # stale lock: holder is gone
        except PermissionError:
            pass             # alive under another uid
        if not announced:
            print(f"bench: device lock {lock_path} held by pid {pid}; "
                  f"waiting up to {wait_s:.0f}s", file=sys.stderr)
            announced = True
        step = min(poll_s, wait_s - waited)
        time.sleep(step)
        waited += step
    if announced:
        print(f"bench: lock still held after {waited:.0f}s; proceeding",
              file=sys.stderr)
    return waited


def main() -> int:
    rounds = _env_num("BENCH_ROUNDS", "300", int)
    path = os.environ.get("BENCH_PATH", "pallas")
    _wait_for_device_lock()

    from dip_benchmark_tpu.harness import BenchmarkRunner
    from dip_benchmark_tpu.runtime.cache import enable_compilation_cache
    from dip_benchmark_tpu.runtime.device import (DeviceGateError,
                                                  require_device)
    enable_compilation_cache()
    from dip_benchmark_tpu.session import BenchmarkSession

    # Fail fast (and parseably) if the accelerator runtime is hung: a dead
    # relay tunnel otherwise blocks the first device_put inside the PJRT C
    # API for tens of minutes (observed round 4) before surfacing
    # UNAVAILABLE. The gate bounds that to DIP_TPU_GATE_TIMEOUT_S.
    try:
        require_device("any")
    except DeviceGateError as e:
        print(f"bench: {e}", file=sys.stderr)
        print(json.dumps({"metric": "dip12_compute_geomean_latency",
                          "value": None, "unit": "us", "vs_baseline": None,
                          "error": str(e)}))
        return 1

    # Shared input rule (utils/testimage.resolve_image): $DIP_TPU_IMAGE,
    # else the reference fundus.jpg if mounted, else the deterministic
    # synthetic fundus at the same HRF geometry — self-contained either
    # way, and the JSON names the source it measured.
    from dip_benchmark_tpu.utils.testimage import resolve_image
    image, image_source = resolve_image()
    if image_source != "fundus.jpg":
        print(f"NOTE: benchmarking on {image_source}", file=sys.stderr)

    session = BenchmarkSession(image, path=path)
    # Host-transfer ops run at millisecond-to-second scale on the tunneled
    # rig; keep their sample small so the bench finishes (their mean is
    # stable regardless).
    mem_rounds = max(3, rounds // 30)
    table = session.operations()

    # Two temporally-separated sweeps; the headline pools both sweeps'
    # per-round samples and takes the MEDIAN (see module docstring): relay
    # weather shifts sustained latency 1.5-2x on a minutes scale, so a
    # single sweep records whatever weather it drew, and pooling is the
    # unbiased way to combine them (VERDICT r1 asked that the previous
    # min-of-medians not bias the headline upward).
    # Sweep 1 covers only the compute ops — Download's D2H would flip the
    # rig into its degraded dispatch mode and poison sweep 2 (DESIGN §4.1);
    # sweep 2 runs the full table and then verifies every output.
    # H2D floor first (pre-D2H rig state, same as the Upload op's).
    h2d_floor = _h2d_floor(image.nbytes)

    compute_table = [op for op in table
                     if op.csv_column not in ("Upload", "Download")]
    pre = BenchmarkRunner(compute_table, rounds=rounds, stats=True, warmup=10)
    pre.run(quiet=True)

    runner = BenchmarkRunner(
        table, rounds=rounds,
        rounds_override={"Upload": mem_rounds, "Download": mem_rounds},
        stats=True, warmup=10)
    # D2H floor via post_measure: IMMEDIATELY after the timing phase
    # (whose last measured op is Download) and BEFORE the verify pass,
    # whose 12 full-image fetches take minutes of D2H on the relay —
    # same weather window, so Download/floor is a real ratio (round-2
    # probed it after the exec tables and misstated it up to 1.3x,
    # DESIGN.md §4.6).
    floor_box: dict = {}
    results = runner.run(
        verify_against=image, quiet=True,
        post_measure=lambda: floor_box.__setitem__(
            "d2h", _d2h_floor(image.nbytes)))
    d2h_floor = floor_box["d2h"]

    once_s = {r.csv_column: r.time_once for r in pre.results}
    mean2_s = {r.csv_column: r.time_rounds for r in pre.results}
    lat_us, mean_us, speedups, ops_json = {}, {}, {}, {}
    for r in results:
        col = r.csv_column
        pooled = sorted(runner.op_stats[col]["samples"]
                        + pre.op_stats.get(col, {}).get("samples", []))
        p50 = pooled[len(pooled) // 2]
        # Mean over ALL pooled rounds — the reference's estimator
        # (opencv/benchmark.py:26-38) across both sweeps.
        mean = float(np.mean(pooled))
        lat_us[col] = p50 * 1e6
        mean_us[col] = mean * 1e6
        speedups[col] = CUDA_BASELINE_S[col] / p50
        # once = sweep 1's first call (includes compile, per the reference
        # contract); sweep 2's is a warm re-dispatch. min_us: the op's own
        # fastest round — for Upload/Download, comparing it against the
        # raw transport floor checks tunnel-boundedness WITHIN one weather
        # window (D2H weather alone swings 1-2.7 s across minutes, so a
        # floor probed later can misstate the ratio).
        once = once_s.get(col, r.time_once)
        # samples: the TRUE pooled count behind p50/mean — the top-level
        # "rounds" is the per-sweep compute-op setting; Upload/Download
        # run only mem_rounds each, and auditors should see that.
        ops_json[col] = {"p50_us": round(p50 * 1e6, 2),
                         "mean_us": round(mean * 1e6, 2),
                         "min_us": round(pooled[0] * 1e6, 2),
                         "once_ms": round(once * 1e3, 3),
                         "samples": len(pooled)}
        extra = (f", sweep means {mean2_s[col] * 1e6:.1f}/"
                 f"{r.time_rounds * 1e6:.1f} us" if col in mean2_s else "")
        print(f"  {col:28s} {p50 * 1e6:10.1f} us p50   "
              f"(mean {mean * 1e6:10.1f} us, once {once * 1e3:8.1f} ms, "
              f"{speedups[col]:6.2f}x vs CUDA ref{extra})", file=sys.stderr)

    # TRUE device execution time per op (chained-K marginal, the tight
    # K=100/900 lab protocol — runtime/exec_timing.py): on this relay rig
    # the dispatch rows above have async semantics (block_until_ready acks
    # enqueue, same as the reference's CUDA.jl/OpenCV/MATLAB rows), so the
    # JSON also carries the completed-work number the kernels are tuned
    # against. Runs after all dispatch timing (its forced-completion fetch
    # is a D2H, which flips the rig's dispatch mode). BENCH_EXEC=0 skips.
    exec_us = {}
    if os.environ.get("BENCH_EXEC", "1") != "0":
        for col, t in session.execution_table(include_pipeline=True,
                                              k1=100, k2=900, samples=5,
                                              auto_scale=True):
            # The marginal clamps to 0.0 when relay jitter swamps a cheap
            # op's K2-K1 delta (exec_timing.py); treat anything that
            # ROUNDS to 0.0 us as unresolved — omitted from the JSON and
            # from ratios/geomeans — so stderr and JSON always agree.
            us = round(t * 1e6, 1)
            base = CUDA_BASELINE_S.get(col)
            if us > 0:
                exec_us[col] = us
                if col in ops_json:
                    ops_json[col]["exec_us"] = us
                vs = f", {base / t:6.2f}x vs CUDA ref" if base else ""
            else:
                vs = ", unresolved (jitter > marginal)"
            print(f"  {col:28s} {t * 1e6:10.1f} us exec{vs}",
                  file=sys.stderr)

    print(f"  transport floor ({image.nbytes / 1e6:.1f} MB): "
          f"H2D {h2d_floor * 1e3:.1f} ms, D2H {d2h_floor * 1e3:.1f} ms; "
          f"Upload/floor = {lat_us['Upload'] / 1e3 / (h2d_floor * 1e3):.2f}, "
          f"Download/floor = "
          f"{lat_us['Download'] / 1e3 / (d2h_floor * 1e3):.2f}",
          file=sys.stderr)

    compute = [c for c in lat_us if c not in ("Upload", "Download")]

    def geo(d):
        return math.exp(sum(math.log(d[c]) for c in compute) / len(compute))

    geo_lat, geo_mean = geo(lat_us), geo(mean_us)
    print(json.dumps({
        "metric": "dip12_compute_geomean_latency",
        "value": round(geo_lat, 2),
        "unit": "us",
        "vs_baseline": round(geo({c: CUDA_BASELINE_S[c] * 1e6 / lat_us[c]
                                  for c in compute}), 3),
        "estimator": ("p50 over pooled per-round samples of two sweeps; "
                      "baseline column is the reference's mean-over-rounds "
                      "(async dispatch)"),
        "value_mean": round(geo_mean, 2),
        "vs_baseline_mean": round(geo({c: CUDA_BASELINE_S[c] * 1e6
                                       / mean_us[c] for c in compute}), 3),
        "rounds": rounds,
        "image": image_source,
        "transport_floor_ms": {"h2d": round(h2d_floor * 1e3, 2),
                               "d2h": round(d2h_floor * 1e3, 2)},
        **({"exec_geomean_us": round(geo(exec_us), 2),
            "vs_baseline_exec": round(geo(
                {c: CUDA_BASELINE_S[c] * 1e6 / exec_us[c]
                 for c in compute}), 3)}
           if all(exec_us.get(c, 0) > 0 for c in compute) else {}),
        "ops": ops_json,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
