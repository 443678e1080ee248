#!/bin/bash
# Round-5 hardware sweep: everything the round needs from ONE TPU window,
# ordered by JUDGE PRIORITY (VERDICT r4 #1 before #2) so a window that
# dies mid-way still yields the highest-priority artifacts. Run from the
# repo root:
#
#   bash benchmarks/tuning/r5_hw_sweep.sh
#
# Steps (sequential — never two TPU processes):
#   1. i16_probe: quick toolchain-drift check (minutes).
#   2. fresh bench.py — the BENCH_r05 dry run (pooled-median + exec
#      table), VERDICT #1's first half; also warms the kernel cache for
#      everything after it.
#   3. CLI full contract --verify on BOTH paths + sharded + f32 + exec
#      (VERDICT #1's second half: bit-exactness on hardware).
#   4. envelope_probe (default widths 5888/7168/16384, H=1024): confirms
#      the recalibrated 5888@band-104 point (VERDICT #2).
#   5. envelope_probe at HEIGHT=2330 (banded 2352 = 7*336): the
#      336-divisible re-anchor the round-5 advisor asked for — conv-5x5
#      runs its band upsize CAPPED by the budget at width 5120 and
#      uncapped (336) at width 3504.
#   6. wide_probe (1024x65536): the wide-model hardware anchor.
#   7. wide_validate_r5: wide session at 2330x56320 (capped conv band at
#      whole-slide size) + wide_fused_chain + sharded-wide on the 1-mesh.
#   8-9. 10,000-round publication runs on both paths (results.csv rows).
#   10. chart regeneration from the updated CSV + fresh bench JSON.
set -u
cd "$(dirname "$0")/../.." || exit 1
ART=docs/artifacts
mkdir -p "$ART"

# Hold the device lock for the whole sweep: a driver-launched bench.py
# landing mid-sweep waits on this instead of contending for the one TPU
# (bench._wait_for_device_lock). Our own bench step must NOT wait on our
# own lock, so steps run with a zero wait.
LOCK=${DIP_TPU_DEVICE_LOCK:-/tmp/dip_tpu_device.lock}
echo $$ > "$LOCK"
trap 'rm -f "$LOCK"' EXIT
export DIP_TPU_LOCK_WAIT_S=0
IMG=${DIP_TPU_IMAGE:-/root/reference/assets/fundus.jpg}
[ -f "$IMG" ] || IMG=""   # testimage fallback inside the tools

# Steps are RESUMABLE: each records its exit code in $ART/<log>.rc and is
# skipped on re-invocation once it has completed rc=0, so a sweep cut off
# by a mid-window tunnel death can simply be re-run (the watcher does this
# automatically) and picks up where it left off.
STEPS=()  # this invocation's own steps — the exit code counts ONLY these
run() {  # run <timeout_s> <logname> <cmd...>
  local t=$1 log=$2; shift 2
  local rcfile="$ART/$log.rc"
  STEPS+=("$rcfile")
  if [ -f "$rcfile" ] && [ "$(cat "$rcfile")" = "0" ]; then
    echo "=== $log: already done rc=0, skipping ==="
    return 0
  fi
  echo "=== $log: $* (timeout ${t}s) ==="
  timeout "$t" "$@" 2>&1 | tee "$ART/$log"
  local rc=${PIPESTATUS[0]}
  echo "$rc" > "$rcfile"
  echo "=== $log rc=$rc ==="
  return 0
}

# Chart regeneration must re-run whenever the CSV may have changed.
rm -f "$ART/plots_r5.txt.rc"

run 1200 i16_probe_r5.txt python benchmarks/tuning/i16_probe.py
run 2500 bench_r5_dry.txt python bench.py

if [ -n "$IMG" ]; then
  run 2400 cli_verify_pallas_r5.txt python benchmarks/tpu/benchmark.py \
    "$IMG" /tmp/out_r5 --rounds 50 --verify --pipeline --exec \
    --fuse "Grayscale,Threshold,Erosion-3x3-Square" --mem-rounds 3
  run 2400 cli_verify_xla_r5.txt python benchmarks/tpu/benchmark.py \
    "$IMG" /tmp/out_r5x --rounds 50 --path xla --verify --mem-rounds 3
  run 2400 cli_verify_sharded_r5.txt python benchmarks/tpu/benchmark.py \
    "$IMG" /tmp/out_r5s --rounds 20 --shards 1 --path pallas --verify \
    --mem-rounds 3
  run 2400 cli_verify_f32_r5.txt python benchmarks/tpu/benchmark.py \
    "$IMG" /tmp/out_r5f --rounds 20 --dtype float32 --verify --pipeline \
    --mem-rounds 3
fi

run 2400 envelope_probe_r5.txt python benchmarks/tuning/envelope_probe.py
run 2400 envelope_probe_r5_h2330.txt \
  env HEIGHT=2330 WIDTHS=3504,5120 python benchmarks/tuning/envelope_probe.py
run 3000 wide_probe_r5.txt python benchmarks/tuning/wide_probe.py
run 3000 wide_validate_r5.txt python benchmarks/tuning/wide_validate_r5.py

# 7-8. Publication runs (VERDICT r4 #6): the reference's full 10,000-round
# contract on BOTH paths, updating assets/results.csv's TPU rows in place
# (write_csv replaces the row for --tool). Same commands as the round-3
# published rows (RESULTS_ROUND3 §7-8).
if [ -n "$IMG" ]; then
  run 3600 run10k_r5_stdout.txt python benchmarks/tpu/benchmark.py \
    "$IMG" /tmp/out_r5pub --rounds 10000 --mem-rounds 30 --verify \
    --pipeline --csv assets/results.csv --tool TPU
  run 3600 run10k_r5_xla_stdout.txt python benchmarks/tpu/benchmark.py \
    "$IMG" /tmp/out_r5pubx --rounds 10000 --mem-rounds 30 --path xla \
    --verify --csv assets/results.csv --tool TPU-XLA
  cp assets/results.csv "$ART/results_10k_r5.csv"   # audit snapshot
fi

# 9. Regenerate every published PNG from the updated CSV + the fresh bench
# JSON (exec chart needs per-op exec_us: last JSON line of bench_r5_dry.txt).
# Drop any stale extraction first — a previous window's JSON must not
# silently feed this round's exec chart when the bench step yielded none.
rm -f /tmp/bench_r5.json
python - <<'EOF'
import json, re
lines = open("docs/artifacts/bench_r5_dry.txt").read().splitlines()
js = [ln for ln in lines if ln.startswith("{")]
ok = False
for ln in reversed(js):
    try:
        d = json.loads(ln)
    except Exception:
        continue
    if d.get("value") is not None and "ops" in d:
        open("/tmp/bench_r5.json", "w").write(ln)
        ok = True
        break
print("bench json extracted" if ok else "no usable bench json (skip exec chart)")
EOF
if [ -f /tmp/bench_r5.json ]; then
  run 600 plots_r5.txt python -m dip_benchmark_tpu.utils.plots \
    assets/results.csv assets --exec-json /tmp/bench_r5.json
else
  run 600 plots_r5.txt python -m dip_benchmark_tpu.utils.plots \
    assets/results.csv assets
fi
# Exit code = number of failed steps, so the watcher can tell a complete
# sweep (0 -> stop watching) from one cut off mid-window (re-run resumes).
# Count ONLY this invocation's steps — a stale/foreign .rc in the shared
# artifacts dir (renamed step, other script) must not inflate the count
# and wedge the watcher in an endless relaunch.
bad=0
for f in "${STEPS[@]}"; do
  [ -f "$f" ] || continue
  [ "$(cat "$f")" = "0" ] || { bad=$((bad+1)); echo "FAILED step: $f ($(cat "$f"))"; }
done
echo "=== sweep complete; $bad step(s) failed; artifacts in $ART ==="
exit "$bad"
