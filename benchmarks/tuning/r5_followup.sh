#!/bin/bash
# Round-5 follow-up hardware checks (after the main r5_hw_sweep went 14/14
# green): convert the last CPU-only-tested corners into this-window
# hardware evidence. Sequential — never two TPU processes.
#
#   1. small-image regime (emphysema 528x393): the round-4 published rows
#      predate the current code; re-run the full contract + exec on it.
#   2. CLI wide route with --warm and --fuse on a synthetic
#      beyond-envelope image: wide_validate_r5 covered the session API;
#      this drives the CLI surface (auto-route + AOT warm + fused chain)
#      end-to-end on hardware.
#   3. f32 exec refresh: cli_verify_f32 proved bit-exactness; this adds a
#      fresh exec table for the f32 model in the same window.
set -u
cd "$(dirname "$0")/../.." || exit 1
ART=docs/artifacts
mkdir -p "$ART"
LOCK=${DIP_TPU_DEVICE_LOCK:-/tmp/dip_tpu_device.lock}
echo $$ > "$LOCK"
trap 'rm -f "$LOCK"' EXIT
export DIP_TPU_LOCK_WAIT_S=0

run() {  # run <timeout_s> <logname> <cmd...>
  local t=$1 log=$2; shift 2
  local rcfile="$ART/$log.rc"
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

SMALL=${DIP_TPU_SMALL_IMAGE:-/root/reference/assets/emphysema.jpg}
if [ -f "$SMALL" ]; then
  run 2400 small_image_r5.txt python benchmarks/tpu/benchmark.py \
    "$SMALL" /tmp/out_r5small --rounds 100 --verify --pipeline --exec \
    --fuse "Grayscale,Threshold,Erosion-3x3-Square" --mem-rounds 5
fi

# Synthetic beyond-envelope image for the CLI wide route (height 640 keeps
# the oracle/verify cost moderate; width 57344 is past the single-buffer
# envelope at that height — make_layout refuses, so the CLI auto-routes
# to WideBenchmarkSession).
python - <<'EOF'
from dip_benchmark_tpu.utils.testimage import synth_fundus
from dip_benchmark_tpu.utils.image import save_image
img = synth_fundus(640, 57344)
save_image("/tmp/r5_wide_cli.png", img)
print("wrote /tmp/r5_wide_cli.png", img.shape)
EOF
run 2400 wide_cli_r5.txt python benchmarks/tpu/benchmark.py \
  /tmp/r5_wide_cli.png /tmp/out_r5wide --rounds 20 --verify --warm \
  --fuse "Grayscale,Threshold,Erosion-3x3-Square" --exec --mem-rounds 3

run 2400 f32_exec_r5.txt python benchmarks/tpu/benchmark.py \
  "${DIP_TPU_IMAGE:-/root/reference/assets/fundus.jpg}" /tmp/out_r5f32e \
  --rounds 20 --dtype float32 --exec --pipeline --mem-rounds 3

bad=0
for f in "$ART"/small_image_r5.txt.rc "$ART"/wide_cli_r5.txt.rc \
         "$ART"/f32_exec_r5.txt.rc; do
  [ -f "$f" ] || continue
  [ "$(cat "$f")" = "0" ] || { bad=$((bad+1)); echo "FAILED step: $f ($(cat "$f"))"; }
done
echo "=== follow-up complete; $bad step(s) failed ==="
exit "$bad"
