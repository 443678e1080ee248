#!/usr/bin/env bash
# CI entry point: lint + full CPU test suite + multi-chip dry-run smoke.
# One command, no TPU required (the suite forces the CPU platform with an
# 8-device virtual mesh via tests/conftest.py). SURVEY.md §4 mandates
# exceeding the reference's (absent) test automation; this is the gate.
#
# Usage: ./ci.sh          # everything (~5 min on 4 cores)
#        ./ci.sh quick    # skip the multichip dry-run
set -euo pipefail
cd "$(dirname "$0")"

echo "== lint (ruff if installed, else syntax check) =="
if python -m ruff --version >/dev/null 2>&1; then
  python -m ruff check dip_benchmark_tpu tests benchmarks bench.py __graft_entry__.py
else
  python -m compileall -q dip_benchmark_tpu tests benchmarks bench.py __graft_entry__.py
  echo "(ruff not installed; ran syntax check only)"
fi

echo "== test suite (CPU backend, 8-device virtual mesh) =="
python -m pytest tests/ -q

if [[ "${1:-}" != "quick" ]]; then
  echo "== multi-chip dry-run (virtual 8-device mesh) =="
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"
fi

echo "CI OK"
