#!/usr/bin/env bash
# Trimmed decode-kernel matrix: the 4 decision-relevant headline runs,
# anchor first (fresh-session default), then the two kernel candidates and
# the batch lever. Each is a fresh process (~10 min remote compile). See
# tools/measure_decode_matrix.sh for the full matrix.
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/measure_trimmed.log}

run() {
  echo "=== $(date +%H:%M:%S) $*"
  timeout 1500 "$@"
  echo "=== rc=$? $*"
}

run python bench.py --skip-baseline                        # anchor (xla attn, int8 KV)
run python bench.py --skip-baseline --attn pallas          # int8 MXU decode kernel
run python bench.py --skip-baseline --weights int8-pallas  # int8 weight-stream kernel
run python bench.py --skip-baseline --batch 512            # batch lever re-check
echo "ALL DONE"
python tools/analyze_matrix.py "$LOG" || true
