#!/usr/bin/env bash
# Round-3 decode-kernel measurement matrix (run on the real TPU).
#
# Measures the headline bench (DSFVT b256) across the sampler's decode
# implementations, then DSSVT via bench_sample. Each config is a fresh
# process (first compile ~10 min through the remote-compile tunnel). All
# output appends to $LOG; each bench prints its one JSON line.
#
#   nohup bash tools/measure_decode_matrix.sh > /tmp/measure_matrix.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/measure_matrix.log}

run() {
  echo "=== $(date +%H:%M:%S) $*"
  timeout 3000 "$@"
  echo "=== rc=$? $*"
}

# headline candidates (DSFVT b256, int8 KV, seg 16 unless stated)
run python bench.py --skip-baseline                       # shipped default (xla attn)
run python bench.py --skip-baseline --attn pallas          # int8 decode kernel
run python bench.py --skip-baseline --attn pallas --kv native --seg 16
run python bench.py --skip-baseline --weights int8-pallas  # weight kernel only
run python bench.py --skip-baseline --attn pallas --weights int8-pallas

# batch lever re-check: the old "b512 flat" reading predates the
# input-staging fix (it timed a 2.5 s host->device tunnel copy every
# iteration); with staging fixed, b512 amortizes the 42 MB/pixel-step
# weight stream over 2x samples (est. +5-10%; int8 caches ~4.3 GB fit)
run python bench.py --skip-baseline --batch 512
run python bench.py --skip-baseline --batch 512 --weights int8-pallas

# DSSVT (block-local caches; current best 553.0 fps b512 seg16)
run python tools/bench_sample.py --config configs/vt/DSSVT.yaml --batch 512 --kv int8 --seg 16
run python tools/bench_sample.py --config configs/vt/DSSVT.yaml --batch 512 --kv int8 --seg 16 --attn pallas
run python tools/bench_sample.py --config configs/vt/DSSVT.yaml --batch 512 --kv int8 --seg 16 --attn pallas --weights int8-pallas

# kernel micro-probes (fast second-compile shapes)
run python tools/probe_decode_kernel.py --btile 8
run python tools/probe_decode_kernel.py --btile 16
run python tools/probe_quant_mm.py --batch 256
echo "ALL DONE"
# summarize every run (markdown table; flags crashed configs)
python tools/analyze_matrix.py "$LOG" || true
