#!/bin/bash
# Model-step attribution at b256 + b512 bench scale probe.
# Usage: bash scripts/run_model_probe_b256.sh /tmp/r3snapN
SNAP=${1:?snapshot dir}
LOG=/root/repo/scripts/logs_r3/model_probe_b256.log
cd "$SNAP"
export PYTHONPATH=$SNAP:/root/.axon_site
run() {
  echo "=== $1 start $(date +%H:%M:%S) ===" >> "$LOG"
  shift
  timeout 570 "$@" >> "$LOG" 2>&1
  echo "=== rc=$? end $(date +%H:%M:%S) ===" >> "$LOG"
}
PROF_INT8=1 BENCH_BATCH=256 BENCH_PART=model \
  run model_b256 python scripts/profile_decode_b128.py
PROF_INT8=1 BENCH_BATCH=256 BENCH_PART=model_nolm \
  run model_nolm_b256 python scripts/profile_decode_b128.py
PROF_INT8=1 BENCH_BATCH=256 BENCH_PART=model VACNIC_KERNEL_NOGATHER=1 \
  run model_nogather_b256 python scripts/profile_decode_b128.py
BENCH_BATCH=512 BENCH_LATENCY=0 \
  run bench_b512 python bench.py
echo ALL_DONE_MODEL_PROBE >> "$LOG"
