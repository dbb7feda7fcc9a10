#!/bin/bash
# Queue 3 (post-chip-recovery): LM-stats A/B at b256, b512 probe, confirm run.
SNAP=${1:?snapshot dir}
LOG=/root/repo/scripts/logs_r3/bench_queue3.log
cd "$SNAP"
export PYTHONPATH=$SNAP:/root/.axon_site
run() {
  name=$1; to=$2; shift 2
  echo "=== $name start $(date +%H:%M:%S) ===" >> "$LOG"
  timeout "$to" "$@" >> "$LOG" 2>&1
  echo "=== $name rc=$? end $(date +%H:%M:%S) ===" >> "$LOG"
}
# 1. stats head A/B (biggest expected win first)
VACNIC_LM_STATS=1 BENCH_LATENCY=0 run bench_b256_stats 1140 python bench.py
# 2. same-window default confirm
BENCH_LATENCY=0 run bench_b256_default 1140 python bench.py
# 3. b512 with whichever defaults (stats off; separate A/B later)
BENCH_BATCH=512 BENCH_LATENCY=0 run bench_b512 1140 python bench.py
echo ALL_DONE_QUEUE3 >> "$LOG"
