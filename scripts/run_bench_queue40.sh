#!/bin/bash
# Round-5 queue 40: b128 shadow-default re-pair (the queue39 shadow arm had
# a straggler first run 132.8 in an oscillating window; base read 165 tight).
SNAP=${1:?snapshot dir}
LOG=${2:-/root/repo/scripts/logs_r5/bench_queue40.log}
mkdir -p "$(dirname "$LOG")"
cd "$SNAP"
export PYTHONPATH=$SNAP:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=10
run() {
  name=$1; to=$2; shift 2
  echo "=== $name start $(date +%H:%M:%S) ===" >> "$LOG"
  timeout "$to" "$@" >> "$LOG" 2>&1
  echo "=== $name rc=$? end $(date +%H:%M:%S) ===" >> "$LOG"
}
run b128_shadow2 3000 env BENCH_BATCH=128 BENCH_LATENCY=0 python bench.py
run b128_base2 3000 env BENCH_BATCH=128 BENCH_LATENCY=0 \
  VACNIC_PLAN_FFNSHADOW=0 python bench.py
run b128_shadow3 3000 env BENCH_BATCH=128 BENCH_LATENCY=0 python bench.py
echo ALL_DONE_QUEUE40 >> "$LOG"
