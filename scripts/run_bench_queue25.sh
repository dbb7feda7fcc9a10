#!/bin/bash
# Round-4 queue 25: clean driver-style bench.py retry (queue24's bench_head
# hit a compile-service hang window + a concurrent-process mistake — see
# CLAUDE.md cli JAX_PLATFORMS note). Run AFTER queue24's ALL_DONE.
SNAP=${1:?snapshot dir}
LOG=${2:-/root/repo/scripts/logs_r4g/bench_queue25.log}
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
# 4500 s outer bound > worst-case retry budget (4 preflights x 240 s +
# 3 sleeps x 180 s + one 2400 s measurement = 3900 s)
run bench_retry 4500 env BENCH_PREFLIGHT_TRIES=4 BENCH_RETRY_SLEEP=180 python bench.py
echo ALL_DONE_QUEUE25 >> "$LOG"
