#!/bin/bash
# Round-4 queue 17: LM-stats closure vs the blockmax default. Stats was a
# WASH vs the old plain-top-k default (165.5 vs 165.2); blockmax beats
# plain by ~2 ms/step. The stats path (pre-computed shortlist) PREEMPTS
# blockmax, so if stats reads below the default now, record it as
# superseded.
SNAP=${1:?snapshot dir}
LOG=${2:-/root/repo/scripts/logs_r4/bench_queue17.log}
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
run bench_b256_stats 1500 env VACNIC_LM_STATS=1 BENCH_LATENCY=0 BENCH_INNER=1 python bench.py
run bench_b256_default 1500 env BENCH_LATENCY=0 BENCH_INNER=1 python bench.py
echo ALL_DONE_QUEUE17 >> "$LOG"
