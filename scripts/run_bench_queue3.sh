#!/bin/bash
# Queue 3 (post-chip-recovery): lm_stats smoke, stats A/B at b256, default
# confirm, b512 probe, b64 stats-vs-inkernel-LM A/B.
SNAP=${1:?snapshot dir}
LOG=/root/repo/scripts/logs_r3/bench_queue3.log
cd "$SNAP"
export PYTHONPATH=$SNAP:/root/.axon_site
# experiment: persistent compilation cache (if the axon PJRT plugin supports
# executable serialization this makes re-runs compile-free; harmless if not)
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=10
mkdir -p /root/repo/.jax_cache
run() {
  name=$1; to=$2; shift 2
  echo "=== $name start $(date +%H:%M:%S) ===" >> "$LOG"
  timeout "$to" "$@" >> "$LOG" 2>&1
  echo "=== $name rc=$? end $(date +%H:%M:%S) ===" >> "$LOG"
}
run smoke_lm_stats 570 python scripts/smoke_lm_stats.py
VACNIC_LM_STATS=1 BENCH_LATENCY=0 run bench_b256_stats 1140 python bench.py
BENCH_LATENCY=0 run bench_b256_default 1140 python bench.py
BENCH_BATCH=512 BENCH_LATENCY=0 run bench_b512 1140 python bench.py
VACNIC_LM_STATS=1 VACNIC_PLAN_NLM=0 BENCH_BATCH=64 BENCH_LATENCY=0 \
  run bench_b64_stats 1140 python bench.py
echo ALL_DONE_QUEUE3 >> "$LOG"
