#!/bin/bash
# Round-5 queue 42: final driver-rehearsal bench at the true final HEAD
# (generate_mm_robust restructure touches the bench path).
SNAP=${1:?snapshot dir}
LOG=${2:-/root/repo/scripts/logs_r5/bench_queue42.log}
mkdir -p "$(dirname "$LOG")"
cd "$SNAP"
export PYTHONPATH=$SNAP:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=10
echo "=== bench_final2 start $(date +%H:%M:%S) ===" >> "$LOG"
timeout 3600 python bench.py >> "$LOG" 2>&1
echo "=== bench_final2 rc=$? end $(date +%H:%M:%S) ===" >> "$LOG"
echo ALL_DONE_QUEUE42 >> "$LOG"
