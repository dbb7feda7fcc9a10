#!/bin/bash
# Round-4 queue 13b: b512 last-mile. queue13's VMEM=126+NFFN=4 was 580 KB
# over the 128M program cap (128.57M). NFFN=8 halves the fc windows again
# (−4 MB double-buffered); combine with NSELF=64 if needed. 4096 % 8 == 0.
SNAP=${1:?snapshot dir}
LOG=${2:-/root/repo/scripts/logs_r4/bench_queue13b.log}
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
run bench_b512_nffn8 1500 env BENCH_BATCH=512 VACNIC_PLAN_NFFN=8 VACNIC_PLAN_VMEM=126 BENCH_LATENCY=0 BENCH_INNER=1 python bench.py
run bench_b512_nffn8_ns64 1500 env BENCH_BATCH=512 VACNIC_PLAN_NFFN=8 VACNIC_PLAN_NSELF=64 VACNIC_PLAN_VMEM=126 BENCH_LATENCY=0 BENCH_INNER=1 python bench.py
run bench_b256_confirm 1500 env BENCH_LATENCY=0 BENCH_INNER=1 python bench.py
echo ALL_DONE_QUEUE13B >> "$LOG"
