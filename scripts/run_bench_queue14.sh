#!/bin/bash
# Round-4 queue 14: T=52 cache padding (VACNIC_CACHE_PAD_PALLAS=4).
# decode_stack's T % 16 assert was r2-era conservatism (tb is always a
# leading block dim); relaxed to %4 with CPU token/score parity pinned.
# Self cache at b512 drops 8.06 -> 6.55 GB — covers the 210 MB HBM gap
# with ~1.3 GB slack. Validate Mosaic lowering + parity-of-sanity at b256
# first, then the b512 attempt, then default confirm.
SNAP=${1:?snapshot dir}
LOG=${2:-/root/repo/scripts/logs_r4/bench_queue14.log}
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
run bench_b256_pad4 1500 env VACNIC_CACHE_PAD_PALLAS=4 BENCH_LATENCY=0 BENCH_INNER=1 python bench.py
run bench_b512_pad4 1500 env BENCH_BATCH=512 VACNIC_CACHE_PAD_PALLAS=4 VACNIC_PLAN_NFFN=8 VACNIC_PLAN_NSELF=64 VACNIC_PLAN_VMEM=126 BENCH_LATENCY=0 BENCH_INNER=1 python bench.py
run bench_b256_confirm 1500 env BENCH_LATENCY=0 BENCH_INNER=1 python bench.py
echo ALL_DONE_QUEUE14 >> "$LOG"
