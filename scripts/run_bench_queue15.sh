#!/bin/bash
# Round-4 queue 15: b512 isolation. queue13 (T=64, NFFN=4, NSELF=64,
# VMEM=126) needed 15.95G; queue14 (T=52, NFFN=8, same rest) needed
# 16.16G — the 1.5 GB cache saving materialized (3.05G per cache) but
# ~2.2 GB of other workspace appeared. Only NFFN changed besides T:
# isolate with the exact queue13 config + T=52.
SNAP=${1:?snapshot dir}
LOG=${2:-/root/repo/scripts/logs_r4/bench_queue15.log}
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
run bench_b512_pad4_nffn4 1500 env BENCH_BATCH=512 VACNIC_CACHE_PAD_PALLAS=4 VACNIC_PLAN_NFFN=4 VACNIC_PLAN_NSELF=64 VACNIC_PLAN_VMEM=126 BENCH_LATENCY=0 BENCH_INNER=1 python bench.py
run bench_b512_pad4_nolm 1500 env BENCH_BATCH=512 VACNIC_CACHE_PAD_PALLAS=4 VACNIC_PLAN_NFFN=4 VACNIC_PLAN_NSELF=64 VACNIC_PLAN_NLM=0 VACNIC_PLAN_VMEM=126 BENCH_LATENCY=0 BENCH_INNER=1 python bench.py
echo ALL_DONE_QUEUE15 >> "$LOG"
