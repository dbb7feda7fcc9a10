#!/bin/bash
# Round-4 queue 13: b512 endgame. The chunked projection removed the 12.9 GB
# HBM wall; queue12's retry then failed on KERNEL scoped VMEM 123.57M vs the
# self-imposed 121M plan limit — 2.57M over. Raise the Mosaic cap to 126
# (program cap is 128; queue7's NFFN=2 config needed 129.55 TOTAL, NFFN=4
# shrank the windows, so 123.6 scoped + small XLA residue should fit).
# Fallback: NSELF=64 (bkc 40) shrinks chunk-local scratch further.
SNAP=${1:?snapshot dir}
LOG=${2:-/root/repo/scripts/logs_r4/bench_queue13.log}
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
run bench_b512_vmem126 1500 env BENCH_BATCH=512 VACNIC_PLAN_NFFN=4 VACNIC_PLAN_VMEM=126 BENCH_LATENCY=0 BENCH_INNER=1 python bench.py
run bench_b512_vmem126_ns64 1500 env BENCH_BATCH=512 VACNIC_PLAN_NFFN=4 VACNIC_PLAN_VMEM=126 VACNIC_PLAN_NSELF=64 BENCH_LATENCY=0 BENCH_INNER=1 python bench.py
echo ALL_DONE_QUEUE13 >> "$LOG"
