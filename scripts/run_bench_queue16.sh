#!/bin/bash
# Round-4 queue 16: batch ladder interior. b512 is HBM-blocked (closed);
# b384 (self 6.05 + cross int8 4.8 GiB ≈ fits with slack; ns=24/bkc=80,
# nc=48/bc=8 — all proven block shapes) and b320 probe whether the
# 128→256 (+4%) trend continues. If b384 wins, flip BENCH_BATCH default.
SNAP=${1:?snapshot dir}
LOG=${2:-/root/repo/scripts/logs_r4/bench_queue16.log}
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
run bench_b384 1500 env BENCH_BATCH=384 BENCH_LATENCY=0 BENCH_INNER=1 python bench.py
run bench_b320 1500 env BENCH_BATCH=320 BENCH_LATENCY=0 BENCH_INNER=1 python bench.py
run bench_b256_confirm 1500 env BENCH_LATENCY=0 BENCH_INNER=1 python bench.py
echo ALL_DONE_QUEUE16 >> "$LOG"
