#!/bin/bash
# Round-4 queue 18: post-blockmax ladder refresh. The b64 in-kernel-LM
# default (n_lm=32) was tuned pre-blockmax (107.4 vs 104.5 in r2); the
# b128 number also predates blockmax. Re-check both + final-HEAD b256.
SNAP=${1:?snapshot dir}
LOG=${2:-/root/repo/scripts/logs_r4/bench_queue18.log}
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
run bench_b64_default 1500 env BENCH_BATCH=64 BENCH_LATENCY=0 BENCH_INNER=1 python bench.py
run bench_b64_nlm0 1500 env BENCH_BATCH=64 VACNIC_PLAN_NLM=0 BENCH_LATENCY=0 BENCH_INNER=1 python bench.py
run bench_b128_default 1500 env BENCH_BATCH=128 BENCH_LATENCY=0 BENCH_INNER=1 python bench.py
run bench_b256_final 1500 env BENCH_LATENCY=0 BENCH_INNER=1 python bench.py
echo ALL_DONE_QUEUE18 >> "$LOG"
