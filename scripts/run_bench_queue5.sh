#!/bin/bash
# Round-4 queue 5: fixed lm_stats A/B at b256, default confirm at this HEAD,
# b512 with a lowered kernel VMEM cap (142.66M>128M scoped OOM at default),
# b64 stats A/B.
SNAP=${1:?snapshot dir}
LOG=${2:-/root/repo/scripts/logs_r4/bench_queue5.log}
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
run bench_b512_v96 1500 env BENCH_BATCH=512 VACNIC_PLAN_VMEM=96 BENCH_LATENCY=0 BENCH_INNER=1 python bench.py
run bench_b64_stats 1500 env VACNIC_LM_STATS=1 VACNIC_PLAN_NLM=0 BENCH_BATCH=64 BENCH_LATENCY=0 BENCH_INNER=1 python bench.py
echo ALL_DONE_QUEUE5 >> "$LOG"
