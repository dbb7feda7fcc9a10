#!/bin/bash
# Round-5 queue 37: t_fuse=2 A/B at b256 (parity -> model step -> e2e pair).
# Chains on queue36. Only worth running if queue35's NOPS arms show
# parallel-stream BW aggregation; the runner checks nothing — read the
# NOPS results before interpreting.
SNAP=${1:?snapshot dir}
LOG=${2:-/root/repo/scripts/logs_r5/bench_queue37.log}
PREV=${3:-/root/repo/scripts/logs_r5/bench_queue36.log}
mkdir -p "$(dirname "$LOG")"
for i in $(seq 1 360); do
  grep -q ALL_DONE_QUEUE36 "$PREV" 2>/dev/null && break
  sleep 30
done
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
run parity_tfuse 1800 env BENCH_MODE=parity PLAN_TFUSE=2 \
  python scripts/bench_decode_kernel.py
run model_tfuse_i8 2400 env BENCH_BATCH=256 BENCH_PART=model PROF_INT8=1 \
  VACNIC_PLAN_TFUSE=2 python scripts/profile_decode_b128.py
run bench_tfuse 3600 env VACNIC_PLAN_TFUSE=2 BENCH_LATENCY=0 python bench.py
run bench_base_pair 3600 env BENCH_LATENCY=0 python bench.py
echo ALL_DONE_QUEUE37 >> "$LOG"
