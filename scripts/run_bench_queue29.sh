#!/bin/bash
# Round-5 queue 29: FFN-in-fetch-shadow A/B (the overlap lever, VERDICT r4 #3).
# Chains on queue28's ALL_DONE. Order: on-chip parity first (garbage guard),
# then model-step A/B at b256 (the 16.28 ms baseline), then paired e2e.
SNAP=${1:?snapshot dir}
LOG=${2:-/root/repo/scripts/logs_r5/bench_queue29.log}
PREV=${3:-/root/repo/scripts/logs_r5/bench_queue28.log}
mkdir -p "$(dirname "$LOG")"
# wait for the predecessor (up to 90 min)
for i in $(seq 1 180); do
  grep -q ALL_DONE_QUEUE28 "$PREV" 2>/dev/null && break
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
# 1. on-chip numerics parity of the shadow kernel (b32 shapes)
run parity_shadow 1800 env BENCH_MODE=parity PLAN_FFNSHADOW=1 \
  python scripts/bench_decode_kernel.py
# 2. model-step A/B at b256 (same window, shadow first — new compile)
run model_shadow 2400 env BENCH_BATCH=256 BENCH_PART=model \
  VACNIC_PLAN_FFNSHADOW=1 python scripts/profile_decode_b128.py
run model_base 2400 env BENCH_BATCH=256 BENCH_PART=model \
  python scripts/profile_decode_b128.py
# 3. paired e2e at b256 (bench.py runs 3 sweeps internally)
run bench_shadow 3600 env VACNIC_PLAN_FFNSHADOW=1 BENCH_LATENCY=0 \
  python bench.py
run bench_base 3600 env BENCH_LATENCY=0 python bench.py
echo ALL_DONE_QUEUE29 >> "$LOG"
