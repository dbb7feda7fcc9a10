#!/bin/bash
# Round-5 queue 39: shadow-default ladder verification (plan-provenance
# discipline: a default flip requires re-running the batch ladder) + final
# cache rewarm at the flipped HEAD. Chains on queue38.
SNAP=${1:?snapshot dir}
LOG=${2:-/root/repo/scripts/logs_r5/bench_queue39.log}
PREV=${3:-/root/repo/scripts/logs_r5/bench_queue38.log}
mkdir -p "$(dirname "$LOG")"
for i in $(seq 1 360); do
  grep -q ALL_DONE_QUEUE38 "$PREV" 2>/dev/null && break
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
# ladder pairs at the flipped default (shadow1) vs explicit old default
run b64_shadow 3000 env BENCH_BATCH=64 BENCH_LATENCY=0 python bench.py
run b64_base 3000 env BENCH_BATCH=64 BENCH_LATENCY=0 \
  VACNIC_PLAN_FFNSHADOW=0 python bench.py
run b128_shadow 3000 env BENCH_BATCH=128 BENCH_LATENCY=0 python bench.py
run b128_base 3000 env BENCH_BATCH=128 BENCH_LATENCY=0 \
  VACNIC_PLAN_FFNSHADOW=0 python bench.py
# final: full default bench (b256 + b1 latency) — banks the number AND
# warms the driver-capture cache at the flipped HEAD
run bench_final_flip 3600 python bench.py
echo ALL_DONE_QUEUE39 >> "$LOG"
