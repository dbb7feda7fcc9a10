#!/bin/bash
# Round-5 queue 33 (final): bench.py at final HEAD with DEFAULT env (includes
# the b1 latency program) — warms .jax_cache for the driver's BENCH_r05
# capture — plus a fill-v2 serve confirm at 40 rps (the queue30 failure
# point). Chains on queue32.
SNAP=${1:?snapshot dir}
LOG=${2:-/root/repo/scripts/logs_r5/bench_queue33.log}
PREV=${3:-/root/repo/scripts/logs_r5/bench_queue34.log}
mkdir -p "$(dirname "$LOG")"
for i in $(seq 1 360); do
  grep -q ALL_DONE_QUEUE34 "$PREV" 2>/dev/null && break
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
run serve_fill_v2_40 3000 env SERVE_BUCKETS=1,8,32 SERVE_WAIT=20 SERVE_RATE=40 \
  SERVE_N=192 SERVE_FILL=1 python scripts/bench_serve.py
run bench_final 3600 python bench.py
echo ALL_DONE_QUEUE33 >> "$LOG"
