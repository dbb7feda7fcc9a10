#!/bin/bash
# Round-5 queue 36: fill-v3 serving frontier (stability-derived fill budget)
# — ladder (1,8,32,64) across offered rates 20/40/80/120 rps. Chains on
# queue35. The queue32 ladder ran the v2 decode-capped fill (saturating bug).
SNAP=${1:?snapshot dir}
LOG=${2:-/root/repo/scripts/logs_r5/bench_queue38.log}
PREV=${3:-/root/repo/scripts/logs_r5/bench_queue37.log}
mkdir -p "$(dirname "$LOG")"
for i in $(seq 1 360); do
  grep -q ALL_DONE_QUEUE37 "$PREV" 2>/dev/null && break
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
for rate in 20 40 80 120; do
  run serve_guard_r$rate 3000 env SERVE_BUCKETS=1,8,32,64 SERVE_WAIT=10 \
    SERVE_RATE=$rate SERVE_N=256 SERVE_FILL=0 python scripts/bench_serve.py
done
echo ALL_DONE_QUEUE38 >> "$LOG"
