#!/bin/bash
# Round-5 queue 43: high-load serving point with the 256-bucket in the
# ladder (first time the bench-batch bucket serves): 160 rps, 512 requests.
SNAP=${1:?snapshot dir}
LOG=${2:-/root/repo/scripts/logs_r5/bench_queue43.log}
mkdir -p "$(dirname "$LOG")"
cd "$SNAP"
export PYTHONPATH=$SNAP:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=10
echo "=== serve_high256 start $(date +%H:%M:%S) ===" >> "$LOG"
timeout 3000 env SERVE_BUCKETS=1,8,32,64,256 SERVE_WAIT=10 SERVE_RATE=160 \
  SERVE_N=512 python scripts/bench_serve.py >> "$LOG" 2>&1
echo "=== serve_high256 rc=$? end $(date +%H:%M:%S) ===" >> "$LOG"
echo ALL_DONE_QUEUE43 >> "$LOG"
