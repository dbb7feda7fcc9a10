#!/bin/bash
# Round-4 queue 26: serve-bench A/B — defer-to-fill dispatch policy vs the
# queue24 baseline (open_loop_p50 2211 ms, padded 233/435 slots, burst
# 118.4 cps at buckets 1,8,32 / wait 20 ms / 40 rps). Same knobs, new HEAD;
# the bucket programs are in the persistent cache, so this run skips the
# 210 s cold precompile.
SNAP=${1:?snapshot dir}
LOG=${2:-/root/repo/scripts/logs_r4g/bench_queue26.log}
mkdir -p "$(dirname "$LOG")"
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
run serve_defer 3000 env SERVE_BUCKETS=1,8,32 SERVE_WAIT=20 SERVE_RATE=40 \
  SERVE_N=192 python scripts/bench_serve.py
echo ALL_DONE_QUEUE26 >> "$LOG"
