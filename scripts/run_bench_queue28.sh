#!/bin/bash
# Round-5 queue 28: bank the bench number + serve defer-to-fill A/B + wait sweep.
# Chip recovered 12:07 (chip_watch.log). One TPU process at a time; programs
# for b256/b1 decode and serve buckets 1,8,32 should be warm in .jax_cache.
SNAP=${1:?snapshot dir}
LOG=${2:-/root/repo/scripts/logs_r5/bench_queue28.log}
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
# 1. the headline: bench.py exactly as the driver runs it (orchestrator path)
run bench_head 3600 python bench.py
# 2. serve A/B: defer-to-fill HEAD, same knobs as the queue24 baseline
#    (baseline: open_loop_p50 2211 ms, p95 4312, padded 233/435, burst 118.4)
run serve_defer 3000 env SERVE_BUCKETS=1,8,32 SERVE_WAIT=20 SERVE_RATE=40 \
  SERVE_N=192 python scripts/bench_serve.py
# 3. wait sweep at the same ladder (programs cached): latency frontier
run serve_wait5 1500 env SERVE_BUCKETS=1,8,32 SERVE_WAIT=5 SERVE_RATE=40 \
  SERVE_N=192 python scripts/bench_serve.py
run serve_wait10 1500 env SERVE_BUCKETS=1,8,32 SERVE_WAIT=10 SERVE_RATE=40 \
  SERVE_N=192 python scripts/bench_serve.py
echo ALL_DONE_QUEUE28 >> "$LOG"
