#!/bin/bash
# Round-4 queue 24: (a) driver-style bench.py rehearsal at HEAD, (b) the
# FIRST on-chip run of the serving-latency benchmark (bench_serve.py was
# committed last session but never measured). Sequential — one TPU process
# at a time; run from a git-archive snapshot.
SNAP=${1:?snapshot dir}
LOG=${2:-/root/repo/scripts/logs_r4g/bench_queue24.log}
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
# (a) driver rehearsal: bench.py exactly as the driver runs it
run bench_head 1800 python bench.py
# (b) serving latency: buckets 1,8,32, 20 ms wait, 40 req/s Poisson
run serve_bench 3000 env SERVE_BUCKETS=1,8,32 SERVE_WAIT=20 SERVE_RATE=40 \
  SERVE_N=192 python scripts/bench_serve.py
echo ALL_DONE_QUEUE24 >> "$LOG"
