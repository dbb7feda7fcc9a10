#!/bin/bash
# Round-5 queue 31: DMA/compute overlap isolation probe (mosaic_probe_overlap)
# K=0/1/2/4 resident-MXU units per 8 MB window fetch. Chains on queue30.
SNAP=${1:?snapshot dir}
LOG=${2:-/root/repo/scripts/logs_r5/bench_queue31.log}
PREV=${3:-/root/repo/scripts/logs_r5/bench_queue30.log}
mkdir -p "$(dirname "$LOG")"
for i in $(seq 1 240); do
  grep -q ALL_DONE_QUEUE30 "$PREV" 2>/dev/null && break
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
for k in 0 1 2 4; do
  run overlap_k$k 1200 env PROBE_K=$k python scripts/mosaic_probe_overlap.py
done
echo ALL_DONE_QUEUE31 >> "$LOG"
